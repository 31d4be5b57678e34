"""Native C++ PJRT deployment runtime tests.

The end-to-end parity run (export bundle → C++ stereo_infer → compare to
Python forward) needs the real TPU and a few minutes of compile, so it is
opt-in: ``OPENSTEREO_NATIVE_E2E=1 python -m pytest tests/test_native_runtime.py``.
``deploy/verify_native.py`` is the same check as a standalone tool.

What always runs: the bundle meta schema emitted by deploy/export.py stays
in sync with what deploy/cpp/src/main.cpp parses.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLUGIN = os.environ.get("PJRT_PLUGIN", "/opt/axon/libaxon_pjrt.so")


def test_bundle_meta_schema():
    """Keys consumed by the C++ parser (main.cpp::resolve_pipeline)."""
    main_cpp = open(os.path.join(REPO, "deploy/cpp/src/main.cpp")).read()
    export_py = open(os.path.join(REPO, "deploy/export.py")).read()
    for key in ["transforms", "input_h", "input_w", "model"]:
        assert f'"{key}"' in main_cpp, key
        assert f'"{key}"' in export_py, key
    # Transform names AND options the C++ dispatcher understands must cover
    # every EVALUATING transform used by the shipped *model* configs (the
    # ones deploy/export.py can turn into bundles; eval-data override
    # configs are Python-eval-only and may use e.g. DivisiblePad
    # MODE: round, which the C++ path rejects at runtime).
    import yaml

    assert 'has("MODE")' in main_cpp  # the C++ MODE guard exists
    supported = {"RightTopPad", "DivisiblePad", "RightBottomCrop",
                 "CropOrPad", "NormalizeImage"}
    cfg_root = os.path.join(REPO, "cfgs")
    eval_names = set()
    for dirpath, _, files in os.walk(cfg_root):
        for fn in files:
            if not fn.endswith(".yaml"):
                continue
            with open(os.path.join(dirpath, fn)) as f:
                cfg = yaml.safe_load(f)
            if "MODEL" not in (cfg or {}):
                continue  # eval-data override config, never bundled
            tf = (cfg.get("DATA_CONFIG") or {}).get("DATA_TRANSFORM") or {}
            for t in tf.get("EVALUATING") or []:
                eval_names.add(t["NAME"])
                if t["NAME"] == "DivisiblePad":
                    assert t.get("MODE", "tr") == "tr", (fn, t)
    assert eval_names <= supported, eval_names - supported


@pytest.mark.skipif(os.environ.get("OPENSTEREO_NATIVE_E2E") != "1",
                    reason="needs TPU + C++ build; set OPENSTEREO_NATIVE_E2E=1")
def test_native_runtime_parity():
    subprocess.run([sys.executable, os.path.join(REPO, "deploy/verify_native.py")],
                   check=True, cwd=REPO)
