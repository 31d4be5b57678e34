"""Every shipped config must load, name a registered model, and reference
registered datasets — guards the mechanically-generated recipe matrix."""

import glob
import os

import pytest

from openstereo_tpu.config import load_config
from openstereo_tpu.registry import DATASETS, MODELS
import openstereo_tpu.models  # noqa: F401  (register)
import openstereo_tpu.data.datasets  # noqa: F401  (register)

CFG_ROOT = os.path.join(os.path.dirname(__file__), "..", "cfgs")
ALL_CFGS = sorted(
    p for p in glob.glob(os.path.join(CFG_ROOT, "**", "*.yaml"),
                         recursive=True)
    if os.path.basename(p) != "data_paths.yaml")


@pytest.mark.parametrize("path", ALL_CFGS,
                         ids=[os.path.relpath(p, CFG_ROOT) for p in ALL_CFGS])
def test_config_loads(path):
    cfg = load_config(path)
    assert "DATA_CONFIG" in cfg
    for info in cfg.DATA_CONFIG.DATA_INFOS:
        DATASETS.get(info.DATASET)  # raises on unknown dataset
    if "MODEL" in cfg:  # standalone eval-data configs carry no MODEL
        model = MODELS.get(cfg.MODEL.NAME)
        assert model is not None
