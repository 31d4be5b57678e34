"""Native C++ preprocessing library vs numpy reference implementations."""

import os
import subprocess

import numpy as np
import pytest

from openstereo_tpu.data import native, readers

ROOT = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def built_lib():
    if not native.available():
        rc = subprocess.run(["make", "-C", os.path.join(ROOT, "native")],
                            capture_output=True)
        if rc.returncode != 0 or not native.available():
            pytest.skip("native toolchain unavailable")
    return True


def test_fused_pad_normalize_matches_numpy(built_lib):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (50, 70, 3), np.uint8)
    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    got = native.fused_pad_normalize(img, (64, 96), mean, std)

    exp = np.pad(img.astype(np.float32), [(14, 0), (0, 26), (0, 0)], mode="edge")
    exp = (exp / 255.0 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_native_pfm_matches_numpy(built_lib, tmp_path):
    rng = np.random.RandomState(1)
    disp = rng.rand(37, 53).astype(np.float32) * 100
    p = tmp_path / "t.pfm"
    with open(p, "wb") as f:
        f.write(b"Pf\n53 37\n-1.0\n")
        np.flipud(disp).astype("<f4").tofile(f)
    got = native.read_pfm(str(p))
    exp = readers.read_disp_pfm(str(p))
    np.testing.assert_allclose(got, exp, rtol=1e-6)
    np.testing.assert_allclose(got, disp, rtol=1e-6)
