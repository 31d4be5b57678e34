"""Image / disparity file readers (host-side, numpy).

Covers the decoding behaviours of the reference's per-dataset loaders
(reference: stereo/datasets/*.py, dataset_utils/readpfm.py):
PFM (SceneFlow/Middlebury/ETH3D), uint16 PNG with a divisor (KITTI /256,
InStereo2K /100, CREStereo /32, Argoverse /256), Sintel's RGB packing,
depth→disparity conversion (FallingThings/TartanAir/VirtualKITTI2),
.npy (UnrealStereo4K) and Spring's .dsp5 (HDF5).
"""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np
from PIL import Image


def read_image_rgb(path: str) -> np.ndarray:
    """RGB image as float32 [H,W,3] in [0,255].

    cv2's libpng/libjpeg-turbo decoder is ~2-3× faster than PIL's and
    releases the GIL (the hot path of the input pipeline); PNG decode is
    lossless so pixels are identical either way. PIL remains the fallback
    for formats cv2 can't open (e.g. palettized/odd modes)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        return np.array(Image.open(path).convert("RGB"), dtype=np.float32)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)


def read_pfm(path: str) -> Tuple[np.ndarray, float]:
    """Portable FloatMap. Returns (data [H,W] or [H,W,3], scale).

    Format: 'Pf'/'PF' header, dims line, scale line (sign = endianness),
    rows stored bottom-to-top (reference: dataset_utils/readpfm.py:7-45).
    """
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"not a PFM file: {path}")
        dims = f.readline()
        while dims.startswith(b"#"):  # skip comments
            dims = f.readline()
        m = re.match(rb"^(\d+)\s+(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"malformed PFM header in {path}")
        width, height = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    data = np.reshape(data, shape)
    return np.flipud(data).copy(), abs(scale)


def read_disp_pfm(path: str) -> np.ndarray:
    disp = read_pfm(path)[0].astype(np.float32)
    return disp


def read_disp_png_scaled(path: str, divisor: float = 256.0) -> np.ndarray:
    """uint16 PNG disparity / divisor; 0 = invalid (KITTI convention)."""
    disp = np.array(Image.open(path), dtype=np.float32)
    return disp / divisor


def read_disp_sintel(path: str) -> np.ndarray:
    """Sintel packs disparity into RGB: d = R*4 + G/64 + B/16384
    (reference: sintel_dataset.py:42-47)."""
    img = np.array(Image.open(path), dtype=np.float32)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return r * 4.0 + g / 64.0 + b / 16384.0


def depth_to_disp(depth: np.ndarray, fx: float, baseline: float) -> np.ndarray:
    """disparity = fx * baseline / depth; invalid (non-positive depth) → 0."""
    with np.errstate(divide="ignore", invalid="ignore"):
        disp = np.where(depth > 0, fx * baseline / np.maximum(depth, 1e-9), 0.0)
    return disp.astype(np.float32)


def read_disp_npy(path: str) -> np.ndarray:
    return np.load(path, mmap_mode="r").astype(np.float32)


def read_disp_dsp5(path: str, key: str = "disparity") -> np.ndarray:
    """Spring .dsp5 (HDF5) disparity (reference: spring.py:46-52).

    Stored at 2× resolution; callers subsample [::2, ::2].
    """
    import h5py

    with h5py.File(path, "r") as f:
        return np.asarray(f[key], dtype=np.float32)
