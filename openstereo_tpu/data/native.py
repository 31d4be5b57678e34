"""ctypes bindings for the native host-preprocessing library.

Loads native/build/libopenstereo_native.so when present (build with
`make -C native`); every entry point has a numpy fallback so the framework
works without the native build. The C++ implementations mirror the
reference's deployment transform runtime (deploy/cpp/src/transforms.cpp and
the fused pad+normalize CUDA kernel — SURVEY.md §2.10).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                 "libopenstereo_native.so"),
]

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.fused_pad_normalize.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.pfm_header.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 4
            lib.pfm_header.restype = ctypes.c_int
            lib.pfm_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float)]
            lib.pfm_read.restype = ctypes.c_int
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def fused_pad_normalize(img: np.ndarray, target_hw: Tuple[int, int],
                        mean, std, num_threads: int = 4) -> np.ndarray:
    """uint8 [H,W,3] → float32 [TH,TW,3]: RightTopPad(edge) + /255 + (x-µ)/σ."""
    th, tw = target_hw
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if lib is None:  # numpy fallback
        h, w = img.shape[:2]
        out = np.pad(img.astype(np.float32),
                     [(th - min(h, th), 0), (0, tw - min(w, tw)), (0, 0)],
                     mode="edge")
        return ((out / 255.0) - mean) / std
    out = np.empty((th, tw, 3), np.float32)
    lib.fused_pad_normalize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1], th, tw,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return out


def read_pfm(path: str) -> np.ndarray:
    """Native PFM reader → float32 [H,W] or [H,W,3], top-down rows."""
    lib = _load()
    if lib is None:
        from .readers import read_pfm as np_read

        return np_read(path)[0].astype(np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    ch = ctypes.c_int()
    le = ctypes.c_int()
    rc = lib.pfm_header(path.encode(), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(ch), ctypes.byref(le))
    if rc != 0:
        raise IOError(f"pfm_header({path}) failed with {rc}")
    shape = (h.value, w.value) if ch.value == 1 else (h.value, w.value, 3)
    out = np.empty(shape, np.float32)
    rc = lib.pfm_read(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"pfm_read({path}) failed with {rc}")
    return out
