"""Superpixel labels for NMRF-style proposal supervision (host-side numpy).

The reference computes LSC superpixels with opencv-contrib and caches them
beside the dataset (reference: stereo/datasets/sceneflow_dataset.py:35-46 —
`cv2.ximgproc.createSuperpixelLSC(region_size=10, ratio=0.075)`, written to
`<root>/../SuperPixelLabel/<DS>/...`). opencv-contrib is not in this image,
so this module provides a vectorized numpy SLIC with the same contract:
region_size-10 compact superpixels, int32 label maps, and the identical
on-disk cache layout (uint16 PNG) so precomputed reference label files are
picked up unchanged when present.

SLIC here is the standard k-means over (color, compactness·xy): centers on
a region_size grid, each iteration assigns pixels to the nearest of the
3x3 neighbouring centers and re-averages. The assignment step is one
vectorized [H, W, 9] distance reduction (no per-pixel python), so a
960x540 frame takes well under a second on the data-loader workers. The
downstream consumer (ops/superpixel.py mode extraction) only needs
coherent local segments — label VALUES never enter the model.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
from PIL import Image


def slic_superpixels(img: np.ndarray, region_size: int = 10,
                     compactness: float = 10.0, iters: int = 5) -> np.ndarray:
    """img [H, W, 3] float/uint8 → int32 labels [H, W]."""
    h, w = img.shape[:2]
    img = np.asarray(img, np.float32)
    if img.max() > 2.0:
        img = img / 255.0
    s = region_size
    gy = np.arange(s // 2, h, s)
    gx = np.arange(s // 2, w, s)
    ny, nx = len(gy), len(gx)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # cell coordinates of each pixel and its distance to the 3x3
    # neighbouring centers
    cy = np.clip(ys // s, 0, ny - 1)
    cx = np.clip(xs // s, 0, nx - 1)

    # center state: [ny, nx, 5] = (y, x, r, g, b)
    cen = np.zeros((ny, nx, 5), np.float32)
    cen[..., 0] = gy[:, None]
    cen[..., 1] = gx[None, :]
    ii = np.clip(gy[:, None], 0, h - 1)
    jj = np.clip(gx[None, :], 0, w - 1)
    cen[..., 2:] = img[ii, jj]

    m2 = (compactness / s) ** 2
    offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    pix = img.reshape(h, w, 1, 3)
    labels = (cy * nx + cx).astype(np.int32)

    for _ in range(iters):
        dists = np.full((h, w, 9), np.inf, np.float32)
        cands = np.zeros((h, w, 9), np.int32)
        for t, (dy, dx) in enumerate(offs):
            qy = np.clip(cy + dy, 0, ny - 1)
            qx = np.clip(cx + dx, 0, nx - 1)
            c = cen[qy, qx]                            # [H, W, 5]
            d_col = np.sum((pix[:, :, 0] - c[..., 2:]) ** 2, axis=-1)
            d_xy = (ys - c[..., 0]) ** 2 + (xs - c[..., 1]) ** 2
            dists[:, :, t] = d_col + m2 * d_xy
            cands[:, :, t] = qy * nx + qx
        best = np.argmin(dists, axis=-1)
        labels = np.take_along_axis(cands, best[..., None], axis=-1)[..., 0]

        # re-average centers
        flat = labels.ravel()
        cnt = np.bincount(flat, minlength=ny * nx).astype(np.float32)
        cnt = np.maximum(cnt, 1.0)
        feats = np.stack([ys.ravel(), xs.ravel(),
                          img[..., 0].ravel(), img[..., 1].ravel(),
                          img[..., 2].ravel()], axis=-1)
        for f in range(5):
            cen.reshape(-1, 5)[:, f] = (
                np.bincount(flat, weights=feats[:, f], minlength=ny * nx)
                / cnt)
    return labels.astype(np.int32)


def cached_superpixels(left_img: np.ndarray, root: str, rel_path: str,
                       dataset_name: str) -> np.ndarray:
    """Load (or compute + cache) the superpixel label map, using the
    reference's cache layout `<root>/../SuperPixelLabel/<DS>/<rel>_lsc_lbl.png`
    — precomputed reference LSC files are reused verbatim."""
    cache = Path(root).parent.joinpath("SuperPixelLabel", dataset_name,
                                       rel_path)
    cache = Path(str(cache)[: -len(Path(rel_path).suffix)] + "_lsc_lbl.png")
    try:
        if cache.exists():
            return np.asarray(Image.open(cache), np.int32)
    except Exception:
        pass
    label = slic_superpixels(left_img)
    try:
        os.makedirs(cache.parent, exist_ok=True)
        Image.fromarray(label.astype(np.uint16)).save(cache)
    except Exception:
        pass  # read-only dataset roots: recompute each epoch
    return label
