"""Disparity visualisation: KITTI-style histogram colormap
(behavioural equivalent of reference stereo/utils/disp_color.py:4-80) and a
gt/pred/error triptych for logging
(reference: stereo/utils/common_utils.py:183-208).
"""

from __future__ import annotations

import numpy as np

# KITTI devkit 7-bin colour histogram: bin weights and RGB anchor points.
_BIN_W = np.array([114.0, 185.0, 114.0, 174.0, 114.0, 185.0, 114.0])
_COLORS = np.array([
    [0, 0, 0],
    [0, 0, 1],
    [1, 0, 0],
    [1, 0, 1],
    [0, 1, 0],
    [0, 1, 1],
    [1, 1, 0],
    [1, 1, 1],
], dtype=np.float64)


def disp_to_color(disp: np.ndarray, max_disp: float | None = None) -> np.ndarray:
    """[H,W] disparity → uint8 [H,W,3] KITTI colormap."""
    if max_disp is None:
        max_disp = max(float(np.max(disp)), 1e-6)
    x = np.clip(disp / max_disp, 0.0, 1.0).ravel()

    cbins = np.cumsum(_BIN_W)
    cbins = cbins / cbins[-1]  # 7 bin upper edges in (0,1]
    idx = np.searchsorted(cbins, x, side="right")
    idx = np.clip(idx, 0, 6)
    lower = np.concatenate([[0.0], cbins])[idx]
    width = (cbins - np.concatenate([[0.0], cbins[:-1]]))[idx]
    t = np.clip((x - lower) / np.maximum(width, 1e-12), 0.0, 1.0)[:, None]

    rgb = _COLORS[idx] * (1.0 - t) + _COLORS[idx + 1] * t
    out = (rgb * 255.0).clip(0, 255).astype(np.uint8)
    return out.reshape(*disp.shape, 3)


def error_colormap(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """|err| heat map (uint8 RGB), invalid pixels black."""
    err = np.abs(pred - gt) * mask
    scaled = np.clip(err / 3.0, 0.0, 1.0)  # 3px = saturated
    r = (scaled * 255).astype(np.uint8)
    g = ((1.0 - scaled) * mask * 255).astype(np.uint8)
    return np.stack([r, g, np.zeros_like(r)], axis=-1)


def triptych(pred: np.ndarray, gt: np.ndarray, max_disp: float) -> np.ndarray:
    """Stacked gt / pred / error visualisation [3H,W,3] uint8."""
    mask = ((gt > 0) & (gt < max_disp)).astype(np.float32)
    return np.concatenate([
        disp_to_color(gt, max_disp),
        disp_to_color(pred, max_disp),
        error_colormap(pred, gt, mask),
    ], axis=0)
