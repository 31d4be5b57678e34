"""Mono-to-stereo view synthesis (host-side numpy).

Re-derivation of the reference's MfS-style warp pipeline
(reference: stereo/datasets/mono.py:11-212 + mono_dataset.py:60-75): a mono
image with relative depth becomes a training stereo pair by scaling the
depth to a random disparity range, sharpening depth edges (kill sobel-edge
pixels, nearest re-fill), forward-splatting the left image into the right
view with a min-weight z-buffer, and filling disocclusions with a
color-transferred random background image.

Implementation notes (vs the reference):
- the occlusion test — "a pixel is hidden if any pixel ≥2 columns to its
  right lands on the same integer target" — is computed in one
  right-to-left sweep with a seen-target table per row (O(H·W)) instead of
  the reference's per-column suffix products (O(H·W²), mono.py:115-137);
- the splat keeps the reference's exact z-buffer rule: per target cell the
  smallest interpolation weight wins, right-most columns processed first
  win ties (mono.py:77-104);
- sobel edge magnitude uses the standard 3x3 kernels (skimage's
  normalisation; skimage itself is not in this image).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.interpolate import griddata


FEED_HEIGHT = 352
FEED_WIDTH = 640
MAX_DISPARITY = 192
PROCESS_WIDTH = FEED_WIDTH + MAX_DISPARITY


def _sobel_mag(x: np.ndarray) -> np.ndarray:
    xp = np.pad(x, 1, mode="edge")
    gx = ((xp[:-2, 2:] + 2 * xp[1:-1, 2:] + xp[2:, 2:])
          - (xp[:-2, :-2] + 2 * xp[1:-1, :-2] + xp[2:, :-2])) / 4.0
    gy = ((xp[2:, :-2] + 2 * xp[2:, 1:-1] + xp[2:, 2:])
          - (xp[:-2, :-2] + 2 * xp[:-2, 1:-1] + xp[:-2, 2:])) / 4.0
    return np.sqrt(gx * gx + gy * gy)


def process_disparity(disparity: np.ndarray, rng: np.random.Generator,
                      max_disparity_range: Tuple[float, float] = (40, 196),
                      sharpen: bool = True) -> np.ndarray:
    """Arbitrary-scale depth → pixel disparity (reference mono.py:23-61)."""
    d = disparity.astype(np.float32).copy()
    if d.min() < 0:
        d += abs(d.min())
    if rng.random() < 0.01:
        # occasionally exceed the network range → robustness to clipping
        max_disparity_range = (MAX_DISPARITY * 1.05, MAX_DISPARITY * 1.15)
    d /= max(d.max(), 1e-8)
    d *= max_disparity_range[0] + rng.random() * (
        max_disparity_range[1] - max_disparity_range[0])

    if sharpen:
        edges = _sobel_mag(d) > 3
        d[edges] = 0
        mask = d > 0
        if mask.any() and not mask.all():
            h, w = d.shape
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            d = griddata(
                np.stack([ys[mask], xs[mask]], 1), d[mask],
                np.stack([ys.ravel(), xs.ravel()], 1),
                method="nearest").reshape(h, w).astype(np.float32)
    return d


def occlusion_mask(pix_locations: np.ndarray) -> np.ndarray:
    """Visibility of each source column after the shift: False where some
    column ≥2 to the right lands on the same integer cell (the reference's
    rule, mono.py:115-137). pix_locations [H, W] float."""
    h, w = pix_locations.shape
    up = np.ceil(pix_locations).astype(np.int64)
    down = np.floor(pix_locations).astype(np.int64)
    tmax = max(int(up.max()) + 1, w) + 1
    seen = np.zeros((h, tmax), bool)      # targets of columns >= c+2
    rows = np.arange(h)
    vis = np.zeros((h, w), bool)
    for c in range(w - 1, -1, -1):
        uu = np.clip(up[:, c], 0, tmax - 1)
        dd = np.clip(down[:, c], 0, tmax - 1)
        pos = pix_locations[:, c] > 0
        vis[:, c] = pos & ~(seen[rows, uu] | seen[rows, dd])
        if c + 1 < w:  # column c+1 becomes "≥2 right" for column c-1
            seen[rows, np.clip(up[:, c + 1], 0, tmax - 1)] = True
            seen[rows, np.clip(down[:, c + 1], 0, tmax - 1)] = True
    return vis


def project_image(image: np.ndarray, disp: np.ndarray,
                  background: np.ndarray) -> np.ndarray:
    """Forward-splat the left view by `disp`; disocclusions take the
    background (reference mono.py:63-113)."""
    h, w = disp.shape
    img = np.asarray(image, np.float32)
    xs = np.arange(w)[None, :].repeat(h, 0).astype(np.float32)
    loc = xs - disp
    vis = occlusion_mask(loc)
    loc = np.where(vis, loc, -w)

    rows = np.arange(h)
    warped = np.zeros((2, h, w, 3), np.float32)
    weights = np.full((2, h, w), 1e4, np.float32)
    for c in range(w - 1, -1, -1):
        lc = loc[:, c]
        up = np.ceil(lc).astype(np.int64)
        down = np.floor(lc).astype(np.int64)
        w_up = up - lc
        w_down = 1.0 - w_up
        for z, (tgt, wt) in enumerate(((up, w_up), (down, w_down))):
            ok = tgt >= 0
            t = np.clip(tgt, 0, w - 1)
            better = ok & (weights[z, rows, t] > wt)
            tb = t[better]
            rb = rows[better]
            weights[z, rb, tb] = wt[better]
            warped[z, rb, tb] = img[rb, c] / 255.0
    weights /= weights.sum(0, keepdims=True) + 1e-7
    out = (warped[0] * weights[1][..., None]
           + warped[1] * weights[0][..., None]) * 255.0
    hole = out.max(-1) == 0
    out[hole] = np.asarray(background, np.float32)[hole]
    return out


def transfer_color(target: np.ndarray, source: np.ndarray) -> np.ndarray:
    """Match the background's channel statistics to the source image
    (reference mono_dataset.py:60-75)."""
    t = np.asarray(target, np.float32) / 255.0
    s = np.asarray(source, np.float32) / 255.0
    tm, ts = t.mean((0, 1)), t.std((0, 1))
    sm, ss = s.mean((0, 1)), s.std((0, 1))
    t = (t - tm) / ((ts + 1e-6) / (ss + 1e-6)) + sm
    return np.clip(t * 255.0, 0, 255).astype(np.float32)


def prepare_sizes(left: np.ndarray, background: np.ndarray,
                  disp: np.ndarray, rng: np.random.Generator):
    """Resize/crop to the FEED_HEIGHT x PROCESS_WIDTH working canvas,
    keeping aspect ratio (reference mono.py:139-212)."""
    import cv2

    h, w = left.shape[:2]
    th, tw = FEED_HEIGHT, PROCESS_WIDTH
    if th <= h and tw <= w:
        nh, nw = h, w
    else:
        cur, tgt = h / w, th / tw
        if cur < tgt:
            nh, nw = th, int(th / h * w)
        elif cur > tgt:
            nh, nw = int(tw / w * h), tw
        else:
            nh, nw = th, tw

    def rs(img):
        return cv2.resize(np.asarray(img, np.float32), (nw, nh))

    left, background = rs(left), rs(background)
    disp = cv2.resize(disp.astype(np.float32) * (nw / disp.shape[1]),
                      (nw, nh))
    if (nh, nw) != (th, tw):
        top = int(rng.random() * (nh - th))
        lft = int(rng.random() * (nw - tw))
        left = left[top:top + th, lft:lft + tw]
        background = background[top:top + th, lft:lft + tw]
        disp = disp[top:top + th, lft:lft + tw]
    return left, background, disp
