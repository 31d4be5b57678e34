"""Small fixed-kernel image filters (jnp, NHWC-free: operate on [..., H, W]).

kornia-equivalent helpers used by IINet's geometric losses
(reference stereo/modeling/models/iinet/loss.py:89-105 uses
kornia.filters.gaussian_blur2d / spatial_gradient):
- `gaussian_blur` — separable 2D gaussian, reflect padding (kornia
  border_type='reflect' default);
- `spatial_gradient` — first-order sobel, normalized (/8), replicate
  padding, returning (dx, dy) like kornia's [B,C,2,H,W] order.

Implemented as explicit pad + depthwise correlation via
lax.conv_general_dilated on a folded batch; kernels are trace-time numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _conv2d_single(x: jnp.ndarray, kernel: np.ndarray, pad_mode: str):
    """x [..., H, W]; kernel [kh, kw] → same-size correlation."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    lead = x.shape[:-2]
    h, w = x.shape[-2:]
    xf = x.reshape(-1, h, w)
    xf = jnp.pad(xf, ((0, 0), (ph, ph), (pw, pw)),
                 mode="reflect" if pad_mode == "reflect" else "edge")
    k = jnp.asarray(kernel, x.dtype)[:, :, None, None]
    y = jax.lax.conv_general_dilated(
        xf[..., None], k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[..., 0].reshape(*lead, h, w)


def gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, ksize: int, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur with reflect padding; x [..., H, W]."""
    k1 = gaussian_kernel1d(ksize, sigma)
    x = _conv2d_single(x, k1[None, :], "reflect")
    return _conv2d_single(x, k1[:, None], "reflect")


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T.copy()


def spatial_gradient(x: jnp.ndarray):
    """Normalized first-order sobel with replicate padding; x [..., H, W]
    → (dx, dy), each [..., H, W]."""
    return (_conv2d_single(x, _SOBEL_X, "edge"),
            _conv2d_single(x, _SOBEL_Y, "edge"))
