"""Upsampling / interpolation ops.

`context_upsample` is the superpixel disparity upsampler
(reference: stereo/modeling/disp_refinement/disp_refinement.py:194-204):
each full-res pixel is a learned convex combination of the 3×3 low-res
neighbourhood. The reference uses `F.unfold`; on TPU we build the 9
neighbourhood taps as static pads+slices (fusable, no gather) and use
`jnp.repeat` for the exact nearest ×scale upsample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] → [B, H, W, 9]: zero-padded 3×3 neighbourhood taps.

    Tap order matches `F.unfold(kernel_size=3, padding=1)`: row-major over
    (dy, dx) ∈ {-1,0,1}², i.e. tap k = (dy=k//3-1, dx=k%3-1).
    """
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    h, w = x.shape[1], x.shape[2]
    taps = [
        padded[:, dy : dy + h, dx : dx + w]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.stack(taps, axis=-1)


def upsample_nearest(x: jnp.ndarray, scale: int, axes=(1, 2)) -> jnp.ndarray:
    """Exact integer nearest-neighbour upsample via repeat."""
    for ax in axes:
        x = jnp.repeat(x, scale, axis=ax)
    return x


def context_upsample(disp_low: jnp.ndarray, up_weights: jnp.ndarray,
                     scale_factor: int = 4) -> jnp.ndarray:
    """Superpixel upsample: disp_low [B,h,w], up_weights [B,s*h,s*w,9] → [B,s*h,s*w]."""
    taps = unfold3x3(disp_low)                       # [B,h,w,9]
    taps = upsample_nearest(taps, scale_factor)      # [B,sh,sw,9]
    return jnp.sum(taps * up_weights, axis=-1)


def resize_bilinear(x: jnp.ndarray, new_hw, axes=(1, 2)) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (= torch align_corners=False)."""
    assert axes == (1, 2)
    new_shape = list(x.shape)
    new_shape[1], new_shape[2] = new_hw
    return jax.image.resize(x, new_shape, method="bilinear")


def _interp_matrix_ac(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n_out, n_in] linear-interpolation matrix with align_corners=True
    (torch F.interpolate(..., align_corners=True) semantics)."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    # interpolation positions in the promoted dtype: f32 internals would
    # inject ~1e-7 relative error, which f64 parity tests see as 1e-5-level
    # disparity-sample drift (floor() then lands on different integers)
    cdt = jnp.promote_types(jnp.float32, dtype)
    pos = jnp.arange(n_out, dtype=cdt) * (n_in - 1) / max(n_out - 1, 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    frac = pos - lo.astype(cdt)
    rows = jnp.arange(n_out)
    mat = jnp.zeros((n_out, n_in), dtype)
    mat = mat.at[rows, lo].set((1.0 - frac).astype(dtype))
    mat = mat.at[rows, lo + 1].add(frac.astype(dtype))
    return mat


def _interp_matrix_hp(n_in: int, n_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """[n_out, n_in] linear-interpolation matrix with half-pixel centers and
    NO antialiasing (torch F.interpolate(align_corners=False) semantics).

    jax.image.resize widens its triangle kernel when downsampling
    (antialiasing); torch interpolates with a fixed 2-tap kernel at any
    scale, clamping out-of-range taps to the border. Pure interpolation is
    required wherever parity with a torch `F.interpolate` downsample
    matters (e.g. the cascade models' sample-grid pyramid)."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    cdt = jnp.promote_types(jnp.float32, dtype)
    pos = (jnp.arange(n_out, dtype=cdt) + 0.5) * (n_in / n_out) - 0.5
    pos = jnp.clip(pos, 0.0, n_in - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    frac = pos - lo.astype(cdt)
    rows = jnp.arange(n_out)
    mat = jnp.zeros((n_out, n_in), dtype)
    mat = mat.at[rows, lo].set((1.0 - frac).astype(dtype))
    mat = mat.at[rows, lo + 1].add(frac.astype(dtype))
    return mat


def resize_linear_torch(x: jnp.ndarray, sizes, axes) -> jnp.ndarray:
    """N-linear resize, half-pixel centers, no antialiasing — exact torch
    F.interpolate(mode='bilinear'/'trilinear', align_corners=False) at any
    scale, as per-axis banded matmuls (MXU-friendly)."""
    for ax, n_out in zip(axes, sizes):
        n_in = x.shape[ax]
        if n_in == n_out:
            continue
        mat = _interp_matrix_hp(n_in, n_out, x.dtype)
        x = jnp.moveaxis(jnp.tensordot(mat, x, axes=(1, ax)), 0, ax)
    return x


def resize_linear_align_corners(x: jnp.ndarray, sizes, axes) -> jnp.ndarray:
    """N-linear resize with align_corners=True along `axes`.

    Implemented as per-axis matmuls with small two-banded interpolation
    matrices (MXU-friendly contraction, exact torch `align_corners=True`
    semantics, which jax.image.resize does not offer). Used for PSMNet's
    trilinear cost upsampling (reference psmnet_cost_processor.py:201-219) and
    the backbone SPP branches (align_corners=True bilinear).
    """
    for ax, n_out in zip(axes, sizes):
        n_in = x.shape[ax]
        if n_in == n_out:
            continue
        mat = _interp_matrix_ac(n_in, n_out, x.dtype)
        x = jnp.moveaxis(jnp.tensordot(mat, x, axes=(1, ax)), 0, ax)
    return x


def _interp_matrix_cubic_hp(n_in: int, n_out: int,
                            dtype=jnp.float32) -> jnp.ndarray:
    """[n_out, n_in] cubic-interpolation matrix, half-pixel centers, torch
    kernel (A=-0.75), no antialiasing, border clamp — exact torch
    F.interpolate(mode='bicubic', align_corners=False) with `size=`."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    import numpy as _np
    a = -0.75

    def kern(x):
        x = abs(x)
        if x <= 1.0:
            return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
        if x < 2.0:
            return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
        return 0.0

    m = _np.zeros((n_out, n_in), _np.float64)
    for i in range(n_out):
        src = (i + 0.5) * (n_in / n_out) - 0.5
        j0 = int(_np.floor(src)) - 1
        for j in range(j0, j0 + 4):
            m[i, min(max(j, 0), n_in - 1)] += kern(src - j)
    return jnp.asarray(m, dtype)


def resize_bicubic_torch(x: jnp.ndarray, sizes, axes) -> jnp.ndarray:
    """Separable bicubic resize, exact torch F.interpolate(mode='bicubic',
    align_corners=False) semantics, as per-axis banded matmuls. Used for
    the FoundationStereo ViT-input resize (reference
    foundationstereo/core/extractor.py:349-351)."""
    for ax, n_out in zip(axes, sizes):
        n_in = x.shape[ax]
        if n_in == n_out:
            continue
        mat = _interp_matrix_cubic_hp(n_in, n_out, x.dtype)
        x = jnp.moveaxis(jnp.tensordot(mat, x, axes=(1, ax)), 0, ax)
    return x
