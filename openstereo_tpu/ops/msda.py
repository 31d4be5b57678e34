"""Multi-scale deformable attention — TPU-native (gather + contraction).

Re-design of NMRF's custom CUDA op `MSDA.ms_deform_attn_forward`
(reference: stereo/modeling/models/nmrf/ops/src/cuda/ms_deform_attn_cuda.cu,
python fallback `ms_deform_attn_core_pytorch`,
stereo/modeling/models/nmrf/ops/functions/ms_deform_attn_func.py:49-71):
each query samples P points per head per feature level by bilinear
interpolation and reduces them with learned attention weights.

On GPU this is an im2col-style custom kernel; on TPU it is four clipped
gathers per point (the same pattern as ops/deform_conv.py) followed by a
weighted sum — XLA fuses the interpolation arithmetic into the gathers, and
autodiff supplies the backward (scatter-add) pass, so no custom VJP is
needed. Layout keeps the per-head channel dim D last (lane dimension).

Sampling convention: `grid_sample(align_corners=False, padding_mode='zeros')`
with locations normalised to [0, 1] — pixel x = loc·W - 0.5, out-of-frame
taps contribute zero.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp

from .sampler import bilinear_sampler, bilinear_sampler_mxu


def ms_deform_attn(values: Sequence[jnp.ndarray],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray) -> jnp.ndarray:
    """values: per-level feature maps, each [B, H_l, W_l, M, D]
    sampling_locations: [B, Lq, M, L, P, 2] — (x, y) in [0, 1] per level
    attention_weights: [B, Lq, M, L, P] (softmax-normalised over L·P)

    Returns [B, Lq, M·D].
    """
    b, lq, m, nl, p, _ = sampling_locations.shape
    assert nl == len(values)
    out = None
    for l, val in enumerate(values):
        _, h, w, m_, d = val.shape
        # [B, H, W, M, D] -> [B·M, H, W, D]
        v = jnp.moveaxis(val, 3, 1).reshape(b * m_, h, w, d)
        loc = sampling_locations[:, :, :, l]            # [B, Lq, M, P, 2]
        # normalised [0,1] -> pixel coords (align_corners=False)
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        coords = jnp.stack([px, py], axis=-1)           # [B, Lq, M, P, 2]
        coords = jnp.moveaxis(coords, 2, 1).reshape(b * m_, lq * p, 2)
        # per-head D is narrow (8 with deform_ratio 0.5) — far below the
        # 128-lane gather row width, so the separable hat-matrix MXU form
        # (bilinear_sampler_mxu) replaces the gathers with dense matmuls.
        # OPENSTEREO_MSDA=gather restores the 4-tap gather path.  NOTE:
        # the env var is read at Python TRACE time — the chosen path is
        # baked into any jit-compiled executable, so flipping it after a
        # model has compiled has no effect until the cache key changes.
        if os.environ.get("OPENSTEREO_MSDA", "mxu") == "mxu":
            samp = bilinear_sampler_mxu(v, coords)      # [B·M, Lq·P, D]
        else:
            samp = bilinear_sampler(v, coords)          # [B·M, Lq·P, D]
        samp = samp.reshape(b, m_, lq, p, d)
        wgt = jnp.moveaxis(attention_weights[:, :, :, l], 2, 1)  # [B, M, Lq, P]
        contrib = jnp.einsum("bmqpd,bmqp->bqmd", samp,
                             wgt.astype(samp.dtype))
        out = contrib if out is None else out + contrib
    return out.reshape(b, lq, m * out.shape[-1])
