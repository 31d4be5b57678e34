"""Modulated deformable convolution — gather + MXU matmul formulation.

TPU-native replacement for the reference's CUDA extension
(reference: stereo/libs/AANet/deform_conv/{src/deform_conv_cuda.cpp,
src/deform_conv_cuda_kernel.cu,deform_conv.py} — SURVEY.md §2.9): the
im2col-with-learned-offsets core becomes K=k² bilinear gathers (zeros outside,
per-deformable-group offsets, sigmoid modulation) followed by one
[B·H·W, K·C] × [K·C, Cout] contraction that runs on the MXU. Autodiff gives
the backward pass (the gathers and the matmul are both differentiable), so no
hand-written col2im kernels are needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampler import _pack_2x2, _sample_packed


def modulated_deform_conv(
    x: jnp.ndarray,          # [B, H, W, C]
    offset: jnp.ndarray,     # [B, Ho, Wo, dg·2·K] (Δy, Δx interleaved per tap)
    mask: jnp.ndarray,       # [B, Ho, Wo, dg·K]
    weights: jnp.ndarray,    # [k, k, C, Cout]
    stride: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """Modulated deformable k×k conv, SAME-style padding = dilation·(k-1)/2."""
    b, h, w, c = x.shape
    k = weights.shape[0]
    kk = k * k
    dg = deformable_groups
    assert c % dg == 0

    ho = (h - 1) // stride + 1
    wo = (w - 1) // stride + 1
    ys = jnp.arange(ho, dtype=jnp.float32) * stride
    xs = jnp.arange(wo, dtype=jnp.float32) * stride
    base_y = jnp.broadcast_to(ys[None, :, None], (b, ho, wo))
    base_x = jnp.broadcast_to(xs[None, None, :], (b, ho, wo))

    offset = offset.reshape(b, ho, wo, dg, kk, 2)
    mask = mask.reshape(b, ho, wo, dg, kk)

    cg = c // dg
    x_groups = x.reshape(b, h, w, dg, cg)

    half = dilation * (k - 1) // 2
    dy = (jnp.arange(kk) // k).astype(jnp.float32) * dilation - half  # [K]
    dx = (jnp.arange(kk) % k).astype(jnp.float32) * dilation - half

    # one packed-patch gather per deformable group covering ALL K taps
    group_taps = []
    for g in range(dg):
        packed = _pack_2x2(x_groups[:, :, :, g])             # [B,H,W,4cg]
        py = (base_y[..., None] + dy + offset[:, :, :, g, :, 0]) \
            .transpose(0, 3, 1, 2).reshape(b, kk * ho * wo)
        px = (base_x[..., None] + dx + offset[:, :, :, g, :, 1]) \
            .transpose(0, 3, 1, 2).reshape(b, kk * ho * wo)
        sampled = _sample_packed(packed, h, w, py, px)        # [B,K·Ho·Wo,cg]
        sampled = sampled.reshape(b, kk, ho, wo, cg)
        m = jnp.moveaxis(mask[:, :, :, g, :], -1, 1)          # [B,K,Ho,Wo]
        group_taps.append(sampled * m[..., None])
    # [B,K,Ho,Wo,dg,cg] → tap-major cols [B,Ho,Wo,K·C] (C = dg·cg order)
    cols = jnp.stack(group_taps, axis=-2)
    cols = jnp.moveaxis(cols, 1, 3).reshape(b, ho, wo, kk * c)
    w_mat = weights.reshape(kk * c, -1)       # HWIO flattens to the same order
    return jnp.einsum("bhwi,io->bhwo", cols, w_mat)
