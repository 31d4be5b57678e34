"""DINOv2 vision transformer (flax, NHWC→tokens) — the frozen trunk of
DepthAnythingV2, which MonSter and the FoundationStereo family consume
(reference: stereo/modeling/models/monster/depth_anything_v2/dinov2.py:44-416
and the identical vendored copies under foundationstereo/).

TPU-native design:
- tokens ride [B, N, C] with C on the lane dimension; attention is three MXU
  einsums + a fused softmax (XLA lowers the whole block to MXU work);
- the positional-embedding resize for non-518 inputs happens at trace time
  as two small interpolation matmuls built in numpy with *torch* bicubic
  (A=-0.75) semantics, so converted DepthAnythingV2 checkpoints reproduce
  the reference trunk exactly at any input size;
- blocks are plain named modules (`block0..blockN`) so intermediate taps
  (DAv2 uses [2,5,8,11] / [4,11,17,23]) are free, and weight conversion is
  a flat rename.

Configs (reference dinov2.py:339-416): patch 14, img_size 518 (37×37+1 pos
tokens), LayerScale init 1.0, MLP FFN, no registers.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

VIT_CONFIGS = {
    # name: (embed_dim, depth, num_heads)
    "vits": (384, 12, 6),
    "vitb": (768, 12, 12),
    "vitl": (1024, 24, 16),
}

# DAv2 tap layers per trunk (reference dpt.py:320-325)
INTERMEDIATE_LAYERS = {
    "vits": (2, 5, 8, 11),
    "vitb": (2, 5, 8, 11),
    "vitl": (4, 11, 17, 23),
}


def _torch_bicubic_matrix(n_in: int, n_out: int, scale: float) -> np.ndarray:
    """[n_out, n_in] torch F.interpolate(mode='bicubic',
    align_corners=False) matrix for a given scale_factor (A = -0.75,
    half-pixel mapping src = (dst + 0.5)/scale - 0.5, edge clamp)."""
    a = -0.75

    def kernel(x):
        x = abs(x)
        if x <= 1.0:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1
        if x < 2.0:
            return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
        return 0.0

    m = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        src = (i + 0.5) / scale - 0.5
        j0 = int(np.floor(src)) - 1
        for j in range(j0, j0 + 4):
            w = kernel(src - j)
            m[i, min(max(j, 0), n_in - 1)] += w
    return m.astype(np.float32)


def interpolate_pos_embed(pos: np.ndarray, h0: int, w0: int,
                          offset: float = 0.1) -> np.ndarray:
    """[1, 1+N, C] 518-grid pos table → [1, 1+h0*w0, C] for an h0×w0 patch
    grid (reference dinov2.py:177-210: bicubic with a +0.1 scale offset)."""
    n = pos.shape[1] - 1
    side = int(round(np.sqrt(n)))
    cls_tok, patch = pos[:, :1], pos[:, 1:]
    if h0 == side and w0 == side:
        return pos
    grid = patch.reshape(side, side, -1)
    # reference interpolates with scale_factor=(w0+offset)/side on the
    # (row=w-axis, col=h-axis) grid as laid out; rows are the first axis
    mh = _torch_bicubic_matrix(side, h0, (h0 + offset) / side)
    mw = _torch_bicubic_matrix(side, w0, (w0 + offset) / side)
    out = np.einsum("hi,iwc,wj->hjc", mh, grid, mw.T)
    return np.concatenate([cls_tok, out.reshape(1, h0 * w0, -1)], axis=1)


class ViTAttention(nn.Module):
    """Packed-qkv multi-head attention (reference dinov2_layers/attention.py)."""

    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.num_heads, hd), 3, axis=2)
        q = q[:, :, 0] * hd ** -0.5
        k, v = k[:, :, 0], v[:, :, 0]
        attn = jnp.einsum("bnhc,bmhc->bhnm", q, k)
        p = nn.softmax(attn.astype(jnp.promote_types(jnp.float32, self.dtype)),
                       axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhc->bnhc", p, v).reshape(b, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm block with LayerScale (reference dinov2_layers/block.py:36)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1", nn.initializers.ones, (self.dim,))
        ls2 = self.param("ls2", nn.initializers.ones, (self.dim,))
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = ViTAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(y)
        x = x + y * ls1.astype(y.dtype)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y * ls2.astype(y.dtype)


class DinoViT(nn.Module):
    """DINOv2 trunk returning (normed) token taps + class tokens.

    __call__(images [B,H,W,3]) → list of (tokens [B,h0*w0,C], cls [B,C])
    for each index in `taps` (token order row-major over the patch grid).
    H and W must be multiples of 14.
    """

    variant: str = "vits"
    taps: Sequence[int] | None = None
    pos_grid: int = 37  # 518 // 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim, depth, heads = VIT_CONFIGS[self.variant]
        taps = tuple(self.taps) if self.taps is not None \
            else INTERMEDIATE_LAYERS[self.variant]
        b, h, w, _ = x.shape
        h0, w0 = h // 14, w // 14

        tokens = nn.Conv(dim, (14, 14), strides=(14, 14), padding="VALID",
                         dtype=self.dtype, name="patch_embed")(x)
        tokens = tokens.reshape(b, h0 * w0, dim)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.pos_grid * self.pos_grid + 1, dim))

        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, dim)).astype(tokens.dtype),
             tokens], axis=1)

        # trace-time resize of the pos table (static shapes under jit)
        def resized_pos(p):
            if h0 == self.pos_grid and w0 == self.pos_grid:
                return p
            n = self.pos_grid
            mh = jnp.asarray(_torch_bicubic_matrix(n, h0, (h0 + 0.1) / n))
            mw = jnp.asarray(_torch_bicubic_matrix(n, w0, (w0 + 0.1) / n))
            grid = p[0, 1:].reshape(n, n, dim)
            out = jnp.einsum("hi,iwc->hwc", mh, grid)
            out = jnp.einsum("hwc,jw->hjc", out, mw)
            return jnp.concatenate([p[:, :1], out.reshape(1, h0 * w0, dim)], axis=1)

        tokens = tokens + resized_pos(pos_embed).astype(tokens.dtype)

        outs = []
        norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        for i in range(depth):
            tokens = ViTBlock(dim, heads, dtype=self.dtype, name=f"block{i}")(tokens)
            if i in taps:
                normed = norm(tokens)
                outs.append((normed[:, 1:], normed[:, 0]))
        return outs
