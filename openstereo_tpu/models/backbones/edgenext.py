"""EdgeNeXt-small trunk (flax, NHWC) — the CNN branch of the
FoundationStereo feature extractor (reference:
stereo/modeling/models/foundationstereo/core/extractor.py:321-369 and
fast_foundationstereo/core/extractor.py:37-77 instantiate timm
``edgenext_small`` and tap its four stage outputs at 1/4..1/32).

EdgeNeXt (Maaz et al., ECCV-W 2022) interleaves ConvNeXt-style local
convolution encoders with Split-Depthwise-Transposed-Attention (SDTA)
blocks whose attention runs over the *channel* axis — cost O(C²·HW)
instead of O((HW)²·C), which on TPU is a pair of small MXU matmuls per
block instead of a giant attention map.

edgenext_small geometry: dims (48, 96, 160, 304), depths (3, 3, 9, 3),
one SDTA block closing each of stages 2-4, local kernels (3, 5, 7, 9),
8 attention heads, expansion 4, LayerScale 1e-6.

This environment cannot fetch ImageNet weights (zero egress) — consumers
train the trunk from random init or load converted weights via
MODEL.PRETRAINED_MODEL (docs/PARITY.md records the scope decision).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _layer_norm(dtype, name):
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=name)


class ConvEncoder(nn.Module):
    """dw k×k → LN → pw 4× → GELU → pw → LayerScale, residual."""

    dim: int
    kernel: int = 7
    expan_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ls = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        y = nn.Conv(self.dim, (self.kernel, self.kernel), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype, name="dwconv")(x)
        y = _layer_norm(self.dtype, "norm")(y)
        y = nn.Dense(self.dim * self.expan_ratio, dtype=self.dtype, name="pw1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(y)
        return x + y * ls.astype(y.dtype)


class XCA(nn.Module):
    """Cross-covariance (transposed) attention: softmax over the C×C
    cosine-similarity of L2-normalised q/k, learned temperature."""

    dim: int
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        temp = self.param("temperature", nn.initializers.ones, (nh, 1, 1))
        qkv = nn.Dense(c * 3, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, nh, hd), 3, axis=2)
        # transpose attention: tokens are the contraction axis
        q = jnp.swapaxes(q[:, :, 0], 1, 2)  # [B, nh, N, hd] -> attn over hd
        k = jnp.swapaxes(k[:, :, 0], 1, 2)
        v = jnp.swapaxes(v[:, :, 0], 1, 2)
        # torch F.normalize semantics: v / max(||v||, eps), eps=1e-12
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=2, keepdims=True), 1e-12)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=2, keepdims=True), 1e-12)
        attn = jnp.einsum("bhnc,bhnd->bhcd", qn, kn) * temp.astype(q.dtype)
        p = nn.softmax(attn.astype(jnp.promote_types(jnp.float32, self.dtype)),
                       axis=-1).astype(v.dtype)
        out = jnp.einsum("bhcd,bhnd->bhnc", p, v)
        out = jnp.swapaxes(out, 1, 2).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SDTAEncoder(nn.Module):
    """Split-depthwise cascade + transposed attention + MLP
    (EdgeNeXt paper fig. 3; timm SplitTransposeBlock)."""

    dim: int
    scales: int = 2
    num_heads: int = 8
    expan_ratio: int = 4
    use_pos_emb: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        # split-depthwise cascade: chunk channels, each chunk's dw conv sees
        # the previous chunk's output added in (Res2Net style)
        width = int(np.ceil(c / self.scales))
        splits = [x[..., i * width:(i + 1) * width]
                  for i in range(int(np.ceil(c / width)))]
        outs, prev = [], None
        for i, sp in enumerate(splits[:-1]):
            inp = sp if prev is None else sp + prev
            prev = nn.Conv(inp.shape[-1], (3, 3), padding="SAME",
                           feature_group_count=inp.shape[-1], dtype=self.dtype,
                           name=f"conv{i}")(inp)
            outs.append(prev)
        outs.append(splits[-1])
        y = jnp.concatenate(outs, axis=-1)

        tok = y.reshape(b, h * w, c)
        if self.use_pos_emb:
            # timm PositionalEncodingFourier: DETR-style sine table with a
            # LEARNED 1x1 projection (token_projection) — params, not a
            # constant table.
            table = _fourier_pos_table(h, w).astype(tok.dtype)
            tok = tok + nn.Dense(c, dtype=self.dtype, name="pos_proj")(table)
        ls1 = self.param("gamma_xca", nn.initializers.constant(1e-6), (c,))
        tok = tok + ls1.astype(tok.dtype) * XCA(
            c, self.num_heads, dtype=self.dtype, name="xca")(
            _layer_norm(self.dtype, "norm_xca")(tok))

        # timm SplitTransposeBlock residual structure: the block output is
        # shortcut + gamma * mlp(norm(tok)) — the post-attention tokens feed
        # the MLP only; they are NOT themselves summed into the output.
        ls2 = self.param("gamma", nn.initializers.constant(1e-6), (c,))
        z = _layer_norm(self.dtype, "norm")(tok)
        z = nn.Dense(c * self.expan_ratio, dtype=self.dtype, name="pw1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, dtype=self.dtype, name="pw2")(z)
        return x + (ls2.astype(z.dtype) * z).reshape(b, h, w, c)


def _fourier_pos_table(h: int, w: int, hidden_dim: int = 32,
                       temperature: float = 10000.0):
    """timm PositionalEncodingFourier's pre-projection table [h*w, 2*hidden]
    (trace-time constant; DETR-style normalised cumsum coordinates, pairs of
    (sin, cos) sharing each frequency, y-block then x-block)."""
    eps = 1e-6
    scale = 2 * np.pi
    y = (np.arange(1, h + 1, dtype=np.float64) / (h + eps) * scale)
    x = (np.arange(1, w + 1, dtype=np.float64) / (w + eps) * scale)
    dim_t = temperature ** (2 * (np.arange(hidden_dim) // 2) / hidden_dim)

    def enc(v):  # [N] -> [N, hidden]
        p = v[:, None] / dim_t[None, :]
        out = np.empty_like(p)
        out[:, 0::2] = np.sin(p[:, 0::2])
        out[:, 1::2] = np.cos(p[:, 1::2])
        return out

    py = np.repeat(enc(y), w, axis=0)           # [h*w, hidden]
    px = np.tile(enc(x), (h, 1))                # [h*w, hidden]
    return jnp.asarray(np.concatenate([py, px], axis=1), jnp.float32)


class EdgeNeXtFeatures(nn.Module):
    """Four-stage trunk → [c4@1/4, c8@1/8, c16@1/16, c32@1/32]."""

    dims: Sequence[int] = (48, 96, 160, 304)
    depths: Sequence[int] = (3, 3, 9, 3)
    kernels: Sequence[int] = (3, 5, 7, 9)
    global_blocks: Sequence[int] = (0, 1, 1, 1)
    scales: Sequence[int] = (2, 2, 3, 4)
    pos_emb: Sequence[bool] = (False, True, False, False)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="stem_conv")(x)
        x = _layer_norm(self.dtype, "stem_norm")(x)
        outs = []
        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            if si > 0:
                x = _layer_norm(self.dtype, f"down{si}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down{si}_conv")(x)
            n_local = depth - self.global_blocks[si]
            for bi in range(n_local):
                x = ConvEncoder(dim, self.kernels[si], dtype=self.dtype,
                                name=f"stage{si}_block{bi}")(x)
            for gi in range(self.global_blocks[si]):
                x = SDTAEncoder(dim, scales=self.scales[si],
                                use_pos_emb=self.pos_emb[si], dtype=self.dtype,
                                name=f"stage{si}_sdta{gi}")(x)
            outs.append(x)
        return outs
