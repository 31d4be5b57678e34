"""Swin Transformer backbone (Swin-T) — flax, NHWC.

TPU-native re-design of NMRF's Swin backbone
(reference: stereo/modeling/models/nmrf/swin.py:507-683 — itself the
standard Swin-T: patch-embed 4x4, 4 stages of depths (2,2,6,2), window 7,
shifted windows on odd blocks, relative position bias, patch merging).

Design notes (vs the torch original):
- tensors stay [B, H, W, C] end to end — window partition is a reshape/
  transpose, the cyclic shift is jnp.roll; no BLC flattening round-trips;
- window-pad amounts, relative-position indices and shifted-window masks
  are computed with numpy at TRACE time (shapes are static under jit), so
  nothing mask-related touches the device until the fused attention add;
- stochastic depth (DropPath) is flax Dropout broadcast over all
  non-batch dims, identical semantics to timm's DropPath;
- GELU is exact (erf) to match torch nn.GELU numerics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

_gelu = partial(nn.gelu, approximate=False)


def drop_path(x, rate: float, deterministic: bool, module: nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""
    if rate == 0.0 or deterministic:
        return x
    return nn.Dropout(rate, broadcast_dims=tuple(range(1, x.ndim)))(
        x, deterministic=False, rng=module.make_rng("dropout"))


def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """[wh*ww, wh*ww] indices into the (2wh-1)(2ww-1) bias table."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # [2, wh, ww]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


def shifted_window_mask(hp: int, wp: int, ws: int, shift: int,
                        fill: float = -100.0) -> np.ndarray:
    """[nW, ws*ws, ws*ws] additive mask for SW-MSA (trace-time numpy;
    reference swin.py:422-449)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, fill, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B·nW, ws·ws, C] (H, W divisible by ws)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, b: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference swin.py:77-174)."""

    dim: int
    window_size: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: [B_, N, C] windows; mask: [nW, N, N] numpy or None."""
        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h
        ws = self.window_size
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), h))
        idx = _rel_pos_index(ws, ws)
        bias = table[idx.reshape(-1)].reshape(n, n, h)
        bias = bias.transpose(2, 0, 1).astype(self.dtype)

        attn = jnp.einsum("bhid,bhjd->bhij", q * (hd ** -0.5), k)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n)
            attn = attn + jnp.asarray(mask, self.dtype)[None, :, None]
            attn = attn.reshape(b_, h, n, n)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """Swin block: (S)W-MSA + MLP (reference swin.py:177-303)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if self.shift_size > 0:
            x = jnp.roll(x, (-self.shift_size, -self.shift_size), axis=(1, 2))
            mask = shifted_window_mask(hp, wp, ws, self.shift_size)
        else:
            mask = None

        xw = window_partition(x, ws)
        xw = WindowAttention(self.dim, ws, self.num_heads, dtype=self.dtype,
                             name="attn")(xw, mask)
        x = window_reverse(xw, ws, b, hp, wp)

        if self.shift_size > 0:
            x = jnp.roll(x, (self.shift_size, self.shift_size), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]

        x = shortcut + drop_path(x, self.drop_path_rate, not train, self)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = _gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + drop_path(y, self.drop_path_rate, not train, self)


class PatchMerging(nn.Module):
    """2x2 patch merge + linear reduce (reference swin.py:306-345)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-T trunk returning the 4 stage features p0..p3 (NHWC, strides
    4/8/16/32; reference swin.py:507-683)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    patch_size: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, _ = x.shape
        ps = self.patch_size
        if w % ps:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, ps - w % ps), (0, 0)))
        if h % ps:
            x = jnp.pad(x, ((0, 0), (0, ps - h % ps), (0, 0), (0, 0)))
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps),
                    dtype=self.dtype, name="patch_embed_proj")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_embed_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = {}
        blk_i = 0
        for stage, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** stage)
            for j in range(depth):
                x = SwinBlock(
                    dim=dim, num_heads=self.num_heads[stage],
                    window_size=self.window_size,
                    shift_size=0 if j % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path_rate=float(dpr[blk_i]),
                    dtype=self.dtype,
                    name=f"layers_{stage}_blocks_{j}",
                )(x, train=train)
                blk_i += 1
            if stage in self.out_indices:
                outs[f"p{stage}"] = x
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"layers_{stage}_downsample")(x)
        return outs
