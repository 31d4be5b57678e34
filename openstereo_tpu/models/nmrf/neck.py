"""NMRF image encoders: ResNet backbone and Swin+DeformNeck adaptor.

TPU-native re-design of
- reference stereo/modeling/models/nmrf/backbone.py:17-203 (instance-norm
  residual trunk; SwinAdaptor = Swin-T + deformable-attention neck) and
- reference stereo/modeling/models/nmrf/adaptor_modules.py:37-187
  (ConvStem / Extractor / DeformNeck) with the MSDeformAttn CUDA op
  (ops/modules/ms_deform_attn.py:28-130) replaced by the gather+contraction
  op in ops/msda.py.

Both encoders return [feat_4s, feat_8s] (high → low res, NHWC); NMRF's
forward reverses this to (1/8, 1/4) order.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.msda import ms_deform_attn
from ..layers import ConvBlock
from .swin import SwinTransformer, drop_path

Dtype = Any

_gelu = partial(nn.gelu, approximate=False)


def _instance_norm(x, dtype, name):
    # torch nn.InstanceNorm2d default: non-affine, eps=1e-5
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                        use_bias=False, use_scale=False, dtype=dtype,
                        name=name)(x)


class ResidualBlock(nn.Module):
    """conv-IN-relu x2 + skip (reference backbone.py:17-46)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_instance_norm(y, self.dtype, "norm1"))
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(_instance_norm(y, self.dtype, "norm2"))
        if self.stride != 1 or inp != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        dtype=self.dtype, name="downsample")(x)
            x = _instance_norm(x, self.dtype, "norm3")
        return nn.relu(x + y)


class ResNetEncoder(nn.Module):
    """Instance-norm residual trunk → [feat_4s, feat_8s]
    (reference backbone.py:49-99; 1/2 → 1/4 trunk, 1x1 head, avg-pool 8s)."""

    output_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_instance_norm(x, self.dtype, "norm1"))
        for i, (dim, stride) in enumerate(((64, 1), (96, 2), (128, 1))):
            x = ResidualBlock(dim, stride, dtype=self.dtype,
                              name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(dim, 1, dtype=self.dtype,
                              name=f"layer{i + 1}_1")(x)
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                    name="conv2")(x)
        x8 = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return [x, x8]


class MSDeformAttnLayer(nn.Module):
    """Deformable attention layer (reference ops/modules/ms_deform_attn.py:28-130).

    Single feature level per call (the neck queries each Swin stage
    separately). The learned offsets/weights come from the query; sampling
    runs through the TPU gather op (ops/msda.py)."""

    d_model: int = 128
    n_heads: int = 8
    n_points: int = 4
    ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, value_hwc):
        """query [B, Lq, C]; reference_points [Lq, 2] (normalised, numpy or
        jnp); value_hwc [B, H_l, W_l, C] → [B, Lq, C]."""
        b, lq, c = query.shape
        _, h, w, _ = value_hwc.shape
        m, p = self.n_heads, self.n_points
        vdim = int(c * self.ratio)

        value = nn.Dense(vdim, dtype=self.dtype, name="value_proj")(value_hwc)
        value = value.reshape(b, h, w, m, vdim // m)

        off = nn.Dense(m * p * 2, dtype=self.dtype,
                       name="sampling_offsets")(query)
        off = off.reshape(b, lq, m, 1, p, 2)
        wgt = nn.Dense(m * p, dtype=self.dtype,
                       name="attention_weights")(query)
        wgt = nn.softmax(wgt.reshape(b, lq, m, p), axis=-1)
        wgt = wgt.reshape(b, lq, m, 1, p)

        ref = jnp.asarray(reference_points, self.dtype)
        norm = jnp.asarray([w, h], self.dtype)
        loc = ref[None, :, None, None, None, :] + off / norm
        out = ms_deform_attn([value], loc, wgt)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)


class ConvFFN(nn.Module):
    """fc → depthwise 3x3 → gelu → fc (reference adaptor_modules.py:37-68)."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h, w):
        b, lq, c = x.shape
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        y = y.reshape(b, h, w, self.hidden)
        y = nn.Conv(self.hidden, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=self.hidden, dtype=self.dtype,
                    name="dwconv")(y)
        y = _gelu(y.reshape(b, lq, self.hidden))
        return nn.Dense(c, dtype=self.dtype, name="fc2")(y)


class Extractor(nn.Module):
    """Query ← deformable-attention(feature level) + ConvFFN
    (reference adaptor_modules.py:71-105)."""

    dim: int
    n_points: int = 4
    deform_ratio: float = 1.0
    cffn_ratio: float = 0.25
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, feat_hwc, h, w, *,
                 train: bool = False):
        ln = partial(nn.LayerNorm, epsilon=1e-6, dtype=self.dtype)
        q = ln(name="query_norm")(query)
        fshape = feat_hwc.shape
        f = ln(name="feat_norm")(feat_hwc.reshape(
            fshape[0], -1, fshape[-1])).reshape(fshape)
        attn = MSDeformAttnLayer(self.dim, n_heads=8, n_points=self.n_points,
                                 ratio=self.deform_ratio, dtype=self.dtype,
                                 name="attn")(q, reference_points, f)
        query = query + attn
        y = ConvFFN(int(self.dim * self.cffn_ratio), dtype=self.dtype,
                    name="ffn")(ln(name="ffn_norm")(query), h, w)
        return query + drop_path(y, self.drop_path_rate, not train, self)


class ConvStem(nn.Module):
    """3-conv stem to 1/4 + 1x1 fc (reference adaptor_modules.py:108-142)."""

    inplanes: int = 64
    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(self.inplanes, (3, 3),
                        strides=(2, 2) if i == 0 else (1, 1),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"stem_{i}")(x)
            x = nn.relu(_instance_norm(x, self.dtype, f"stem_norm_{i}"))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="fc")(x)


def _reference_points(h: int, w: int) -> np.ndarray:
    """Pixel-centre reference points of the 1/4 grid, normalised to [0,1]
    (reference adaptor_modules.py:10-22). Trace-time numpy, [Lq, 2]=(x,y)."""
    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / w
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack([gx, gy], axis=-1).reshape(-1, 2).astype(np.float32)


class DeformNeck(nn.Module):
    """Fuse the 4 Swin stages into one 1/4 map via a conv-stem query and
    four deformable-attention extractors (reference adaptor_modules.py:145-187)."""

    dim: int = 128
    in_channels: Sequence[int] = (96, 192, 384, 768)
    deform_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, features, *, train: bool = False):
        b, hi, wi, _ = image.shape
        h, w = hi // 4, wi // 4
        c = ConvStem(64, self.dim, dtype=self.dtype, name="stem")(image)
        c = c.reshape(b, h * w, self.dim)
        ref = _reference_points(h, w)
        ln = partial(nn.LayerNorm, epsilon=1e-6, dtype=self.dtype)
        for idx, feat in enumerate(features):
            fb, fh, fw, fc = feat.shape
            f = ln(name=f"fcs_{idx}_norm")(feat)
            f = nn.Dense(self.dim, dtype=self.dtype,
                         name=f"fcs_{idx}_linear")(f)
            c = Extractor(self.dim, deform_ratio=self.deform_ratio,
                          dtype=self.dtype, name=f"extractors_{idx}")(
                c, ref, f, h, w, train=train)
        return c.reshape(b, h, w, self.dim)


class SwinEncoder(nn.Module):
    """Swin-T + DeformNeck → [feat_4s, feat_8s]
    (reference backbone.py:102-159)."""

    out_channels: int = 128
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        outs = SwinTransformer(drop_path_rate=self.drop_path_rate,
                               dtype=self.dtype, name="backbone")(
            x, train=train)
        feats = [outs[f"p{i}"] for i in range(4)]
        out = DeformNeck(self.out_channels, dtype=self.dtype,
                         name="neck")(x, feats, train=train)
        return [out, nn.avg_pool(out, (2, 2), strides=(2, 2))]
