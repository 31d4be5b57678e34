"""IGEV building blocks (flax.linen, NHWC/NDHWC).

TPU-native equivalents of the reference submodules
(reference: stereo/modeling/models/igev/{submodule.py,extractor.py}):
BasicConv/BasicConv_IN (conv+BN/IN+LeakyReLU), Conv2x/Conv2x_IN (upsample-
concat-fuse), FeatureAtt (image-feature gating of the cost volume), the
MobileNetV2+decoder `Feature` trunk and the `MultiBasicEncoder` context net.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..backbones import MobileNetV2Features
from ..layers import ConvBlock, DeconvBlock, leaky_relu


def _norm_for(kind: str):
    return {"batch": "batch", "instance": "instance", "none": None}[kind]


class BasicConvIN(nn.Module):
    """conv + InstanceNorm + LeakyReLU (reference submodule.py:82-108)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    deconv: bool = False
    relu: bool = True
    ndim: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = leaky_relu() if self.relu else None
        cls = DeconvBlock if self.deconv else ConvBlock
        return cls(self.features, self.kernel_size, strides=self.strides,
                   norm="instance", act=act, ndim=self.ndim, dtype=self.dtype,
                   name="conv")(x, train=train)


class BasicConvBN(nn.Module):
    """conv + BatchNorm + LeakyReLU (reference submodule.py:6-32)."""

    features: int
    kernel_size: Any = 3
    strides: Any = 1
    deconv: bool = False
    bn: bool = True
    relu: bool = True
    ndim: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = leaky_relu() if self.relu else None
        cls = DeconvBlock if self.deconv else ConvBlock
        return cls(self.features, self.kernel_size, strides=self.strides,
                   norm="batch" if self.bn else None, act=act, ndim=self.ndim,
                   dtype=self.dtype, name="conv")(x, train=train)


class Conv2x(nn.Module):
    """2× up (deconv) or down conv, merge with skip, fuse
    (reference submodule.py:35-79 / :111-155)."""

    features: int
    deconv: bool = False
    concat: bool = True
    norm: str = "batch"  # 'batch' or 'instance'
    keep_concat: bool = True
    ndim: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rem, *, train: bool = False):
        if self.norm == "instance":
            Basic = BasicConvIN
            kw = {}
        else:  # 'batch' or 'none' (reference Conv2x(bn=False))
            Basic = BasicConvBN
            kw = {"bn": self.norm == "batch"}
        k = 4 if self.deconv else 3
        x = Basic(self.features, k, 2, deconv=self.deconv, ndim=self.ndim,
                  dtype=self.dtype, name="conv1", **kw)(x, train=train)
        if x.shape[1:-1] != rem.shape[1:-1]:
            x = jax.image.resize(x, (*rem.shape[:-1], x.shape[-1]), method="nearest")
        if self.concat:
            x = jnp.concatenate([x, rem], axis=-1)
            out_f = self.features * (2 if self.keep_concat else 1)
        else:
            x = x + rem
            out_f = self.features
        return Basic(out_f, 3, 1, ndim=self.ndim, dtype=self.dtype,
                     name="conv2", **kw)(x, train=train)


class FeatureAtt(nn.Module):
    """Gate a [B,D,H,W,Cv] volume by sigmoid(image-feature projection)
    (reference submodule.py:237-250; IGEV++ uses the InstanceNorm flavor,
    igevpp/submodule.py:162-175)."""

    cv_features: int
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cv, feat, *, train: bool = False):
        Basic = BasicConvBN if self.norm == "batch" else BasicConvIN
        a = Basic(feat.shape[-1] // 2, 1, dtype=self.dtype,
                  name="att0")(feat, train=train)
        a = nn.Conv(self.cv_features, (1, 1), dtype=self.dtype, name="att1")(a)
        return nn.sigmoid(a)[:, None] * cv  # broadcast over D


class Feature(nn.Module):
    """MobileNetV2 trunk + Conv2x_IN decoder → [x4 48c, x8 64c, x16 192c, x32 160c]
    (reference extractor.py:321-355)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        _, x4, x8, x16, x32 = MobileNetV2Features(dtype=self.dtype, name="trunk")(
            x, train=train)
        y16 = Conv2x(96, deconv=True, norm="instance", dtype=self.dtype,
                     name="deconv32_16")(x32, x16, train=train)   # 192c
        y8 = Conv2x(32, deconv=True, norm="instance", dtype=self.dtype,
                    name="deconv16_8")(y16, x8, train=train)      # 64c
        y4 = Conv2x(24, deconv=True, norm="instance", dtype=self.dtype,
                    name="deconv8_4")(y8, x4, train=train)        # 48c
        y4 = BasicConvIN(48, 3, dtype=self.dtype, name="conv4")(y4, train=train)
        return [y4, y8, y16, x32]


class ResidualBlockCtx(nn.Module):
    """Context-net residual block (reference extractor.py:6-59)."""

    features: int
    strides: int = 1
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        nrm = _norm_for(self.norm)
        y = ConvBlock(self.features, 3, strides=self.strides, use_bias=True,
                      norm=nrm, act=nn.relu, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvBlock(self.features, 3, use_bias=True, norm=nrm, act=nn.relu,
                      dtype=self.dtype, name="conv2")(y, train=train)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvBlock(self.features, 1, strides=self.strides, use_bias=True,
                          norm=nrm, dtype=self.dtype, name="downsample")(x, train=train)
        return nn.relu(x + y)


class MultiBasicEncoder(nn.Module):
    """Context encoder emitting (hidden, context) pairs at 1/4, 1/8, 1/16
    (reference extractor.py:194-298, N_DOWNSAMPLE=2 wiring)."""

    output_dims: Sequence[Sequence[int]]  # [hidden_dims, context_dims], each [d16,d8,d4]
    norm: str = "batch"
    downsample: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        nrm = _norm_for(self.norm)
        x = ConvBlock(64, 7, strides=2 if self.downsample > 2 else 1, use_bias=True,
                      norm=nrm, act=nn.relu, dtype=self.dtype, name="conv1")(x, train=train)
        for i, (f, s) in enumerate([
            (64, 1),
            (96, 2 if self.downsample > 1 else 1),
            (128, 2 if self.downsample > 0 else 1),
        ]):
            for j in range(2):
                x = ResidualBlockCtx(f, strides=s if j == 0 else 1, norm=self.norm,
                                     dtype=self.dtype, name=f"layer{i+1}_{j}")(x, train=train)

        def heads(x, scale, dim_idx, with_res):
            outs = []
            for oi, dims in enumerate(self.output_dims):
                y = x
                if with_res:
                    y = ResidualBlockCtx(128, norm=self.norm, dtype=self.dtype,
                                         name=f"out{scale}_{oi}_res")(y, train=train)
                y = nn.Conv(dims[dim_idx], (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"out{scale}_{oi}_conv")(y)
                outs.append(y)
            return outs

        out04 = heads(x, "04", 2, True)
        for j in range(2):
            x = ResidualBlockCtx(128, strides=2 if j == 0 else 1, norm=self.norm,
                                 dtype=self.dtype, name=f"layer4_{j}")(x, train=train)
        out08 = heads(x, "08", 1, True)
        for j in range(2):
            x = ResidualBlockCtx(128, strides=2 if j == 0 else 1, norm=self.norm,
                                 dtype=self.dtype, name=f"layer5_{j}")(x, train=train)
        out16 = heads(x, "16", 0, False)
        return [out04, out08, out16]
