"""FoundationStereo building blocks (flax, NHWC/NDHWC).

Reference: stereo/modeling/models/foundationstereo/core/{submodule.py,
update.py,extractor.py}. TPU-native choices:

- Conv3dNormActReduced factorises the 3D conv into a spatial (1,k,k) conv
  and a long disparity (kd,1,1) conv — on TPU both lower through the
  tap-merged conv3d path onto the MXU, and the 17-tap disparity conv is a
  cheap banded matmul along D instead of a huge dense 3D kernel;
- the cost-volume disparity attention treats every pixel as a batch
  element and D as the sequence: [B·H·W, D, C] with D ≤ max_disp/16 —
  small MXU matmuls, no flash-attention kernel needed (the reference uses
  flash_attn purely to fit GPU SRAM; D≈12-48 fits VMEM trivially);
- SelectiveConvGRU runs both kernel sizes and gates by the SAM attention
  map — two convs instead of data-dependent branching, XLA-friendly.

Volumes layout: [B, D, H, W, C] (disparity leading the spatial dims,
channels on lanes) — matching the rest of this framework.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops import resize_linear_align_corners
from ..igev.blocks import BasicConvIN, Conv2x, FeatureAtt, ResidualBlockCtx
from ..layers import ConvBlock, DeconvBlock, head_dtype


class Conv3dNormActReduced(nn.Module):
    """(1,k,k) spatial conv + (kd,1,1) disparity conv, each BN+ReLU
    (reference submodule.py:87-116)."""

    features: int
    kernel_size: int = 3
    kernel_disp: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        k, kd = self.kernel_size, self.kernel_disp
        x = ConvBlock(self.features, (1, k, k), norm="batch", act=nn.relu,
                      use_bias=True, ndim=3, dtype=self.dtype,
                      name="conv_sp")(x, train=train)
        return ConvBlock(self.features, (kd, 1, 1), norm="batch", act=nn.relu,
                         use_bias=True, ndim=3, dtype=self.dtype,
                         name="conv_d")(x, train=train)


class ResnetBasicBlock3D(nn.Module):
    """conv-bn-relu-conv-bn + skip, post-relu (reference submodule.py:157-205)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = ConvBlock(self.features, 3, norm="batch", act=nn.relu,
                      ndim=3, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvBlock(self.features, 3, norm="batch", ndim=3,
                      dtype=self.dtype, name="conv2")(y, train=train)
        return nn.relu(x + y)


class Conv2xFS(nn.Module):
    """FoundationStereo's Conv2x_IN (submodule.py:383-418): deconv up-stage,
    concat with skip, then a RESIDUAL InstanceNorm fuse block
    (ResnetBasicBlock, submodule.py:117-155) — unlike IGEV's plain-conv
    fuse. Norms are non-affine; fuse convs are bias-free."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rem, *, train: bool = False):
        x = BasicConvIN(self.features, 4, 2, deconv=True, dtype=self.dtype,
                        name="conv1")(x, train=train)
        x = jnp.concatenate([x, rem], axis=-1)
        f2 = self.features * 2
        y = ConvBlock(f2, 3, norm="instance", act=nn.relu, dtype=self.dtype,
                      name="fuse1")(x, train=train)
        y = ConvBlock(f2, 3, norm="instance", dtype=self.dtype,
                      name="fuse2")(y, train=train)
        return nn.relu(x + y)


class ResnetBasicBlockIN(nn.Module):
    """2D resnet block with InstanceNorm, post-relu (reference
    extractor.py:18-60, norm_fn='instance' — used by FSFeature.conv4)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # RAFT-style block: relu after BOTH norms, then relu(x + y)
        # (extractor.py:66-79 — unlike submodule.py's ResnetBasicBlock,
        # which has no activation after its second norm)
        y = ConvBlock(self.features, 3, norm="instance", act=nn.relu,
                      use_bias=True, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvBlock(self.features, 3, norm="instance", act=nn.relu,
                      use_bias=True, dtype=self.dtype, name="conv2")(y, train=train)
        return nn.relu(x + y)


class DispTransformerLayer(nn.Module):
    """Post-norm transformer encoder layer over the disparity axis
    (reference submodule.py:267-293)."""

    dim: int
    num_heads: int = 4
    ffn: int = 28
    # FastFoundationStereo's layer feeds (B, L, H, D) tensors straight into
    # F.scaled_dot_product_attention (fast submodule.py:250), which attends
    # over the HEAD axis per disparity position instead of over disparity —
    # reproduce that exact (degenerate) semantics when headwise=True.
    headwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B', D, C]
        b, d, c = x.shape
        nh = self.num_heads
        hd = c // nh
        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, d, nh, hd) * hd ** -0.5
        k = k.reshape(b, d, nh, hd)
        v = v.reshape(b, d, nh, hd)
        if self.headwise:
            attn = jnp.einsum("bdhc,bdgc->bdhg", q, k)
            p = nn.softmax(attn.astype(head_dtype(self.dtype)),
                           axis=-1).astype(v.dtype)
            y = jnp.einsum("bdhg,bdgc->bdhc", p, v).reshape(b, d, c)
        else:
            attn = jnp.einsum("bdhc,behc->bhde", q, k)
            p = nn.softmax(attn.astype(head_dtype(self.dtype)),
                           axis=-1).astype(v.dtype)
            y = jnp.einsum("bhde,behc->bdhc", p, v).reshape(b, d, c)
        y = nn.Dense(c, dtype=self.dtype, name="out_proj")(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + y)
        y = nn.Dense(self.ffn, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="fc2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + y)


def _sincos_table(max_len: int, dim: int) -> np.ndarray:
    """Classic sin/cos positional table [max_len, dim]
    (reference submodule.py:506-537). Computed in f32 end-to-end exactly
    like the reference (torch builds the table in float32 and casts up)."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                 * np.float32(-(np.log(10000.0) / dim)))[None]
    out = np.zeros((max_len, dim), np.float32)
    out[:, 0::2] = np.sin(pos * div)
    out[:, 1::2] = np.cos(pos * div[:, : out[:, 1::2].shape[1]])
    return out


class CostVolumeDisparityAttention(nn.Module):
    """Self-attention along D for every pixel (reference submodule.py:540-564)."""

    dim: int
    num_heads: int = 4
    ffn: int = 28
    num_layers: int = 4
    headwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vol):  # [B, D, H, W, C]
        b, d, h, w, c = vol.shape
        x = jnp.transpose(vol, (0, 2, 3, 1, 4)).reshape(b * h * w, d, c)
        x = x + jnp.asarray(_sincos_table(d, c)).astype(x.dtype)
        for i in range(self.num_layers):
            x = DispTransformerLayer(self.dim, self.num_heads, self.ffn,
                                     headwise=self.headwise,
                                     dtype=self.dtype, name=f"sa{i}")(x)
        return jnp.transpose(x.reshape(b, h, w, d, c), (0, 3, 1, 2, 4))


class AHCFHourglass(nn.Module):
    """Attentive hybrid cost filtering hourglass
    (reference foundation_stereo.py:42-124): 3-level encoder with reduced
    3D convs + image-feature attention, a disparity transformer on a
    4×-patchified copy of the input volume, decoder with skip aggregation.
    """

    features: int  # volume_dim (28)
    feat_dims: Sequence[int]
    max_disp: int = 192
    headwise_att: bool = False   # FastFoundationStereo quirk, see above
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, features, *, train: bool = False):
        c = self.features
        red = lambda f, name: Conv3dNormActReduced(  # noqa: E731
            f, 3, 17, dtype=self.dtype, name=name)
        down = lambda f, name: ConvBlock(  # noqa: E731
            f, 3, strides=2, norm="batch", act=nn.leaky_relu,
            ndim=3, dtype=self.dtype, name=name)
        up = lambda f, name: DeconvBlock(  # noqa: E731
            f, 4, 2, norm="batch", act=nn.leaky_relu, ndim=3,
            dtype=self.dtype, name=name)

        conv1 = down(c * 2, "conv1a")(x, train=train)
        conv1 = red(c * 2, "conv1b")(conv1, train=train)
        conv1 = FeatureAtt(c * 2, dtype=self.dtype, name="att8")(
            conv1, features[1], train=train)

        conv2 = down(c * 4, "conv2a")(conv1, train=train)
        conv2 = red(c * 4, "conv2b")(conv2, train=train)
        conv2 = FeatureAtt(c * 4, dtype=self.dtype, name="att16")(
            conv2, features[2], train=train)

        conv3 = down(c * 6, "conv3a")(conv2, train=train)
        conv3 = red(c * 6, "conv3b")(conv3, train=train)
        conv3 = FeatureAtt(c * 6, dtype=self.dtype, name="att32")(
            conv3, features[3], train=train)

        y = up(c * 4, "conv3_up")(conv3, train=train)
        y = jnp.concatenate([y, conv2], axis=-1)
        y = ConvBlock(c * 4, 1, norm="batch", act=nn.leaky_relu,
                      ndim=3, dtype=self.dtype, name="agg0a")(y, train=train)
        y = red(c * 4, "agg0b")(y, train=train)
        y = red(c * 4, "agg0c")(y, train=train)
        y = FeatureAtt(c * 4, dtype=self.dtype, name="att_up16")(
            y, features[2], train=train)

        y = up(c * 2, "conv2_up")(y, train=train)
        y = jnp.concatenate([y, conv1], axis=-1)
        y = ConvBlock(c * 2, 1, norm="batch", act=nn.leaky_relu,
                      ndim=3, dtype=self.dtype, name="agg1a")(y, train=train)
        y = red(c * 2, "agg1b")(y, train=train)
        y = red(c * 2, "agg1c")(y, train=train)
        y = FeatureAtt(c * 2, dtype=self.dtype, name="att_up8")(
            y, features[1], train=train)

        y = up(c, "conv1_up")(y, train=train)

        # disparity transformer branch on the 4×-patchified input volume
        patch = nn.Conv(c, (4, 4, 4), strides=(4, 4, 4), padding="VALID",
                        feature_group_count=c, dtype=self.dtype,
                        name="conv_patch")(x)
        patch = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name="conv_patch_bn")(patch)
        patch = CostVolumeDisparityAttention(
            c, num_heads=4, ffn=c, num_layers=4, headwise=self.headwise_att,
            dtype=self.dtype, name="disp_att")(patch)
        # trilinear ×4 back to the decoder resolution (reference
        # foundation_stereo.py:117-119, align_corners=False)
        import jax

        bb, dd, hh, ww, cc = y.shape
        patch = jax.image.resize(patch, (bb, dd, hh, ww, cc), method="trilinear")
        y = y + patch

        y = red(c, "out0")(y, train=train)
        return red(c, "out1")(y, train=train)


class ChannelAttentionEnhancement(nn.Module):
    """SE-style channel gate with avg+max pooling (reference submodule.py:567-583)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fc1 = nn.Conv(self.features // 16, (1, 1), use_bias=False,
                      dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                      name="fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return nn.sigmoid(out)


class SpatialAttentionExtractor(nn.Module):
    """7×7 conv over [mean, max] channel stats (reference submodule.py:585-596)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        stats = jnp.concatenate(
            [jnp.mean(x, axis=-1, keepdims=True),
             jnp.max(x, axis=-1, keepdims=True)], axis=-1)
        y = nn.Conv(1, (7, 7), padding="SAME", use_bias=False, dtype=self.dtype,
                    name="samconv")(stats)
        return nn.sigmoid(y)


class EdgeNextConvEncoderPlain(nn.Module):
    """ConvNeXt-style encoder without norm (reference submodule.py:624-650,
    norm=None variant used inside DispHead)."""

    dim: int
    kernel: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ls = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        y = nn.Conv(self.dim, (self.kernel, self.kernel), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="dwconv")(x)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name="pw1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(y)
        return x + y * ls.astype(y.dtype)


class FSDispHead(nn.Module):
    """conv-relu + 2 EdgeNext encoders + conv (reference update.py:18-30)."""

    dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                            name="conv_in")(x))
        x = EdgeNextConvEncoderPlain(self.dim, dtype=self.dtype, name="enc0")(x)
        x = EdgeNextConvEncoderPlain(self.dim, dtype=self.dtype, name="enc1")(x)
        return nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                       name="conv_out")(x)


class RaftConvGRU(nn.Module):
    hidden_dim: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x, hx):
        k = (self.kernel, self.kernel)
        conv = lambda name: nn.Conv(self.hidden_dim, k, padding="SAME",  # noqa: E731
                                    dtype=self.dtype, name=name)
        z = nn.sigmoid(conv("convz")(hx))
        r = nn.sigmoid(conv("convr")(hx))
        q = nn.tanh(conv("convq")(jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SelectiveConvGRU(nn.Module):
    """Small/large-kernel GRU pair gated by a spatial attention map
    (reference update.py:96-117)."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, att, h, *xs):
        x = jnp.concatenate(xs, axis=-1)
        x = nn.relu(nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                            dtype=self.dtype, name="conv0")(x))
        hx = jnp.concatenate([x, h], axis=-1)
        hx = nn.relu(nn.Conv(hx.shape[-1], (3, 3), padding="SAME",
                             dtype=self.dtype, name="conv1")(hx))
        small = RaftConvGRU(self.hidden_dim, 1, dtype=self.dtype,
                            name="small_gru")(h, x, hx)
        large = RaftConvGRU(self.hidden_dim, 3, dtype=self.dtype,
                            name="large_gru")(h, x, hx)
        return small * att + large * (1 - att)


def pool2x(x):
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return nn.avg_pool(x, (3, 3), strides=(2, 2), count_include_pad=True)


def interp_to(x, dest):
    return resize_linear_align_corners(x, (dest.shape[1], dest.shape[2]), axes=(1, 2))


class BasicMotionEncoderFS(nn.Module):
    """Geo features + disp → motion features (reference update.py:49-71,
    ngroup=volume_dim). FastFoundationStereo's variant fuses with a 1×1
    conv instead of 3×3 (fast_foundationstereo/core/update.py:33)."""

    fuse_kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, corr):
        conv = lambda f, k, name: nn.Conv(f, (k, k), padding="SAME",  # noqa: E731
                                          dtype=self.dtype, name=name)
        cor = nn.relu(conv(256, 1, "convc1")(corr))
        cor = nn.relu(conv(256, 3, "convc2")(cor))
        d = nn.relu(conv(64, 7, "convd1")(disp))
        d = nn.relu(conv(64, 3, "convd2")(d))
        out = nn.relu(conv(127, self.fuse_kernel, "conv")(
            jnp.concatenate([cor, d], axis=-1)))
        return jnp.concatenate([out, disp], axis=-1)


class BasicSelectiveMultiUpdateBlock(nn.Module):
    """3-scale selective GRU cascade (reference update.py:120-157)."""

    hidden_dim: int = 128
    n_gru_layers: int = 3
    motion_fuse_kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, disp, att):
        hd = self.hidden_dim
        net = list(net)
        if self.n_gru_layers == 3:
            net[2] = SelectiveConvGRU(hd, dtype=self.dtype, name="gru16")(
                att[2], net[2], inp[2], pool2x(net[1]))
        if self.n_gru_layers >= 2:
            extra = [pool2x(net[0])]
            if self.n_gru_layers > 2:
                extra.append(interp_to(net[2], net[1]))
            net[1] = SelectiveConvGRU(hd, dtype=self.dtype, name="gru08")(
                att[1], net[1], inp[1], *extra)
        motion = BasicMotionEncoderFS(self.motion_fuse_kernel,
                                      dtype=self.dtype, name="encoder")(disp, corr)
        motion = jnp.concatenate([inp[0], motion], axis=-1)
        extra = [interp_to(net[1], net[0])] if self.n_gru_layers > 1 else []
        net[0] = SelectiveConvGRU(hd, dtype=self.dtype, name="gru04")(
            att[0], net[0], motion, *extra)
        delta = FSDispHead(hd, dtype=self.dtype, name="disp_head")(net[0])
        mask = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                               name="mask0")(net[0]))
        mask = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                               name="mask1")(mask))
        return net, 0.25 * mask, delta


class ContextNetDino(nn.Module):
    """Context encoder fusing image features with the frozen ViT features
    (reference extractor.py:196-280, norm_fn='batch', downsample=2)."""

    hidden_dims: Sequence[int] = (128, 128, 128)
    vit_feat_dim: int = 32
    n_outputs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, vit_feat, *, train: bool = False):
        x = ConvBlock(64, 7, strides=1, use_bias=True, norm="batch", act=nn.relu,
                      dtype=self.dtype, name="conv1")(x, train=train)
        for i, (f, s) in enumerate([(64, 1), (96, 2), (128, 2)]):
            for j in range(2):
                x = ResidualBlockCtx(f, strides=s if j == 0 else 1, norm="batch",
                                     dtype=self.dtype,
                                     name=f"layer{i + 1}_{j}")(x, train=train)
        x = jnp.concatenate([x, vit_feat], axis=-1)
        x = ConvBlock(128, 3, norm="batch", act=nn.leaky_relu,
                      dtype=self.dtype, name="conv2")(x, train=train)

        outs04, outs08, outs16 = [], [], []
        for oi in range(self.n_outputs):
            y = ResidualBlockCtx(128, norm="batch", dtype=self.dtype,
                                 name=f"out04_{oi}_res")(x, train=train)
            outs04.append(nn.Conv(self.hidden_dims[0], (3, 3), padding="SAME",
                                  dtype=self.dtype, name=f"out04_{oi}_conv")(y))
        y8 = x
        for j in range(2):
            y8 = ResidualBlockCtx(128, strides=2 if j == 0 else 1, norm="batch",
                                  dtype=self.dtype,
                                  name=f"layer4_{j}")(y8, train=train)
        for oi in range(self.n_outputs):
            y = ResidualBlockCtx(128, norm="batch", dtype=self.dtype,
                                 name=f"out08_{oi}_res")(y8, train=train)
            outs08.append(nn.Conv(self.hidden_dims[1], (3, 3), padding="SAME",
                                  dtype=self.dtype, name=f"out08_{oi}_conv")(y))
        y16 = y8
        for j in range(2):
            y16 = ResidualBlockCtx(128, strides=2 if j == 0 else 1, norm="batch",
                                   dtype=self.dtype,
                                   name=f"layer5_{j}")(y16, train=train)
        for oi in range(self.n_outputs):
            outs16.append(nn.Conv(self.hidden_dims[2], (3, 3), padding="SAME",
                                  dtype=self.dtype, name=f"out16_{oi}_conv")(y16))
        return [outs04, outs08, outs16]
