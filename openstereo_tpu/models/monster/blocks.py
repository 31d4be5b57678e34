"""MonSter building blocks (flax, NHWC).

Reference: stereo/modeling/models/monster/{monster.py,update.py,
refinement.py,submodule.py}. MonSter fuses a frozen DepthAnythingV2
monocular-depth branch with an IGEV-style stereo branch and mutually
refines both disparity estimates in the final GRU iterations.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import disp_warp
from ..igev.blocks import BasicConvBN, BasicConvIN, FeatureAtt
from ..igev.update import ConvGRU, DispHead, interp_to, pool2x
from ..layers import ConvBlock, DeconvBlock, leaky_relu


class FeatTransfer(nn.Module):
    """Mono feature pyramid → stereo feature pyramid (48/64/192/160 ch)
    with top-down deconv fusion (reference monster.py:150-215)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        f4, f8, f16, f32 = feats
        cin = lambda f, k, name: ConvBlock(  # noqa: E731
            f, k, norm="instance", act=nn.relu, use_bias=True,
            dtype=self.dtype, name=name)
        y32 = cin(160, 3, "conv32x")(f32, train=train)
        up32 = DeconvBlock(192, 3, 2, dtype=self.dtype, name="up32")(y32, train=train)
        y16 = cin(192, 5, "conv16x")(jnp.concatenate([f16, up32], -1), train=train) \
            + nn.Conv(192, (1, 1), dtype=self.dtype, name="res16x")(f16)
        up16 = DeconvBlock(64, 3, 2, dtype=self.dtype, name="up16")(y16, train=train)
        y8 = cin(64, 5, "conv8x")(jnp.concatenate([f8, up16], -1), train=train) \
            + nn.Conv(64, (1, 1), dtype=self.dtype, name="res8x")(f8)
        up8 = DeconvBlock(48, 3, 2, dtype=self.dtype, name="up8")(y8, train=train)
        y4 = cin(48, 5, "conv4x")(jnp.concatenate([f4, up8], -1), train=train) \
            + nn.Conv(48, (1, 1), dtype=self.dtype, name="res4x")(f4)
        return [y4, y8, y16, y32]


class FeatTransferCnet(nn.Module):
    """Mono features ⊕ stems → (hidden, context) pairs at 1/4, 1/8, 1/16
    (reference monster.py:130-147: one conv per scale, hidden == context)."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mono_feats, stems):
        f4, f8, f16, _ = mono_feats
        s16, s8, s4 = stems
        c16 = nn.Conv(self.hidden_dim, (3, 3), padding="SAME", dtype=self.dtype,
                      name="res_16x")(jnp.concatenate([f16, s16], -1))
        c8 = nn.Conv(self.hidden_dim, (3, 3), padding="SAME", dtype=self.dtype,
                     name="res_8x")(jnp.concatenate([f8, s8], -1))
        c4 = nn.Conv(self.hidden_dim, (3, 3), padding="SAME", dtype=self.dtype,
                     name="res_4x")(jnp.concatenate([f4, s4], -1))
        return [(c4, c4), (c8, c8), (c16, c16)]


class MonsterHourglass(nn.Module):
    """3D hourglass, paired convs per level, 8-channel un-normed output
    (reference monster.py:62-129)."""

    features: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, features, *, train: bool = False):
        c = self.features
        # reference submodule BasicConv: bias-free conv + BN +
        # nn.LeakyReLU() (default slope 0.01, NOT 0.2)
        bc = lambda f, s, name: ConvBlock(  # noqa: E731
            f, 3, strides=s, norm="batch", act=leaky_relu(), ndim=3,
            dtype=self.dtype, name=name)
        conv1 = bc(c * 2, 2, "conv1a")(x, train=train)
        conv1 = bc(c * 2, 1, "conv1b")(conv1, train=train)
        conv1 = FeatureAtt(c * 2, dtype=self.dtype, name="att8")(
            conv1, features[1], train=train)
        conv2 = bc(c * 4, 2, "conv2a")(conv1, train=train)
        conv2 = bc(c * 4, 1, "conv2b")(conv2, train=train)
        conv2 = FeatureAtt(c * 4, dtype=self.dtype, name="att16")(
            conv2, features[2], train=train)
        conv3 = bc(c * 6, 2, "conv3a")(conv2, train=train)
        conv3 = bc(c * 6, 1, "conv3b")(conv3, train=train)
        conv3 = FeatureAtt(c * 6, dtype=self.dtype, name="att32")(
            conv3, features[3], train=train)

        y = DeconvBlock(c * 4, 4, 2, norm="batch", act=leaky_relu(),
                        ndim=3, dtype=self.dtype,
                        name="conv3_up")(conv3, train=train)
        y = jnp.concatenate([y, conv2], axis=-1)
        y = ConvBlock(c * 4, 1, norm="batch", act=leaky_relu(),
                      ndim=3, dtype=self.dtype, name="agg0a")(y, train=train)
        y = bc(c * 4, 1, "agg0b")(y, train=train)
        y = bc(c * 4, 1, "agg0c")(y, train=train)
        y = FeatureAtt(c * 4, dtype=self.dtype, name="att_up16")(
            y, features[2], train=train)

        y = DeconvBlock(c * 2, 4, 2, norm="batch", act=leaky_relu(),
                        ndim=3, dtype=self.dtype,
                        name="conv2_up")(y, train=train)
        y = jnp.concatenate([y, conv1], axis=-1)
        y = ConvBlock(c * 2, 1, norm="batch", act=leaky_relu(),
                      ndim=3, dtype=self.dtype, name="agg1a")(y, train=train)
        y = bc(c * 2, 1, "agg1b")(y, train=train)
        y = bc(c * 2, 1, "agg1c")(y, train=train)
        y = FeatureAtt(c * 2, dtype=self.dtype, name="att_up8")(
            y, features[1], train=train)

        # final deconv: no norm, no act, no bias (monster.py:88-89)
        return DeconvBlock(8, 4, 2, ndim=3, dtype=self.dtype,
                           name="conv1_up")(y, train=train)


class MixMotionEncoder(nn.Module):
    """Dual-branch motion encoder (reference update.py:523-566)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, corr, flaw, disp_o, corr_o, flaw_o):
        conv = lambda f, k, name: nn.Conv(f, (k, k), padding="SAME",  # noqa: E731
                                          dtype=self.dtype, name=name)
        cor = nn.relu(conv(64, 1, "convc1")(jnp.concatenate([corr, flaw], -1)))
        cor = nn.relu(conv(64, 3, "convc2")(cor))
        cor_o = nn.relu(conv(64, 1, "convc1_mono")(
            jnp.concatenate([corr_o, flaw_o], -1)))
        cor_o = nn.relu(conv(64, 3, "convc2_mono")(cor_o))
        d = nn.relu(conv(64, 7, "convd1")(disp))
        d = nn.relu(conv(64, 3, "convd2")(d))
        d_o = nn.relu(conv(64, 7, "convd1_mono")(disp_o))
        d_o = nn.relu(conv(64, 3, "convd2_mono")(d_o))
        out = nn.relu(conv(63, 3, "conv")(jnp.concatenate([cor, d], -1)))
        out_o = nn.relu(conv(63, 3, "conv_mono")(jnp.concatenate([cor_o, d_o], -1)))
        return jnp.concatenate([out, disp, out_o, disp_o], axis=-1)  # 128


class MixUpdateBlock(nn.Module):
    """3-scale GRU with the dual-branch encoder (reference update.py:484-521)."""

    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, flaw, disp, corr, flaw_o, disp_o, corr_o):
        net = list(net)
        net[2] = ConvGRU(self.hidden_dims[0], dtype=self.dtype, name="gru16")(
            net[2], inp[2], pool2x(net[1]))
        extra = [pool2x(net[0])]
        if self.n_gru_layers > 2:
            extra.append(interp_to(net[2], net[1]))
        net[1] = ConvGRU(self.hidden_dims[1], dtype=self.dtype, name="gru08")(
            net[1], inp[1], *extra)
        motion = MixMotionEncoder(dtype=self.dtype, name="encoder")(
            disp, corr, flaw, disp_o, corr_o, flaw_o)
        net[0] = ConvGRU(self.hidden_dims[2], dtype=self.dtype, name="gru04")(
            net[0], inp[0], motion, interp_to(net[1], net[0]))
        delta = DispHead(256, dtype=self.dtype, name="disp_head")(net[0])
        mask_feat = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                                    name="mask_feat_4")(net[0]))
        return net, mask_feat, delta


class Conv2xNow(nn.Module):
    """Down/up 2× + concat-merge (reference refinement.py:16-53)."""

    features: int
    deconv: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rem, *, train: bool = False):
        # BasicConv_now (refinement.py:55-81): bias-free conv + BN + PLAIN
        # ReLU (F.relu, not leaky)
        k = 4 if self.deconv else 3
        Block = DeconvBlock if self.deconv else ConvBlock
        x = Block(self.features, k, 2, norm="batch", act=nn.relu,
                  dtype=self.dtype, name="conv1")(x, train=train)
        x = jnp.concatenate([x, rem], axis=-1)
        return ConvBlock(self.features, 3, norm="batch", act=nn.relu,
                         dtype=self.dtype,
                         name="conv2")(x, train=train)


class SimpleUNet(nn.Module):
    """Double-dip UNet over the refinement features
    (reference refinement.py:164-222)."""

    out_features: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bc = lambda f, s, d, name: ConvBlock(  # noqa: E731
            f, 3, strides=s, dilation=d, norm="batch", act=nn.relu,
            dtype=self.dtype, name=name)
        r0 = x
        r1 = bc(48, 2, 1, "conv1a")(r0, train=train)
        r2 = bc(64, 2, 1, "conv2a")(r1, train=train)
        r3 = bc(96, 2, 2, "conv3a")(r2, train=train)
        r4 = bc(128, 2, 2, "conv4a")(r3, train=train)

        x = Conv2xNow(96, deconv=True, dtype=self.dtype, name="deconv4a")(r4, r3, train=train)
        r3 = x
        x = Conv2xNow(64, deconv=True, dtype=self.dtype, name="deconv3a")(x, r2, train=train)
        r2 = x
        x = Conv2xNow(48, deconv=True, dtype=self.dtype, name="deconv2a")(x, r1, train=train)
        r1 = x
        x = Conv2xNow(32, deconv=True, dtype=self.dtype, name="deconv1a")(x, r0, train=train)
        r0 = x

        x = Conv2xNow(48, dtype=self.dtype, name="conv1b")(x, r1, train=train)
        r1 = x
        x = Conv2xNow(64, dtype=self.dtype, name="conv2b")(x, r2, train=train)
        r2 = x
        x = Conv2xNow(96, dtype=self.dtype, name="conv3b")(x, r3, train=train)
        r3 = x
        x = Conv2xNow(128, dtype=self.dtype, name="conv4b")(x, r4, train=train)

        x = Conv2xNow(96, deconv=True, dtype=self.dtype, name="deconv4b")(x, r3, train=train)
        x = Conv2xNow(64, deconv=True, dtype=self.dtype, name="deconv3b")(x, r2, train=train)
        x = Conv2xNow(48, deconv=True, dtype=self.dtype, name="deconv2b")(x, r1, train=train)
        return Conv2xNow(self.out_features, deconv=True, dtype=self.dtype,
                         name="deconv1b")(x, r0, train=train)


class REMP(nn.Module):
    """Full-resolution mutual refinement: warp-error features from both
    disparities → UNet → global/local gating → residual
    (reference refinement.py:363-431)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp_mono, disp_stereo, left, right, *, train: bool = False):
        cbn = lambda f, name, **kw: ConvBlock(  # noqa: E731
            f, 3, norm="batch", act=leaky_relu(0.2), use_bias=False,
            dtype=self.dtype, name=name, **kw)
        warped_m, _ = disp_warp(right, disp_mono[..., 0], padding="border", torch_unaligned=True)
        flaw_m = warped_m - left
        warped_s, _ = disp_warp(right, disp_stereo[..., 0], padding="border", torch_unaligned=True)
        flaw_s = warped_s - left

        fm = cbn(16, "conv1_mono")(jnp.concatenate([flaw_m, left], -1), train=train)
        fs = cbn(16, "conv1_stereo")(jnp.concatenate([flaw_s, left], -1), train=train)
        dm = cbn(16, "conv2_mono")(disp_mono, train=train)
        ds = cbn(16, "conv2_stereo")(disp_stereo, train=train)
        x = jnp.concatenate([fm, dm, fs, ds], axis=-1)
        x = ConvBlock(32, 3, dilation=2, norm="batch", act=nn.relu,
                      dtype=self.dtype,
                      name="conv_start")(x, train=train)
        x = SimpleUNet(32, dtype=self.dtype, name="unet")(x, train=train)

        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        low = nn.Conv(64, (1, 1), dtype=self.dtype, name="lfe1")(gap)
        low = nn.Conv(32, (1, 1), dtype=self.dtype, name="lfe2")(nn.relu(low))
        low = nn.sigmoid(low)
        motif = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="lmc1")(x)
        motif = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="lmc2")(motif)
        motif = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype,
                        name="lmc3")(nn.relu(motif))
        motif = nn.sigmoid(motif)
        x = (1 - motif) * low + motif * x
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="final_conv")(x)
        return nn.leaky_relu(disp_stereo + x, 0.01)


def compute_scale_shift(mono, disp):
    """Masked least-squares alignment of mono depth to stereo disparity,
    per batch element (reference monster.py:24-59): mask = stereo>0 ∧
    mono>1e-2 ∧ mono above its 20th percentile; solve [scale, shift] in
    closed form from masked moments. Fully vectorised (vmap over batch).
    """

    def one(m, d):
        # reference takes the sorted value AT index int(0.2*N) (monster.py
        # :38-41) — not an interpolated percentile
        flat = jnp.sort(m.reshape(-1))
        thresh = flat[int(0.2 * flat.size)]
        mask = (d > 0) & (m > 1e-2) & (m > thresh)
        w = mask.astype(m.dtype)
        n = jnp.sum(w)
        sx = jnp.sum(w * m)
        sxx = jnp.sum(w * m * m)
        sy = jnp.sum(w * d)
        sxy = jnp.sum(w * m * d)
        # [[sxx, sx], [sx, n]] [scale, shift]ᵀ = [sxy, sy]ᵀ (+1e-6 ridge)
        a11, a12, a22 = sxx + 1e-6, sx, n + 1e-6
        det = a11 * a22 - a12 * a12
        scale = (a22 * sxy - a12 * sy) / det
        shift = (a11 * sy - a12 * sxy) / det
        return scale, shift

    return jax.vmap(one)(mono, disp)
