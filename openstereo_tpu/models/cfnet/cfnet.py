"""CFNet — cascaded-and-fused cost volumes with uncertainty-driven ranges.

TPU-native re-design of the reference CFNet
(reference: stereo/modeling/models/cfnet/{cfnet.py,submodule.py}):

- pyramid feature extractor (1/2..1/32) with PSP pooling and a top-down
  decoder; per-scale gwc + concat descriptor heads; Mish activations;
- fused low-res stage: gwc(40)+concat volumes at 1/8, 1/16, 1/32 combined by
  `hourglassup` (multi-scale injected hourglass) + a second hourglass →
  initial disparity at 1/8;
- **uncertainty → dynamic range**: the variance of the disparity posterior
  sets a per-pixel search window (learned γ/β, cfnet.py:531-541), which is
  re-sampled at 1/4 then 1/2 with warped sparse volumes
  (integer disparity samples, gather + zero padding) and confidence
  hourglasses, each soft-argmaxing against its sample grid;
- 9 supervision heads, weights [.25,.35,.5,.5,.7,1,1,1.4,2]
  (reference cfnet.py:671-683).
"""

from __future__ import annotations

from typing import Callable, Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import (
    build_concat_volume,
    build_gwc_volume,
    disparity_regression,
    resize_linear_align_corners,
    sample_along_w,
)
from ...registry import MODELS
from ...parallel.sharding import shard_disparity
from ..layers import ConvBlock, DeconvBlock, head_dtype, pin_impl3d, siamese
from ..losses import disp_valid_mask, masked_smooth_l1


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class MishResBlock(nn.Module):
    """conv-bn-MISH + conv-bn with additive skip — CFNet's BasicBlock uses
    Mish, not the PSMNet ReLU (reference cfnet/submodule.py:263-288)."""

    features: int
    strides: int = 1
    act: Callable = mish
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = ConvBlock(self.features, 3, strides=self.strides, norm="batch",
                      act=self.act, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvBlock(self.features, 3, norm="batch", dtype=self.dtype,
                      name="conv2")(y, train=train)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvBlock(self.features, 1, strides=self.strides,
                          norm="batch", dtype=self.dtype,
                          name="downsample")(x, train=train)
        return y + x


class CFFeatures(nn.Module):
    """Pyramid encoder + PSP + decoder → per-scale gwc/concat descriptors
    (reference cfnet.py:7-168)."""

    concat_channels: int = 12
    act: Callable = mish
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        cb = lambda f, k, s, name: ConvBlock(  # noqa: E731
            f, k, strides=s, norm="batch", act=self.act, dtype=self.dtype, name=name)
        y = cb(32, 3, 2, "firstconv0")(x, train=train)
        y = cb(32, 3, 1, "firstconv1")(y, train=train)
        y = cb(32, 3, 1, "firstconv2")(y, train=train)
        l2 = MishResBlock(64, act=self.act, dtype=self.dtype, name="layer2")(y, train=train)     # 1/2
        l3 = MishResBlock(128, strides=2, act=self.act, dtype=self.dtype, name="layer3")(l2, train=train)
        l4 = MishResBlock(192, strides=2, act=self.act, dtype=self.dtype, name="layer4")(l3, train=train)
        l5 = MishResBlock(256, strides=2, act=self.act, dtype=self.dtype, name="layer5")(l4, train=train)
        l6 = MishResBlock(512, strides=2, act=self.act, dtype=self.dtype, name="layer6")(l5, train=train)

        # PSP pooling, sum fusion (reference submodule.py:9-96, icnet mode)
        h6, w6 = l6.shape[1], l6.shape[2]
        pp = l6
        import numpy as np

        for i, pool_size in enumerate(np.linspace(2, min(h6, w6), 4, dtype=int)[::-1]):
            kh, kw = max(h6 // int(pool_size), 1), max(w6 // int(pool_size), 1)
            p = nn.avg_pool(l6, (kh, kw), strides=(kh, kw))
            p = cb(512, 1, 1, f"psp{i}")(p, train=train)
            p = jax.image.resize(p, l6.shape, method="bilinear")
            pp = pp + 0.25 * p
        l6 = self.act(pp / 2.0)  # reference submodule.py:60-63 (sum fusion)

        def up2(v, f, name):
            v = jax.image.resize(v, (v.shape[0], v.shape[1] * 2, v.shape[2] * 2, v.shape[3]),
                                 method="nearest")
            return cb(f, 3, 1, name)(v, train=train)

        d5 = cb(256, 3, 1, "iconv5")(jnp.concatenate([l5, up2(l6, 256, "upconv6")], -1), train=train)
        d4 = cb(192, 3, 1, "iconv4")(jnp.concatenate([l4, up2(d5, 192, "upconv5")], -1), train=train)
        d3 = cb(128, 3, 1, "iconv3")(jnp.concatenate([l3, up2(d4, 128, "upconv4")], -1), train=train)
        d2 = cb(64, 3, 1, "iconv2")(jnp.concatenate([l2, up2(d3, 64, "upconv3")], -1), train=train)

        def head(v, mid, out, name):
            v = cb(mid, 3, 1, f"{name}a")(v, train=train)
            return nn.Conv(out, (1, 1), use_bias=False, dtype=self.dtype,
                           name=f"{name}b")(v)

        cc = self.concat_channels
        return {
            "gw2": head(d2, 80, 80, "gw2"), "gw3": head(d3, 160, 160, "gw3"),
            "gw4": head(d4, 160, 160, "gw4"), "gw5": head(d5, 320, 320, "gw5"),
            "gw6": head(l6, 320, 320, "gw6"),
            "concat_feature2": head(d2, 32, cc // 2, "cat2"),
            "concat_feature3": head(d3, 128, cc, "cat3"),
            "concat_feature4": head(d4, 128, cc, "cat4"),
            "concat_feature5": head(d5, 128, cc, "cat5"),
            "concat_feature6": head(l6, 128, cc, "cat6"),
        }


class HourglassUp(nn.Module):
    """Hourglass with mid-scale volume injection (reference cfnet.py:170-220)."""

    features: int
    act: Callable = mish
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, feat4, feat5, *, train: bool = False):
        c = self.features
        cb3 = lambda f, k, s, name, **kw: ConvBlock(  # noqa: E731
            f, k, strides=s, norm="batch", act=self.act, ndim=3, dtype=self.dtype,
            name=name, **kw)
        # torch-symmetric p=1 (XLA SAME pads (0,1) for stride 2 — half-pixel
        # shift vs the reference; see layers.ConvBlock)
        conv1 = nn.Conv(c * 2, (3, 3, 3), strides=(2, 2, 2),
                        padding=[(1, 1)] * 3,
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
        conv1 = cb3(c * 2, 3, 1, "combine1")(jnp.concatenate([conv1, feat4], -1), train=train)
        conv2 = cb3(c * 2, 3, 1, "conv2")(conv1, train=train)
        conv3 = nn.Conv(c * 4, (3, 3, 3), strides=(2, 2, 2),
                        padding=[(1, 1)] * 3,
                        use_bias=False, dtype=self.dtype, name="conv3")(conv2)
        conv3 = cb3(c * 4, 3, 1, "combine2")(jnp.concatenate([conv3, feat5], -1), train=train)
        conv4 = cb3(c * 4, 3, 1, "conv4")(conv3, train=train)

        up8 = DeconvBlock(c * 2, 3, 2, norm="batch", ndim=3, dtype=self.dtype,
                          name="conv8")(conv4, train=train)
        redir2 = ConvBlock(c * 2, 1, norm="batch", ndim=3, dtype=self.dtype,
                           name="redir2")(conv2, train=train)
        conv8 = self.act(up8 + redir2)
        up9 = DeconvBlock(c, 3, 2, norm="batch", ndim=3, dtype=self.dtype,
                          name="conv9")(conv8, train=train)
        redir1 = ConvBlock(c, 1, norm="batch", ndim=3, dtype=self.dtype,
                           name="redir1")(x, train=train)
        return self.act(up9 + redir1)


class MishHourglass(nn.Module):
    """Redir hourglass with Mish (reference cfnet.py:222-263)."""

    features: int
    act: Callable = mish
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.features
        cb3 = lambda f, s, name: ConvBlock(  # noqa: E731
            f, 3, strides=s, norm="batch", act=self.act, ndim=3, dtype=self.dtype, name=name)
        conv2 = cb3(c * 2, 1, "conv2")(cb3(c * 2, 2, "conv1")(x, train=train), train=train)
        conv4 = cb3(c * 4, 1, "conv4")(cb3(c * 4, 2, "conv3")(conv2, train=train), train=train)
        up5 = DeconvBlock(c * 2, 3, 2, norm="batch", ndim=3, dtype=self.dtype,
                          name="conv5")(conv4, train=train)
        redir2 = ConvBlock(c * 2, 1, norm="batch", ndim=3, dtype=self.dtype,
                           name="redir2")(conv2, train=train)
        conv5 = self.act(up5 + redir2)
        up6 = DeconvBlock(c, 3, 2, norm="batch", ndim=3, dtype=self.dtype,
                          name="conv6")(conv5, train=train)
        redir1 = ConvBlock(c, 1, norm="batch", ndim=3, dtype=self.dtype,
                           name="redir1")(x, train=train)
        return self.act(up6 + redir1)


def warped_volumes(gw_l, gw_r, cat_l, cat_r, samples, num_groups):
    """Sparse-sample gwc + concat volumes + sample plane, NDHWC
    (reference cfnet.py:464-486 + SpatialTransformer)."""
    b, h, w, _ = gw_l.shape
    d = samples.shape[1]
    pos = jnp.arange(w, dtype=samples.dtype)[None, None, None, :] - samples
    gw_r_w = sample_along_w(gw_r, pos)
    cat_r_w = sample_along_w(cat_r, pos)
    gw_l_e = jnp.broadcast_to(gw_l[:, None], (b, d, h, w, gw_l.shape[-1]))
    cat_l_e = jnp.broadcast_to(cat_l[:, None], (b, d, h, w, cat_l.shape[-1]))
    c = gw_l.shape[-1]
    gwc = jnp.mean((gw_l_e * gw_r_w).reshape(b, d, h, w, num_groups, c // num_groups), -1)
    return jnp.concatenate([gwc, cat_l_e, cat_r_w, samples[..., None]], axis=-1)


@MODELS.register
class CFNet(nn.Module):
    """forward(data) → {'disp_pred', 'disp_preds' (train: 9 heads)}."""

    max_disp: int = 192
    num_groups: int = 40
    concat_channels: int = 12
    sample_count_s3: int = 14
    sample_count_s2: int = 10
    # REPLACE_MISH: true — the reference's part-1 recipe swaps every Mish
    # for ReLU before training (cfnet.py:687-692); part 2 restores Mish
    replace_mish: bool = False
    dtype: Any = jnp.float32
    head_weights: Sequence[float] = (0.25, 0.35, 0.5, 0.5, 0.7, 1.0, 1.0, 1.4, 2.0)

    @nn.compact
    @pin_impl3d("native", "native")
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        left = data["left"]
        act = jax.nn.relu if self.replace_mish else mish
        b, h, w = left.shape[0], left.shape[1], left.shape[2]
        feats = CFFeatures(self.concat_channels, act=act, dtype=self.dtype,
                           name="features")
        if train:
            fl = feats(left, train=True)
            fr = feats(data["right"], train=True)
        else:
            fl, fr = siamese(lambda x: feats(x, train=False),
                             left, data["right"])

        md = self.max_disp
        # disparity-dim TP: split each scale's D over the mesh 'model' axis
        # (no-op off-mesh; see parallel/sharding.py)
        vol4 = shard_disparity(jnp.concatenate([
            build_gwc_volume(fl["gw4"], fr["gw4"], md // 8, self.num_groups),
            build_concat_volume(fl["concat_feature4"], fr["concat_feature4"], md // 8)], -1))
        vol5 = shard_disparity(jnp.concatenate([
            build_gwc_volume(fl["gw5"], fr["gw5"], md // 16, self.num_groups),
            build_concat_volume(fl["concat_feature5"], fr["concat_feature5"], md // 16)], -1))
        vol6 = shard_disparity(jnp.concatenate([
            build_gwc_volume(fl["gw6"], fr["gw6"], md // 32, self.num_groups),
            build_concat_volume(fl["concat_feature6"], fr["concat_feature6"], md // 32)], -1))

        cb3 = lambda f, name: ConvBlock(f, 3, norm="batch", act=act, ndim=3,  # noqa: E731
                                        dtype=self.dtype, name=name)

        def dres(v, f, name):
            v = cb3(f, f"{name}_0a")(v, train=train)
            v = cb3(f, f"{name}_0b")(v, train=train)
            r = cb3(f, f"{name}_1a")(v, train=train)
            r = ConvBlock(f, 3, norm="batch", ndim=3, dtype=self.dtype,
                          name=f"{name}_1b")(r, train=train)
            return r + v

        cost0_4 = dres(vol4, 32, "dres4")
        cost0_5 = dres(vol5, 64, "dres5")
        cost0_6 = dres(vol6, 64, "dres6")
        out1_4 = HourglassUp(32, act=act, dtype=self.dtype, name="combine1")(
            cost0_4, cost0_5, cost0_6, train=train)
        out2_4 = MishHourglass(32, act=act, dtype=self.dtype, name="dres3")(out1_4, train=train)

        def classify(v, f, name):
            v = cb3(f, f"{name}a")(v, train=train)
            return ConvBlock(1, 3, ndim=3, dtype=self.dtype, name=f"{name}b")(v, train=train)

        cost2_s4 = classify(out2_4, 32, "classif2")[..., 0].astype(head_dtype(self.dtype))
        prob_s4 = nn.softmax(cost2_s4, axis=1)
        pred2_s4 = disparity_regression(prob_s4, md // 8, axis=1)  # [B,H/8,W/8]
        pred2_cur = jax.lax.stop_gradient(pred2_s4)
        dv = jnp.arange(md // 8, dtype=jnp.float32).reshape(1, -1, 1, 1)
        var_s4 = jnp.sqrt(jnp.sum(prob_s4 * (dv - pred2_cur[:, None]) ** 2, axis=1))

        gamma_s3 = self.param("gamma_s3", nn.initializers.zeros, ())
        beta_s3 = self.param("beta_s3", nn.initializers.zeros, ())
        gamma_s2 = self.param("gamma_s2", nn.initializers.zeros, ())
        beta_s2 = self.param("beta_s2", nn.initializers.zeros, ())

        def range_and_samples(pred_cur, var, gamma, beta, out_hw, scale_pow,
                              sample_count):
            lo = pred_cur - (gamma + 1) * var - beta
            hi = pred_cur + (gamma + 1) * var + beta
            lo = resize_linear_align_corners((lo * 2)[..., None], out_hw, (1, 2))[..., 0]
            hi = resize_linear_align_corners((hi * 2)[..., None], out_hw, (1, 2))[..., 0]
            # clamp/widen (reference generate_search_range, cfnet.py:425-442)
            limit = self.max_disp // (2 ** scale_pow) - 1
            n = sample_count + 1
            lo1 = jnp.clip(lo - jnp.clip(n - hi + lo, 0.0) / 2.0, 0.0, limit)
            hi1 = jnp.clip(hi + jnp.clip(n - hi + lo, 0.0) / 2.0, 0.0, limit)
            # uniform interior samples + floor(min), ceil(max), rounded to ints
            mult = (hi1 - lo1) / (sample_count + 1)
            ks = jnp.arange(1.0, sample_count + 1).reshape(1, -1, 1, 1)
            mid = jnp.floor(lo1[:, None] + mult[:, None] * ks)
            samples = jnp.concatenate(
                [jnp.floor(lo1)[:, None], mid, jnp.ceil(hi1)[:, None]], axis=1)
            return samples  # [B, sample_count+2, h, w]

        # ---- stage s3 (1/4)
        s3_hw = (h // 4, w // 4)
        samples_s3 = range_and_samples(pred2_cur, var_s4, gamma_s3, beta_s3,
                                       s3_hw, 2, self.sample_count_s3)
        vol_s3 = warped_volumes(fl["gw3"], fr["gw3"], fl["concat_feature3"],
                                fr["concat_feature3"], samples_s3, self.num_groups)
        cost0_s3 = dres(vol_s3, 32, "conf_s3")
        out1_s3 = MishHourglass(32, act=act, dtype=self.dtype, name="conf2_s3")(cost0_s3, train=train)
        out2_s3 = MishHourglass(32, act=act, dtype=self.dtype, name="conf3_s3")(out1_s3, train=train)
        cost1_s3 = classify(out2_s3, 32, "conf_classif1_s3")[..., 0].astype(head_dtype(self.dtype))
        prob1_s3 = nn.softmax(cost1_s3, axis=1)
        pred1_s3 = jnp.sum(prob1_s3 * samples_s3, axis=1)
        pred1_cur = jax.lax.stop_gradient(pred1_s3)
        var_s3 = jnp.sqrt(jnp.sum(prob1_s3 * (pred1_cur[:, None] - samples_s3) ** 2, axis=1))

        # ---- stage s2 (1/2)
        s2_hw = (h // 2, w // 2)
        samples_s2 = range_and_samples(pred1_cur, var_s3, gamma_s2, beta_s2,
                                       s2_hw, 1, self.sample_count_s2)
        vol_s2 = warped_volumes(fl["gw2"], fr["gw2"], fl["concat_feature2"],
                                fr["concat_feature2"], samples_s2, self.num_groups // 2)
        cost0_s2 = dres(vol_s2, 16, "conf_s2")
        out1_s2 = MishHourglass(16, act=act, dtype=self.dtype, name="conf2_s2")(cost0_s2, train=train)
        out2_s2 = MishHourglass(16, act=act, dtype=self.dtype, name="conf3_s2")(out1_s2, train=train)
        cost1_s2 = classify(out2_s2, 16, "conf_classif1_s2")[..., 0].astype(head_dtype(self.dtype))
        prob1_s2 = nn.softmax(cost1_s2, axis=1)
        pred1_s2 = jnp.sum(prob1_s2 * samples_s2, axis=1)

        up_full = lambda p, s: resize_linear_align_corners(  # noqa: E731
            (p * s)[..., None], (h, w), (1, 2))[..., 0]

        disp_pred = up_full(pred1_s2, 2.0)
        out = {"disp_pred": disp_pred}
        if not train:
            return out

        # training-only heads (reference cfnet.py:608-655)
        def regress_full(cost, name):
            c = classify(cost, 32, name)[..., 0].astype(head_dtype(self.dtype))
            c = resize_linear_align_corners(c, (md, h, w), (1, 2, 3))
            return disparity_regression(nn.softmax(c, axis=1), md, axis=1)

        def sample_head(vol, samples, scale, f, name):
            c = classify(vol, f, name)[..., 0].astype(head_dtype(self.dtype))
            p = jnp.sum(nn.softmax(c, axis=1) * samples, axis=1)
            return up_full(p, scale)

        out["disp_preds"] = [
            regress_full(cost0_4, "classif0"),
            regress_full(out1_4, "classif1"),
            up_full(pred2_s4, 8.0),
            sample_head(cost0_s3, samples_s3, 4.0, 32, "conf_classif0_s3"),
            sample_head(out1_s3, samples_s3, 4.0, 32, "conf_classifmid_s3"),
            up_full(pred1_s3, 4.0),
            sample_head(cost0_s2, samples_s2, 2.0, 16, "conf_classif0_s2"),
            sample_head(out1_s2, samples_s2, 2.0, 16, "conf_classifmid_s2"),
            disp_pred,
        ]
        return out

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        loss = 0.0
        for p, wgt in zip(pred["disp_preds"], self.head_weights):
            loss = loss + wgt * masked_smooth_l1(p, gt, mask)
        return loss, {"loss_disp": loss}
