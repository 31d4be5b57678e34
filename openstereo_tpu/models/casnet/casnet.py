"""CasStereo (CasPSMNet / CasGwcNet) — cascaded dynamic-range cost volumes.

TPU-native re-design of the reference cascade stereo models
(reference: stereo/modeling/models/casnet/{cas_psm.py,cas_gwc.py,submodule.py}):

- stage 1 samples the full disparity range coarsely; later stages re-sample a
  narrow range around the (detached) previous prediction, optionally widened
  by a neighbourhood max/min search (`USING_NS`, submodule.py:89-137);
- cost volumes are built by *warping* the right features to per-pixel,
  per-sample disparities (`sample_along_w` linear gathers — the reference's
  grid_sample, cas_psm.py:282-318) — concat volumes for CasPSM, gwc+concat
  for CasGwc;
- each stage runs a redir-skip 3D hourglass aggregation with 4 heads; costs
  are trilinearly upsampled (half-pixel) to (FineD, H, W) and soft-argmaxed
  against the *sample grid* rather than a fixed arange;
- loss: per-stage 4-head smooth-L1 with stage weights [0.5, 1.0]
  (reference cas_psm.py:445-459).

All range arithmetic is jnp on static shapes; `lax.stop_gradient` implements
GRAD_METHOD='detach'.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import resize_bilinear, resize_linear_torch, sample_along_w
from ...registry import MODELS
from ...parallel.sharding import shard_disparity
from ..gwcnet.gwcnet import GwcHourglass
from ..layers import ConvBlock, head_dtype, pin_impl3d, siamese
from ..losses import disp_valid_mask, masked_smooth_l1
from ..psmnet.psmnet import ResBlock


def regression_with_samples(prob: jnp.ndarray, samples: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmax against a per-pixel sample grid: [B,D,H,W]·[B,D,H,W] → [B,H,W]."""
    return jnp.sum(prob * samples, axis=1)


def max_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """2D max-pool stride 1, SAME padding over [B,H,W]."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1), "SAME")


def disp_range_samples(cur_disp, ndisp: int, interval: float, shape,
                       max_disp: float, using_ns: bool, ns_size: int) -> jnp.ndarray:
    """Per-pixel disparity sample grid [B, D, H, W]
    (reference submodule.py:89-163)."""
    b, h, w = shape
    steps = jnp.arange(ndisp, dtype=jnp.float32).reshape(1, -1, 1, 1)
    if cur_disp is None:
        lo = jnp.clip(0.0 - ndisp / 2 * interval, 0.0)
        hi = jnp.clip(lo + (ndisp - 1) * interval, a_max=max_disp)
        step = (hi - lo) / (ndisp - 1)
        grid = lo + steps * step
        return jnp.broadcast_to(grid, (b, ndisp, h, w))
    if not using_ns:
        lo = cur_disp - ndisp / 2 * interval
        hi = cur_disp + ndisp / 2 * interval
        step = (hi - lo) / (ndisp - 1)
        return lo[:, None] + steps * step[:, None]
    # neighbourhood search at 1/4 res with ndisp//4 samples, then upsample
    small = resize_linear_torch((cur_disp / 4.0)[..., None],
                                (h // 4, w // 4), axes=(1, 2))[..., 0]
    # reference takes |min-pool| (submodule.py:116-117) — sign-flips any
    # negative neighbourhood minimum; reproduced exactly
    lo = jnp.abs(max_pool_same(-small, ns_size))
    hi = max_pool_same(small, ns_size)
    comp = jnp.clip(ndisp // 4 * interval - (hi - lo), 0.0) / 2.0
    lo = jnp.clip(lo - comp, 0.0, max_disp)
    hi = jnp.clip(hi + comp, 0.0, max_disp)
    nd4 = ndisp // 4
    step = (hi - lo) / (nd4 - 1)
    samples4 = lo[:, None] + jnp.arange(nd4, dtype=jnp.float32).reshape(1, -1, 1, 1) * step[:, None]
    # the search ran on cur_disp/4 at 1/4 resolution — scale the sample
    # values back to full-resolution disparity units when upsampling
    # (reference submodule.py:135-137: interpolate(disp_range_samples * 4.0))
    return resize_linear_torch(samples4 * 4.0, (ndisp, h, w), axes=(1, 2, 3))


def build_warped_concat_volume(x: jnp.ndarray, y: jnp.ndarray,
                               samples: jnp.ndarray,
                               zero_left: bool = False) -> jnp.ndarray:
    """[B,H,W,C] ×2 + samples [B,D,H,W] → [B,D,H,W,2C].

    Left features are repeated along D; warped right features are zero
    outside the frame. The two cascade flavors differ on the left half:
    cas_psm keeps it un-zeroed everywhere (cas_psm.py:310-316 "a littel
    difference, no zeros filling"), cas_gwc zeroes it where the match falls
    out of frame (cas_gwc.py:284-290) — `zero_left` selects.
    """
    d = samples.shape[1]
    xs = jnp.broadcast_to(x[:, None], (x.shape[0], d, *x.shape[1:]))
    mw = jnp.arange(x.shape[2], dtype=samples.dtype)[None, None, None, :]
    if zero_left:
        xs = jnp.where((mw < samples)[..., None], 0.0, xs)
    ys = sample_along_w(y, mw - samples)
    return jnp.concatenate([xs, ys], axis=-1)


def build_warped_gwc_volume(x, y, samples, num_groups: int) -> jnp.ndarray:
    """Warped group-wise correlation (cas_gwc.py:306-317). Left features ARE
    zeroed where the match falls out of frame (mw < disp)."""
    b, h, w, c = x.shape
    d = samples.shape[1]
    mw = jnp.arange(w, dtype=samples.dtype)[None, None, None, :]
    xs = jnp.broadcast_to(x[:, None], (b, d, h, w, c))
    xs = jnp.where((mw < samples)[..., None], 0.0, xs)
    ys = sample_along_w(y, mw - samples)
    prod = (xs * ys).reshape(b, d, h, w, num_groups, c // num_groups)
    return jnp.mean(prod, axis=-1)


class CasCostAggregation(nn.Module):
    """dres + 3 redir hourglasses + 4 heads (reference cas_psm.py:182-279)."""

    base_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, volume, fine_dhw, samples, *, train: bool = False):
        c = self.base_channels
        cost0 = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name="dres0a")(volume, train=train)
        cost0 = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name="dres0b")(cost0, train=train)
        res = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                        name="dres1a")(cost0, train=train)
        res = ConvBlock(c, 3, norm="batch", ndim=3, dtype=self.dtype,
                        name="dres1b")(res, train=train)
        cost0 = res + cost0
        out1 = GwcHourglass(c, dtype=self.dtype, name="dres2")(cost0, train=train)
        out2 = GwcHourglass(c, dtype=self.dtype, name="dres3")(out1, train=train)
        out3 = GwcHourglass(c, dtype=self.dtype, name="dres4")(out2, train=train)

        fd, fh, fw = fine_dhw
        bsz = volume.shape[0]

        def classify(x, name):
            x = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name=f"{name}a")(x, train=train)
            return ConvBlock(1, 3, ndim=3, dtype=self.dtype, name=f"{name}b")(x, train=train)

        def regress(cost):
            cost = cost[..., 0].astype(head_dtype(self.dtype))
            cost = resize_linear_torch(cost, (fd, fh, fw), axes=(1, 2, 3))
            prob = nn.softmax(cost, axis=1)
            return regression_with_samples(prob, samples)

        pred3 = regress(classify(out3, "classif3"))
        if not train:
            return [pred3]
        return [
            regress(classify(cost0, "classif0")),
            regress(classify(out1, "classif1")),
            regress(classify(out2, "classif2")),
            pred3,
        ]


class PSMCascadeFeatures(nn.Module):
    """SPP trunk + FPN heads: stage1 32c@1/4, stage2 16c@1/2[, stage3 8c@1/1]
    (reference cas_psm.py:46-180)."""

    num_stage: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> List[jnp.ndarray]:
        cb = lambda f, k, s, name, **kw: ConvBlock(  # noqa: E731
            f, k, strides=s, norm="batch", act=nn.relu, dtype=self.dtype,
            name=name, **kw)
        s1 = cb(32, 3, 1, "firstconv_a0")(x, train=train)
        s1 = cb(32, 3, 1, "firstconv_a1")(s1, train=train)          # 1/1
        y = cb(32, 3, 2, "firstconv_b")(s1, train=train)            # 1/2
        for i in range(3):
            y = ResBlock(32, dtype=self.dtype, name=f"layer1_{i}")(y, train=train)
        s2 = y                                                       # 1/2
        y = ResBlock(64, strides=2, dtype=self.dtype, name="layer2_0")(y, train=train)
        for i in range(1, 16):
            y = ResBlock(64, dtype=self.dtype, name=f"layer2_{i}")(y, train=train)
        raw = y                                                      # 1/4
        for i in range(3):
            y = ResBlock(128, dtype=self.dtype, name=f"layer3_{i}")(y, train=train)
        for i in range(3):
            y = ResBlock(128, dilation=2, dtype=self.dtype, name=f"layer4_{i}")(y, train=train)
        skip = y

        h4, w4 = skip.shape[1], skip.shape[2]
        branches = []
        for i, pool in enumerate((64, 32, 16, 8)):
            ph, pw = min(pool, h4), min(pool, w4)
            b = nn.avg_pool(skip, (ph, pw), strides=(ph, pw))
            b = cb(32, 1, 1, f"branch{i}")(b, train=train)
            branches.append(resize_bilinear(b, (h4, w4)))
        feat = jnp.concatenate([raw, skip] + branches[::-1], axis=-1)  # 320

        feat = cb(128, 3, 1, "inner0a")(feat, train=train)
        feat = nn.Conv(32, (1, 1), use_bias=True, dtype=self.dtype, name="inner0b")(feat)
        stage1 = nn.Conv(32, (3, 3), padding="SAME", use_bias=False,
                         dtype=self.dtype, name="lastconv")(feat)
        outs = [stage1]

        intra = feat
        skips = [s2, s1][: self.num_stage - 1]
        out_chs = [16, 8]
        for i, (sk, oc) in enumerate(zip(skips, out_chs)):
            intra = jax.image.resize(
                intra, (intra.shape[0], intra.shape[1] * 2, intra.shape[2] * 2, intra.shape[3]),
                method="nearest")
            intra = intra + nn.Conv(32, (1, 1), use_bias=True, dtype=self.dtype,
                                    name=f"inner{i+1}")(sk)
            outs.append(nn.Conv(oc, (3, 3), padding="SAME", use_bias=False,
                                dtype=self.dtype, name=f"out{i+2}")(intra))
        return outs


class GwcCascadeFeatures(nn.Module):
    """nospp trunk: stage1 (320 gwc, 12 cat)@1/4, stage2 (160, 6)@1/2[, stage3 (80, 3)@1/1]
    (reference cas_gwc.py:46-160)."""

    num_stage: int = 2
    concat_channels: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        cb = lambda f, k, s, name: ConvBlock(  # noqa: E731
            f, k, strides=s, norm="batch", act=nn.relu, dtype=self.dtype, name=name)
        s1 = cb(32, 3, 1, "firstconv_a0")(x, train=train)
        s1 = cb(32, 3, 1, "firstconv_a1")(s1, train=train)
        y = cb(32, 3, 2, "firstconv_b")(s1, train=train)
        for i in range(3):
            y = ResBlock(32, dtype=self.dtype, name=f"layer1_{i}")(y, train=train)
        s2 = y
        y = ResBlock(64, strides=2, dtype=self.dtype, name="layer2_0")(y, train=train)
        for i in range(1, 16):
            y = ResBlock(64, dtype=self.dtype, name=f"layer2_{i}")(y, train=train)
        l2 = y
        for i in range(3):
            y = ResBlock(128, dtype=self.dtype, name=f"layer3_{i}")(y, train=train)
        l3 = y
        for i in range(3):
            y = ResBlock(128, dilation=2, dtype=self.dtype, name=f"layer4_{i}")(y, train=train)
        l4 = y

        feat = jnp.concatenate([l2, l3, l4], axis=-1)  # 320 @ 1/4
        cat1 = cb(128, 3, 1, "out1_cat_a")(feat, train=train)
        cat1 = nn.Conv(self.concat_channels, (1, 1), use_bias=False,
                       dtype=self.dtype, name="out1_cat_b")(cat1)
        outs = [(feat, cat1)]

        intra = feat
        skips = [s2, s1][: self.num_stage - 1]
        gwc_chs = [160, 80]
        for i, (sk, gc) in enumerate(zip(skips, gwc_chs)):
            intra = jax.image.resize(
                intra, (intra.shape[0], intra.shape[1] * 2, intra.shape[2] * 2, intra.shape[3]),
                method="nearest")
            intra = intra + nn.Conv(320, (1, 1), use_bias=True, dtype=self.dtype,
                                    name=f"inner{i+1}")(sk)
            g = nn.Conv(gc, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"out{i+2}")(intra)
            c = nn.Conv(self.concat_channels // (2 ** (i + 1)), (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"out{i+2}_cat")(g)
            outs.append((g, c))
        return outs


class _CascadeBase(nn.Module):
    """Shared cascade driver (stage loop, range logic, loss)."""

    max_disp: int = 192
    ndisps: Sequence[int] = (48, 24)
    disp_interval_pixel: Sequence[float] = (4.0, 1.0)
    using_ns: bool = True
    ns_size: int = 3
    grad_method: str = "detach"
    cr_base_chs: Sequence[int] = (32, 32, 16)
    dtype: Any = jnp.float32

    def _run_cascade(self, data, feats_l, feats_r, build_volume, train):
        left = data["left"]
        b, h, w = left.shape[0], left.shape[1], left.shape[2]
        outputs = {}
        pred = None
        for si in range(len(self.ndisps)):
            scale = [4, 2, 1][si]
            cur = None
            if pred is not None:
                cur = jax.lax.stop_gradient(pred) if self.grad_method == "detach" else pred
            samples = disp_range_samples(
                cur, self.ndisps[si], self.disp_interval_pixel[si], (b, h, w),
                float(self.max_disp), self.using_ns, self.ns_size)
            nd_s = self.ndisps[si] // scale
            samples_s = resize_linear_torch(
                samples / scale, (nd_s, h // scale, w // scale), axes=(1, 2, 3))
            volume = shard_disparity(  # D over mesh 'model' (no-op off-mesh)
                build_volume(si, feats_l[si], feats_r[si], samples_s))
            preds = CasCostAggregation(self.cr_base_chs[si], dtype=self.dtype,
                                       name=f"cost_agg{si}")(
                volume, (self.ndisps[si], h, w), samples, train=train)
            pred = preds[-1]
            outputs[f"stage{si+1}"] = preds
        outputs["disp_pred"] = pred
        return outputs

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        head_w = (0.5, 0.5, 0.7, 1.0)
        stage_w = (0.5, 1.0, 2.0)
        loss = 0.0
        for si in range(len(self.ndisps)):
            preds = pred[f"stage{si+1}"]
            sl = sum(hw * masked_smooth_l1(p, gt, mask)
                     for p, hw in zip(preds, head_w))
            loss = loss + stage_w[si] * sl
        return loss, {"loss_disp": loss}


@MODELS.register
class CasPSMNet(_CascadeBase):
    """Cascade PSMNet: warped concat volumes over SPP-FPN features."""

    @nn.compact
    @pin_impl3d("native", "native")
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        feats = PSMCascadeFeatures(len(self.ndisps), dtype=self.dtype, name="features")
        if train:
            feats_l = feats(data["left"], train=True)
            feats_r = feats(data["right"], train=True)
        else:
            feats_l, feats_r = siamese(lambda x: feats(x, train=False),
                                       data["left"], data["right"])

        def build_volume(si, fl, fr, samples_s):
            return build_warped_concat_volume(fl, fr, samples_s)

        return self._run_cascade(data, feats_l, feats_r, build_volume, train)


@MODELS.register
class CasGwcNet(_CascadeBase):
    """Cascade GwcNet: warped gwc+concat volumes over nospp-FPN features."""

    num_groups: Sequence[int] = (40, 20, 10)

    @nn.compact
    @pin_impl3d("native", "native")
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        feats = GwcCascadeFeatures(len(self.ndisps), dtype=self.dtype, name="features")
        if train:
            feats_l = feats(data["left"], train=True)
            feats_r = feats(data["right"], train=True)
        else:
            feats_l, feats_r = siamese(lambda x: feats(x, train=False),
                                       data["left"], data["right"])

        def build_volume(si, fl, fr, samples_s):
            gwc = build_warped_gwc_volume(fl[0], fr[0], samples_s, self.num_groups[si])
            cat = build_warped_concat_volume(fl[1], fr[1], samples_s, zero_left=True)
            return jnp.concatenate([gwc, cat], axis=-1)

        return self._run_cascade(data, feats_l, feats_r, build_volume, train)
