"""IINet — intra-view and inter-view iterative cost-volume stereo.

TPU-native re-design of reference stereo/modeling/models/iinet/
(iinet.py:18-131, cost_volume.py:15-127, networks.py:22-422,
layers.py:26-95, loss.py:15-291):

- UNet matching encoder on a MobileNetV3-Large trunk
  (networks.py:326-422) → 16-dim matching features at 1/2, 1/4, 1/8 and a
  5-level image-feature pyramid;
- coarse-to-fine MLP cost volumes (cost_volume.py:37-127): a full 24-bin
  sweep at 1/8 scored by a per-pixel MLP over (left ‖ shifted-right ‖ dot),
  then 6-/4-bin hypothesis volumes at 1/4 and 1/2 whose candidates come
  from the previous level's top-k indices (2 children per parent), with
  per-level entropy-based confidence;
- CVEncoder fusing confidence-filtered volumes with image features
  (networks.py:162-213), a UNet++-style depth decoder with RAFT-style
  convex 2x upsampler refinements at 1/8, 1/4, 1/2 → full res
  (networks.py:22-159);
- the full criterion: multi-scale L1 + sobel-gradient loss, normal loss
  (gaussian blur → backproject → cross product), and the
  uncertainty-stage focal+KL volume loss (loss.py:26-291). kornia's
  filters are re-implemented in ops/filters.py.

Layout: NHWC; cost volumes are [B, H, W, D] (D rides the lane dim and is
consumed channel-wise by the 2D CVEncoder); all per-pixel MLPs are Dense
over the last axis (MXU matmuls) instead of the reference's
permute-Linear-permute round-trips. The hypothesis gather reproduces
grid_sample(mode='nearest', align_corners=False) semantics exactly
(x = t·W/(W-1) - 0.5, round-half-even, zeros outside).

Contract note: `disp_pred` is exported in FULL disparity units (the
reference emits 1/16-scale units and rescales in its trainer,
iinet/trainer.py:134); raw-scale heads are kept under aux keys for the
loss.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.filters import gaussian_blur, spatial_gradient
from ...ops.upsample import resize_bilinear
from ...registry import MODELS
from ..backbones.mobilenetv3 import MobileNetV3Features
from ..layers import head_dtype, leaky_relu, siamese

Dtype = Any

_lrelu2 = leaky_relu(0.2)
_lrelu01 = leaky_relu(0.01)  # torch nn.LeakyReLU() default slope


def _instance_norm(x, dtype, name):
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                        use_bias=False, use_scale=False, dtype=dtype,
                        name=name)(x)


class BasicBlock(nn.Module):
    """Residual 3x3 block, Identity norm (biased convs) + LeakyReLU(0.2)
    (reference layers.py:26-89)."""

    features: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=[(1, 1)] * 2, dtype=self.dtype, name="conv1")(x)
        y = _lrelu2(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="conv2")(y)
        if inp != self.features or self.strides != 1:
            k = (1, 1) if self.strides == 1 else (3, 3)
            pad = [(0, 0)] * 2 if self.strides == 1 else [(1, 1)] * 2
            x = nn.Conv(self.features, k, strides=(self.strides,) * 2,
                        padding=pad, dtype=self.dtype, name="downsample")(x)
        return _lrelu2(y + x)


class MatchingUNet(nn.Module):
    """MobileNetV3 UNet matching encoder (networks.py:326-422).

    Returns (matching_feats [1/2, 1/4, 1/8] each 16ch instance-normed,
    image_feats [1/2 .. 1/32])."""

    num_ch_out: Sequence[int] = (16, 16, 16, 16)
    lrcv_scale: int = 3          # matching_scale + 1
    multiscale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        enc = MobileNetV3Features(dtype=self.dtype, name="trunk")(
            x, train=train)
        num_ch_up = (16, 24, 40, 112)
        feats = list(enc)
        match = [None] * (self.multiscale + 1)
        for i in range(4, 0, -1):
            # the up path consumes the ORIGINAL trunk tap enc[i], not the
            # refined feats[i] written by the previous iteration — the
            # reference's x_diag = up_conv(enc_output[i]) (networks.py:418);
            # feats[] only collects the refined in_conv outputs for return
            up = nn.ConvTranspose(num_ch_up[i - 1], (4, 4), strides=(2, 2),
                                  padding="SAME", use_bias=False,
                                  dtype=self.dtype,
                                  name=f"up_conv{i + 1}")(enc[i])
            use_ra = (not train) or (not self.is_mutable_collection("batch_stats"))
            up = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype,
                              name=f"up_bn{i + 1}")(up)
            up = _lrelu2(up)
            y = jnp.concatenate([enc[i - 1], up], axis=-1)
            y = nn.Conv(num_ch_up[i - 1], (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"in_conv{i}")(y)
            y = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"in_bn{i}")(y)
            y = _lrelu2(y)
            feats[i - 1] = y
            if self.lrcv_scale - self.multiscale <= i <= self.lrcv_scale:
                m = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
                m = nn.Conv(self.num_ch_out[i - 1], (3, 3), padding="VALID",
                            dtype=self.dtype, name=f"out_conv{i}")(m)
                m = _instance_norm(m, self.dtype, f"out_in{i}")
                match[i - self.lrcv_scale + self.multiscale] = m
        return match, feats


def _nearest_gather_w(feats: jnp.ndarray, tpos: jnp.ndarray) -> jnp.ndarray:
    """Sample feats [B,H,W,C] at integer-ish x-targets tpos [B,H,W,D] with
    grid_sample(mode='nearest', align_corners=False, zeros) semantics
    (cost_volume.py:92-101): x = t·W/(W-1) - 0.5, round-half-even, zero
    outside. Returns [B,H,W,D,C]."""
    b, h, w, c = feats.shape
    d = tpos.shape[-1]
    x = tpos.astype(jnp.float32) * (w / (w - 1)) - 0.5
    idx = jnp.rint(x).astype(jnp.int32)
    valid = (idx >= 0) & (idx < w)
    idx_c = jnp.clip(idx, 0, w - 1)
    g = jnp.take_along_axis(feats, idx_c.reshape(b, h, w * d)[..., None],
                            axis=2)
    g = g.reshape(b, h, w, d, c)
    return g * valid[..., None].astype(feats.dtype)


class MsCostVolume(nn.Module):
    """Coarse-to-fine MLP cost volumes (cost_volume.py:15-127)."""

    num_depth_bins: Sequence[int] = (4, 6, 24)
    disp_scale: int = 2
    matching_dim: int = 16
    dtype: Dtype = jnp.float32

    def _confidence(self, volume):
        """Entropy-based confidence (cost_volume.py:66-72); volume
        [B,H,W,D] → [B,H,W,1]."""
        hdt = head_dtype(self.dtype)
        beta = -math.log(0.5)
        pt = 0.90
        alpha = 1 / (-pt * math.log(pt) - (1 - pt) * math.log(1 - pt) - beta)
        p = jnp.clip(jax.nn.sigmoid(volume.astype(hdt) * 2), 1e-7, 1 - 1e-7)
        q = 1 - p
        ent = -p * jnp.log(p) - q * jnp.log(q)
        unc = jnp.mean(ent, axis=-1, keepdims=True)
        pmax = jnp.max(p, axis=-1, keepdims=True)
        return jnp.minimum(alpha * (unc - beta) * pmax, 1.0).astype(self.dtype)

    @nn.compact
    def __call__(self, left_feats, right_feats):
        """left/right_feats: [1/2, 1/4, 1/8] 16-ch matching features.
        Returns (cost_volumes, hypos, {'cdisp','cconf'}) — lists indexed
        fine→coarse like the reference."""
        ns = len(left_feats)
        scale = 1.0 / math.sqrt(self.matching_dim)
        cost, conf, cdisp = [None] * ns, [None] * ns, [None] * ns
        hypos = [None] * (ns - 1)

        # ONE shared scoring MLP across all levels (cost_volume.py:31-32)
        d0 = nn.Dense(64, dtype=self.dtype, name="mlp_0")
        d1 = nn.Dense(32, dtype=self.dtype, name="mlp_1")
        d2 = nn.Dense(1, dtype=self.dtype, name="mlp_2")

        def _mlp(feat):
            return d2(_lrelu01(d1(_lrelu01(d0(feat)))))[..., 0]

        for k in range(ns - 1, -1, -1):
            lf, rf = left_feats[k], right_feats[k]
            b, h, w, c = lf.shape
            nd = self.num_depth_bins[k]
            if k == ns - 1:
                # full sweep: (left ‖ shifted right ‖ dot) per bin
                planes = []
                for d in range(nd):
                    if d >= w:  # shift beyond the frame: right/dot all-zero
                        r = jnp.zeros_like(rf)
                    elif d == 0:
                        r = rf
                    else:
                        r = jnp.pad(rf[:, :, :-d],
                                    ((0, 0), (0, 0), (d, 0), (0, 0)))
                    # dot is zero on the invalid left margin because r is
                    dot = jnp.sum(lf * r, axis=-1, keepdims=True) * scale
                    planes.append(jnp.concatenate([lf, r, dot], axis=-1))
                feat = jnp.stack(planes, axis=3)          # [B,H,W,D,2C+1]
                volume = _mlp(feat)                  # [B,H,W,D]
                dpos = None
            else:
                prev = hypos[k]                           # [B,H,W,D/2] float
                dpos = jnp.stack([prev * 2, prev * 2 + 1], axis=-1)
                dpos = dpos.reshape(b, h, w, nd)
                hypos[k] = dpos
                wpos = jnp.arange(w, dtype=dpos.dtype)[None, None, :, None]
                tgt = _nearest_gather_w(rf, wpos - dpos)  # [B,H,W,D,C]
                dot = jnp.sum(lf[:, :, :, None] * tgt, axis=-1,
                              keepdims=True) * scale
                lf_b = jnp.broadcast_to(lf[:, :, :, None], tgt.shape)
                volume = _mlp(jnp.concatenate([lf_b, tgt, dot], axis=-1))

            cost[k] = volume
            conf[k] = self._confidence(volume)
            gate = (conf[k] > 0.1).astype(volume.dtype)
            order = jnp.argsort(-volume, axis=-1)
            if k == ns - 1:
                cdisp[k] = (order[..., :1].astype(volume.dtype) * gate
                            / self.disp_scale)
                if ns > 1:
                    top = order[..., :self.num_depth_bins[k - 1] // 2]
                    hypos[k - 1] = jnp.repeat(jnp.repeat(
                        top.astype(volume.dtype), 2, axis=1), 2, axis=2)
            else:
                best = jnp.argmax(volume, axis=-1)[..., None]
                sel = jnp.take_along_axis(dpos, best, axis=-1)
                div = self.disp_scale * 2 ** (ns - 1 - k)
                cdisp[k] = sel * gate[..., :1] / div
                if k > 0:
                    top = jnp.take_along_axis(
                        dpos, order[..., :self.num_depth_bins[k - 1] // 2],
                        axis=-1)
                    hypos[k - 1] = jnp.repeat(jnp.repeat(top, 2, axis=1),
                                              2, axis=2)
        # reshape cdisp to [B,H,W,1]
        cdisp = [d if d.ndim == 4 else d[..., None] for d in cdisp]
        return cost, hypos, {"cdisp": cdisp, "cconf": conf}


class CVEncoder(nn.Module):
    """Fuse filtered cost volumes with image features (networks.py:162-213)."""

    num_ch_cvs: Sequence[int] = (4, 6, 24)
    num_ch_encs: Sequence[int] = (16, 24, 40, 112, 160)
    num_ch_outs: Sequence[int] = (24, 64, 128, 192, 256)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cost_list, img_feats):
        ns = len(cost_list)
        outs = []
        x = jnp.concatenate([cost_list[0], img_feats[0]], axis=-1)
        x = BasicBlock(self.num_ch_outs[0], dtype=self.dtype,
                       name="conv_0a")(x)
        x = BasicBlock(self.num_ch_outs[0], dtype=self.dtype,
                       name="conv_0b")(x)
        outs.append(x)
        for i in range(1, len(self.num_ch_outs)):
            x = BasicBlock(self.num_ch_outs[i], strides=2, dtype=self.dtype,
                           name=f"ds_conv_{i}")(x)
            parts = ([cost_list[i], x, img_feats[i]] if i < ns
                     else [x, img_feats[i]])
            x = jnp.concatenate(parts, axis=-1)
            x = BasicBlock(self.num_ch_outs[i], dtype=self.dtype,
                           name=f"conv_{i}a")(x)
            x = BasicBlock(self.num_ch_outs[i], dtype=self.dtype,
                           name=f"conv_{i}b")(x)
            outs.append(x)
        return outs


class RaftUpSampler(nn.Module):
    """Residual disp head + convex 2x upsampler (networks.py:22-65)."""

    hdim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, disp_l):
        """x [B,H,W,C+1]; disp_l [B,H,W,1] → (disp [B,H,W,1],
        up_disp [B,2H,2W,1])."""
        net = BasicBlock(self.hdim, dtype=self.dtype, name="regresshead")(x)
        d = nn.Conv(self.hdim, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="disphead_0")(net)
        d = nn.relu(d)
        d = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="disphead_1")(d)
        disp = d + disp_l
        m = nn.Conv(self.hdim, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="maskhead_0")(net)
        m = nn.relu(m)
        m = nn.Conv(4 * 9, (1, 1), dtype=self.dtype, name="maskhead_1")(m)
        mask = 0.25 * m

        b, h, w, _ = disp.shape
        hdt = head_dtype(self.dtype)
        # mask channel c = k*4 + i*2 + j (k: 9-neighbour, i,j: subpixel)
        mk = mask.reshape(b, h, w, 9, 2, 2).astype(hdt)
        mk = jax.nn.softmax(mk, axis=3)
        dp = jnp.pad(disp[..., 0], ((0, 0), (1, 1), (1, 1)))
        nbs = jnp.stack([dp[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                         for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
                        axis=-1).astype(hdt)                # [B,H,W,9]
        up = jnp.einsum("bhwkij,bhwk->bhwij", mk, nbs)
        up = up.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, 2 * w, 1)
        return disp, up.astype(self.dtype)


class DepthDecoderMSR(nn.Module):
    """UNet++-style decoder with RAFT upsampler refinements
    (networks.py:68-159)."""

    num_ch_enc: Sequence[int] = (24, 64, 128, 192, 256)
    num_ch_dec: Sequence[int] = (32, 64, 128, 256)
    lrcv_scale: int = 3
    scales: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, priority):
        cdisp = priority["cdisp"]
        stage = len(cdisp) - 1
        outputs: Dict[str, jnp.ndarray] = {}
        up_disp = None
        upfeats = []
        for i in range(4, 0, -1):
            right = BasicBlock(self.num_ch_dec[i - 1], dtype=self.dtype,
                               name=f"right_conv_{i}0")(feats[i - 1])
            src = feats[i] if i == 4 else upfeats[-1]
            upc = BasicBlock(self.num_ch_dec[i - 1], dtype=self.dtype,
                             name=f"up_conv_{i + 1}0")(src)
            h, w = upc.shape[1:3]
            upc = resize_bilinear(upc, (2 * h, 2 * w))
            y = jnp.concatenate([right, upc], axis=-1)
            y = BasicBlock(self.num_ch_dec[i - 1], dtype=self.dtype,
                           name=f"in_conv_{i}1a")(y)
            y = BasicBlock(self.num_ch_dec[i - 1], dtype=self.dtype,
                           name=f"in_conv_{i}1b")(y)
            upfeats.append(y)
            if 0 < i < self.scales:
                prior = cdisp[stage] if i == self.lrcv_scale else up_disp
                displ, up_disp = RaftUpSampler(
                    self.num_ch_dec[i - 1], dtype=self.dtype,
                    name=f"refine_{i}")(
                    jnp.concatenate([y, prior], axis=-1), prior)
                stage -= 1
                outputs[f"disp_pred_s{i}"] = displ
        outputs["disp_raw"] = up_disp
        return outputs


@MODELS.register
class IINet(nn.Module):
    """forward(data) → {'disp_pred' [B,H,W] (full disparity units), aux}."""

    max_disp: int = 192
    matching_feature_dims: int = 16
    matching_scale: int = 2
    multiscale: int = 2
    out_scale: int = 4
    disp_scale: int = 16
    uncer_only: bool = False
    loss_weight_l1: Sequence[float] = (5.0, 2.5, 1.25, 0.6)
    loss_weight_grad: Sequence[float] = (1.0, 1.0, 0.5, 0.5)
    loss_weight_normal: float = 2.5
    loss_weight_focal: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        image1, image2 = data["left"], data["right"]
        sf = 2 ** (self.matching_scale + 1)
        nd = self.max_disp // sf
        bins = [4, 6, nd][-(self.multiscale + 1):]

        unet = MatchingUNet(lrcv_scale=self.matching_scale + 1,
                            multiscale=self.multiscale, dtype=self.dtype,
                            name="matching_model")
        if train:
            match_l, feats_l = unet(image1, train=True)
            match_r, _ = unet(image2, train=True)
        else:
            (match_l, feats_l), (match_r, _) = siamese(
                lambda x: unet(x, train=False), image1, image2)

        cost, hypos, priority = MsCostVolume(
            num_depth_bins=tuple(bins),
            disp_scale=self.disp_scale // sf,
            matching_dim=self.matching_feature_dims,
            dtype=self.dtype, name="cost_volume")(match_l, match_r)

        filt = [c * cf for c, cf in zip(cost, priority["cconf"])]
        cv_feats = CVEncoder(num_ch_cvs=tuple(bins), dtype=self.dtype,
                             name="cost_volume_net")(filt, feats_l)
        dec = DepthDecoderMSR(lrcv_scale=self.matching_scale + 1,
                              scales=self.out_scale, dtype=self.dtype,
                              name="depth_decoder")(cv_feats, priority)

        out: Dict[str, jnp.ndarray] = {
            "disp_pred": (dec["disp_raw"][..., 0]
                          * self.disp_scale).astype(head_dtype(self.dtype)),
        }
        if train:
            out["disp_raw"] = dec["disp_raw"]
            for i in range(1, self.out_scale):
                out[f"disp_pred_s{i}"] = dec[f"disp_pred_s{i}"]
            out["cost_volume"] = cost
            out["hypos"] = hypos
            out["coarse_disp"] = priority["cdisp"][0]
        return out

    # ------------------------------------------------------------------
    # criterion (reference loss.py:26-291)
    # ------------------------------------------------------------------

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"][:, None]                        # [B,1,H,W]
        b, _, h, w = gt.shape
        pyr = [gt]
        for i in range(1, self.out_scale):
            pyr.append(pyr[-1][:, :, ::2, ::2])           # nearest downsample
        vmask = [(p > 0) & (p < self.max_disp) for p in pyr]

        losses = {}
        if not self.uncer_only:
            l1s, grads = [], []
            for i in range(self.out_scale):
                dgt = pyr[i][:, 0] / self.disp_scale
                dp = (pred["disp_raw"] if i == 0
                      else pred[f"disp_pred_s{i}"])[..., 0]
                m = vmask[i][:, 0]
                l1s.append(self._masked_mean(jnp.abs(dp - dgt), m))
                # per-sample mask over both sobel channels. (The reference's
                # broadcasting at loss.py:151-153 silently crosses batch
                # entries for B>1; identical at B=1, and the per-sample form
                # is the evident intent.)
                gx_p, gy_p = spatial_gradient(dp)
                gx_g, gy_g = spatial_gradient(dgt)
                grads.append(self._masked_mean(
                    jnp.stack([jnp.abs(gx_p - gx_g), jnp.abs(gy_p - gy_g)],
                              1), jnp.stack([m, m], 1)))
            losses["l1"] = l1s
            losses["grad"] = grads
            losses["normal"] = self._normal_loss(pred, data, pyr[0],
                                                 vmask[0])
            losses["focal"] = jnp.zeros((), self._ldt())
        else:
            losses["l1"] = [jnp.zeros((), self._ldt())] * self.out_scale
            losses["grad"] = [jnp.zeros((), self._ldt())] * self.out_scale
            losses["normal"] = jnp.zeros((), self._ldt())
            losses["focal"] = self._focal_loss(pred, pyr[0])

        total = sum(l * wt for l, wt in zip(losses["l1"],
                                            self.loss_weight_l1))
        total = total + sum(g * wt for g, wt in zip(losses["grad"],
                                                    self.loss_weight_grad))
        total = total + losses["normal"] * self.loss_weight_normal
        total = total + losses["focal"] * self.loss_weight_focal

        # degenerate-crop guard (loss.py:273-275)
        frac = (vmask[0][:, 0].astype(jnp.float32).mean(axis=(1, 2))
                / jnp.maximum((pyr[0][:, 0] > 0).astype(jnp.float32)
                              .mean(axis=(1, 2)), 1e-12))
        total = jnp.where(jnp.any(frac < 0.1), total * 0.0, total)

        info = {"scalar/train/loss_focal": losses["focal"],
                "scalar/train/normal": losses["normal"],
                "scalar/train/aggregated": total}
        for i in range(self.out_scale):
            info[f"scalar/train/l1_{i}"] = losses["l1"][i]
            info[f"scalar/train/grad_{i}"] = losses["grad"][i]
        return total, info

    def _ldt(self):
        return head_dtype(self.dtype)

    @staticmethod
    def _masked_mean(x, m):
        mf = m.astype(x.dtype)
        return jnp.sum(x * mf) / jnp.maximum(jnp.sum(mf), 1.0)

    def _normal_loss(self, pred, data, gt, vmask):
        """loss.py:79-125: blur → backproject with the camera grid →
        sobel → cross-product normals → 1 - dot."""
        b, _, h, w = gt.shape
        pos = data.get("pos")
        if pos is None:
            fx = 800.0
            xr = (jnp.arange(w) + 0.5 - w // 2) / fx
            yr = (jnp.arange(h) + 0.5 - h // 2) / fx
            gy, gx = jnp.meshgrid(yr, xr, indexing="ij")
            pos = jnp.stack([gx, gy, jnp.ones_like(gx)], 0)[None]
            pos = jnp.broadcast_to(pos, (b, 3, h, w))

        def normals(d):
            sm = gaussian_blur(d[:, 0], 5, 2.0)[:, None]
            pts = pos * sm                               # [B,3,H,W]
            gx, gy = spatial_gradient(pts)               # each [B,3,H,W]
            n = jnp.cross(gx, gy, axis=1)
            # sqrt is regularised INSIDE: d/dx sqrt(x) at x=0 is inf, and a
            # flat predicted surface yields exactly-zero cross products —
            # the bare-sqrt gradient NaN'd overfit runs at convergence
            norm = jnp.sqrt(jnp.sum(n * n, axis=1, keepdims=True) + 1e-12)
            return n / norm

        n_gt = normals(gt / self.disp_scale)
        n_pr = normals(jnp.transpose(pred["disp_raw"], (0, 3, 1, 2)))
        finite = (jnp.isfinite(n_gt).all(axis=1, keepdims=True)
                  & jnp.isfinite(n_pr).all(axis=1, keepdims=True))
        mask = finite & vmask
        dot = 1.0 - jnp.sum(jnp.where(finite, n_pr, 1.0)
                            * jnp.where(finite, n_gt, 1.0), axis=1,
                            keepdims=True)
        return self._masked_mean(dot, mask)

    def _focal_loss(self, pred, disp_gt):
        """Uncertainty-stage volume supervision (loss.py:160-223):
        KL + bi-focal against linearly-binned GT histograms."""
        alpha, gamma = 0.8, 2.0
        cost = pred["cost_volume"]
        ns = len(cost)
        klw = [5.0, 5.0, 10.0][3 - ns:]
        bcw = [5.0, 5.0, 10.0][3 - ns:]
        kl_total = jnp.zeros((), self._ldt())
        bce_total = jnp.zeros((), self._ldt())
        for i in range(ns):
            vol = jnp.transpose(cost[i], (0, 3, 1, 2))   # [B,D,h,w]
            scale = 2 ** (4 - ns + i)
            if i < ns - 1:
                hyp = jnp.transpose(pred["hypos"][i], (0, 3, 1, 2))
                gt_vol, mask_vol = self._gt_volume(disp_gt, hyp, scale)
            else:
                gt_vol, mask_vol = self._gt_volume(disp_gt, None, scale)
            hdt = self._ldt()
            prob = jnp.clip(jax.nn.softmax(vol.astype(hdt), axis=1), 1e-7)
            sig = jnp.clip(jax.nn.sigmoid(vol.astype(hdt) * 2),
                           1e-7, 1 - 1e-7)
            covered = jnp.broadcast_to(
                gt_vol.sum(axis=1, keepdims=True) > 0, gt_vol.shape)
            edge_w = mask_vol.sum(axis=1, keepdims=True)
            # KLDivLoss(log_target=False): gt·(log gt − log prob), 0 at gt=0
            kl = jnp.where(gt_vol > 0,
                           gt_vol * (jnp.log(jnp.maximum(gt_vol, 1e-38))
                                     - jnp.log(prob)), 0.0)
            kl_total = kl_total + klw[i] * self._masked_mean(
                kl * edge_w, covered)
            # VolumeBiFocalLoss(pt=sig, target=mask_vol, weight=gt_vol),
            # then × edge_weight (loss.py:15-24, 218-221)
            foc = (-gt_vol * alpha * (1 - sig) ** gamma
                   * mask_vol * jnp.log(sig)
                   - (1 - alpha) * sig ** gamma * (1 - mask_vol)
                   * jnp.log(1 - sig))
            bce_total = bce_total + bcw[i] * self._masked_mean(
                edge_w * foc, covered)
        return kl_total + bce_total

    def _gt_volume(self, disp_gt, disp_index, scale):
        """loss.py:161-184: scatter the GT disparities of each
        scale x scale patch into a linear histogram over the volume's
        candidate indices."""
        b, _, h, w = disp_gt.shape
        hs, ws = h // scale, w // scale
        patch = disp_gt[:, 0].reshape(b, hs, scale, ws, scale)
        patch = patch.transpose(0, 2, 4, 1, 3).reshape(b, scale * scale,
                                                       1, hs, ws)
        invalid = None
        if disp_index is None:
            d = self.max_disp // scale
            idx = jnp.arange(d, dtype=jnp.float32)[None, :, None, None]
            disp_index = jnp.broadcast_to(idx, (b, d, hs, ws))
            wpos = jnp.arange(ws)[None, None, None, :]
            invalid = (wpos < disp_index)[:, None]        # [B,1,D,hs,ws]
        dist = jnp.abs(patch / scale - disp_index[:, None])
        hist = 1.0 - dist
        hist = jnp.where(dist > 1, 0.0, hist)
        if invalid is not None:
            hist = jnp.where(invalid, 0.0, hist)
        gt_vol = hist.sum(axis=1)
        denom = gt_vol.sum(axis=1, keepdims=True)
        gt_vol = jnp.where(denom > 0, gt_vol / jnp.maximum(denom, 1e-38),
                           0.0)
        mask_vol = (gt_vol > 0).astype(gt_vol.dtype)
        return gt_vol, mask_vol
