"""FADNet — two-stage DispNetC → DispNetRes pyramid network, TPU-native.

Re-design of the reference FADNet
(reference: stereo/modeling/models/fadnet/{fadnet.py,fadnet_backbone.py,
fadnet_cost_processor.py,fadnet_disp_predictor.py,submodule.py}):

- shared 7×7-stem + residual encoder (1/2..1/8) on both views;
- correlation volume (D/8 + 16 shifts) at 1/8 + redirected left features;
- DispNetC decoder: 6 more encoder stages to 1/64, then a 7-scale
  deconv/iconv pyramid emitting flows pr6..pr0 (full res);
- warp right→left with the stage-1 flow, form the 11-channel error input
  (left, right, warped, flow, ‖diff‖) for DispNetRes, which predicts
  per-scale *residuals* added to the stage-1 pyramid;
- loss: 7-scale smooth-L1 against avg-pooled GT on both pyramids with
  weights [.32,.16,.08,.04,.02,.01,.005] (reference fadnet.py:119-139).

The reference's DynamicConv2d (weight slicing for variable disparity range,
submodule.py:261-334) exists for TensorRT retargeting; with static shapes
under XLA it reduces to a plain conv, which is what we build.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops import correlation_volume
from ...ops.sampler import bilinear_sampler
from ...registry import MODELS
from ..layers import ConvBlock, DeconvBlock, leaky_relu, siamese
from ..losses import masked_smooth_l1


class FadResBlock(nn.Module):
    """conv-bn-relu-conv-bn (+1×1 conv-bn shortcut) → relu
    (reference submodule.py:350-378).

    dyres=True drops the bias of conv1 and the shortcut — the stage-1
    conv3_1 is a DyRes whose DynamicConv2d carries no bias
    (submodule.py:261-320; under static XLA shapes the weight slicing
    reduces to a plain conv over the actual input channels)."""

    features: int
    strides: int = 1
    dyres: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = ConvBlock(self.features, 3, strides=self.strides,
                      use_bias=not self.dyres,
                      norm="batch", act=nn.relu, dtype=self.dtype,
                      name="conv1")(x, train=train)
        y = ConvBlock(self.features, 3, use_bias=True, norm="batch",
                      dtype=self.dtype, name="conv2")(y, train=train)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvBlock(self.features, 1, strides=self.strides,
                          use_bias=not self.dyres,
                          norm="batch", dtype=self.dtype, name="shortcut")(x, train=train)
        return nn.relu(y + x)


class Encoder456(nn.Module):
    """conv4..conv6_1 shared shape between the two stages."""

    base: int  # basicE = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, conv3b, *, train: bool = False):
        e = self.base
        rb = lambda f, s, name: FadResBlock(f, s, dtype=self.dtype, name=name)  # noqa: E731
        conv4b = rb(e * 8, 1, "conv4_1")(rb(e * 8, 2, "conv4")(conv3b, train=train), train=train)
        conv5b = rb(e * 16, 1, "conv5_1")(rb(e * 16, 2, "conv5")(conv4b, train=train), train=train)
        conv6b = rb(e * 32, 1, "conv6_1")(rb(e * 32, 2, "conv6")(conv5b, train=train), train=train)
        return conv4b, conv5b, conv6b


class PyramidDecoder(nn.Module):
    """7-scale deconv/iconv flow pyramid (reference fadnet_cost_processor.py:110-168
    and fadnet_disp_predictor.py:95-175).

    If `base_flows` is given, heads predict residuals added to them and every
    output is ReLU'd (DispNetRes); otherwise only the full-res output is
    ReLU'd (DispNetC).
    """

    base: int  # basicD = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, skips: List[jnp.ndarray],
                 base_flows: Optional[List[jnp.ndarray]] = None, *,
                 train: bool = False):
        # skips: [conv6b, conv5b, conv4b, conv3b, conv2, conv1, top] coarse→fine
        d = self.base
        residual = base_flows is not None

        pred = lambda name: nn.Conv(1, (3, 3), padding="SAME", use_bias=False,  # noqa: E731
                                    dtype=self.dtype, name=name)
        upflow = lambda name: nn.ConvTranspose(1, (4, 4), strides=(2, 2),  # noqa: E731
                                               padding="SAME", use_bias=False,
                                               dtype=self.dtype, name=name)
        upconv = lambda f, name: DeconvBlock(f, 4, 2, act=leaky_relu(0.1),  # noqa: E731
                                             dtype=self.dtype, name=name)
        iconv = lambda f, name: nn.Conv(f, (3, 3), padding="SAME", use_bias=True,  # noqa: E731
                                        dtype=self.dtype, name=name)

        flows = [None] * 7
        x = skips[0]
        pr = pred("pred6")(x)
        if residual:
            pr = pr + base_flows[6]
        flows[6] = pr

        widths = [16, 8, 4, 2, 1, 1]  # decoder feature multipliers per level
        for lvl in range(5, -1, -1):
            i = 5 - lvl  # 0..5
            up = upconv(d * widths[i], f"upconv{lvl}")(x, train=train)
            uf = upflow(f"upflow{lvl}")(pr)
            cat = jnp.concatenate([up, uf, skips[1 + i]], axis=-1)
            x = iconv(d * widths[i], f"iconv{lvl}")(cat)
            pr = pred(f"pred{lvl}")(x)
            if residual:
                pr = pr + base_flows[lvl]
            flows[lvl] = pr

        if residual:
            flows = [nn.relu(f) for f in flows]
        else:
            flows[0] = nn.relu(flows[0])
        return flows


@MODELS.register
class FADNet(nn.Module):
    """forward(data) → {'disp_pred', 'flows_c'/'flows_res' (train)}."""

    max_disp: int = 192
    encoder_ratio: int = 16
    decoder_ratio: int = 16
    input_channel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        left, right = data["left"], data["right"]
        e = 2 * self.encoder_ratio
        d = 2 * self.decoder_ratio

        # stage-1 shared encoder (reference fadnet_backbone.py:28-62)
        conv1 = ConvBlock(e, 7, strides=2, use_bias=True, act=leaky_relu(0.1),
                          dtype=self.dtype, name="conv1")
        conv2 = FadResBlock(e * 2, 2, dtype=self.dtype, name="conv2")
        conv3 = FadResBlock(e * 4, 2, dtype=self.dtype, name="conv3")

        def encode(x):
            c1 = conv1(x, train=train)
            c2 = conv2(c1, train=train)
            return c1, c2, conv3(c2, train=train)

        if train:
            c1l, c2l, c3l = encode(left)
            c1r, c2r, c3r = encode(right)
        else:
            (c1l, c2l, c3l), (c1r, c2r, c3r) = siamese(encode, left, right)

        d8 = self.max_disp // 8 + 16
        corr = nn.leaky_relu(correlation_volume(c3l, c3r, d8), 0.1)  # [B,H/8,W/8,D]
        redir = FadResBlock(e, 1, dtype=self.dtype, name="conv_redir")(c3l, train=train)
        conv3b = FadResBlock(e * 4, 1, dyres=True, dtype=self.dtype,
                             name="conv3_1")(
            jnp.concatenate([redir, corr], axis=-1), train=train)
        c4b, c5b, c6b = Encoder456(e, dtype=self.dtype, name="enc456")(
            conv3b, train=train)

        flows_c = PyramidDecoder(d, dtype=self.dtype, name="decoder_c")(
            [c6b, c5b, c4b, conv3b, c2l, c1l, left], train=train)
        flow_c = flows_c[0][..., 0]  # [B,H,W]

        # warp + error input for stage 2 (reference fadnet.py:65-71).
        # warp_right_to_left normalises with 2x/(W-1)-1 but samples through
        # grid_sample's default align_corners=False (submodule.py:694-709),
        # so the effective source position is (x-flow)·W/(W-1) - 0.5 — kept
        # exactly (a scale/shift quirk of the reference, not true pixels)
        b_, hh, ww, _ = right.shape
        xs = jnp.arange(ww, dtype=flow_c.dtype)[None, None, :]
        ys = jnp.arange(hh, dtype=flow_c.dtype)[None, :, None]
        src_x = (xs - flow_c) * (ww / max(ww - 1, 1)) - 0.5
        src_y = (ys * (hh / max(hh - 1, 1)) - 0.5) + jnp.zeros_like(flow_c)
        warped = bilinear_sampler(right, jnp.stack([src_x, src_y], axis=-1))
        diff = left - warped
        norm_diff = jnp.sqrt(jnp.sum(diff * diff, axis=-1, keepdims=True) + 1e-8)
        inputs2 = jnp.concatenate(
            [left, right, warped, flows_c[0], norm_diff], axis=-1)  # 11ch

        r1 = ConvBlock(e, 7, strides=2, use_bias=True, act=leaky_relu(0.1),
                       dtype=self.dtype, name="res_conv1")(inputs2, train=train)
        r2 = FadResBlock(e * 2, 2, dtype=self.dtype, name="res_conv2")(r1, train=train)
        r3 = FadResBlock(e * 4, 2, dtype=self.dtype, name="res_conv3")(r2, train=train)
        r3b = FadResBlock(e * 4, 1, dtype=self.dtype, name="res_conv3_1")(r3, train=train)
        r4b, r5b, r6b = Encoder456(e, dtype=self.dtype, name="res_enc456")(
            r3b, train=train)

        flows_res = PyramidDecoder(d, dtype=self.dtype, name="decoder_res")(
            [r6b, r5b, r4b, r3b, r2, r1, left], base_flows=flows_c, train=train)

        out = {"disp_pred": flows_res[0][..., 0]}
        if train:
            out["flows_c"] = flows_c
            out["flows_res"] = flows_res
        return out

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"][..., None]  # [B,H,W,1]
        weights = (0.32, 0.16, 0.08, 0.04, 0.02, 0.01, 0.005)
        loss = 0.0
        for flows in (pred["flows_c"], pred["flows_res"]):
            target = gt
            for i, wgt in enumerate(weights):
                if i > 0:
                    target = nn.avg_pool(target, (2, 2), strides=(2, 2))
                mask = (target > 0) & (target < self.max_disp)
                loss = loss + wgt * masked_smooth_l1(flows[i], target, mask)
        return loss, {"loss_disp": loss}
