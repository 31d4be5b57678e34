"""LightStereo (S/M/L/LX) — 2D-cost-aggregation stereo model, TPU-native.

Re-design of the reference LightStereo
(reference: stereo/modeling/models/lightstereo/{lightstereo.py,backbone.py,aggregation.py})
in flax.linen with NHWC layouts:

- the correlation volume comes out [B, H/4, W/4, D] with disparity in the
  lane (channel) dimension, so the "D-as-channels" 2D aggregation UNet is a
  stack of ordinary NHWC convs — exactly the layout the MXU wants;
- strip convolutions in the attention module are depthwise (1,k)/(k,1) convs;
- superpixel upsampling uses ops.context_upsample (pad+slice taps, no unfold).

Variants (reference cfgs/lightstereo/*.yaml):
  S: blocks=[1,2,4], expanse=4;  M: [4,8,16]/4;  L: [8,16,32]/8 — all MobileNetV2
  (LX uses EfficientNetV2 + [8,16,32]/8).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import correlation_volume, disparity_regression, context_upsample, resize_bilinear
from ...registry import MODELS
from ..backbones import MobileNetV2Features
from ..layers import (ConvBlock, DeconvBlock, MobileV2Residual, leaky_relu,
                      head_dtype, siamese)
from ..losses import disp_valid_mask, masked_smooth_l1


class FPNLayer(nn.Module):
    """Upsample low-res, concat with high-res, fuse (reference backbone.py:11-27)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, low, high, *, train: bool = False):
        low = DeconvBlock(self.features, 4, 2, norm="batch", act=leaky_relu(0.2),
                          dtype=self.dtype, name="deconv")(low, train=train)
        feat = jnp.concatenate([high, low], axis=-1)
        return ConvBlock(self.features, 3, norm="batch", act=leaky_relu(0.2),
                         dtype=self.dtype, name="conv")(feat, train=train)


class Backbone(nn.Module):
    """Trunk + FPN → [p2@1/4, p3@1/8, p4@1/16, c5@1/32]
    (reference backbone.py:30-77).

    MobileNetv2: channels (24, 32, 96, 160); EfficientNetv2 (the LX variant):
    (48, 64, 160, 272) — reference backbone.py:33-38.
    """

    backbone: str = "MobileNetv2"
    dtype: Any = jnp.float32

    @property
    def output_channels(self) -> Sequence[int]:
        return (48, 64, 160, 272) if self.backbone == "EfficientNetv2" \
            else (24, 32, 96, 160)

    @nn.compact
    def __call__(self, images, *, train: bool = False) -> List[jnp.ndarray]:
        if self.backbone == "EfficientNetv2":
            from ..backbones.efficientnetv2 import EfficientNetV2Features

            trunk = EfficientNetV2Features(dtype=self.dtype, name="trunk")
        else:
            trunk = MobileNetV2Features(dtype=self.dtype, name="trunk")
        c1, c2, c3, c4, c5 = trunk(images, train=train)
        ch = self.output_channels
        p4 = FPNLayer(ch[2], dtype=self.dtype, name="fpn4")(c5, c4, train=train)
        p3 = FPNLayer(ch[1], dtype=self.dtype, name="fpn3")(p4, c3, train=train)
        p2 = FPNLayer(ch[0], dtype=self.dtype, name="fpn2")(p3, c2, train=train)
        p2 = ConvBlock(ch[0], 3, norm="instance", pad_mode="replicate",
                       dtype=self.dtype, name="out_conv")(p2, train=train)
        return [p2, p3, p4, c5]


class AttentionModule(nn.Module):
    """Large-kernel strip attention over the cost volume, guided by left image
    features (reference aggregation.py:108-134)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cost, img_feat):
        d = self.features
        attn = nn.Conv(d, (1, 1), dtype=self.dtype, name="proj")(img_feat)
        branches = [attn]
        for name, k in (("strip7", 7), ("strip11", 11), ("strip21", 21)):
            b = nn.Conv(d, (1, k), feature_group_count=d, dtype=self.dtype,
                        name=f"{name}_h")(attn)
            b = nn.Conv(d, (k, 1), feature_group_count=d, dtype=self.dtype,
                        name=f"{name}_v")(b)
            branches.append(b)
        attn = sum(branches)
        attn = nn.Conv(d, (1, 1), dtype=self.dtype, name="out")(attn)
        return attn * cost


class Aggregation(nn.Module):
    """MobileV2-residual UNet over the D-as-channels correlation volume
    (reference aggregation.py:7-64)."""

    in_channels: int  # = max_disp // 4
    blocks: Sequence[int]
    expanse_ratio: int
    left_att: bool = True
    backbone_channels: Sequence[int] = (24, 32, 96)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, volume, features_left, *, train: bool = False):
        ch = self.in_channels
        mv2 = lambda f, s, name: MobileV2Residual(  # noqa: E731
            f, strides=s, expanse_ratio=self.expanse_ratio, dtype=self.dtype, name=name)

        x = volume
        for i in range(self.blocks[0]):
            x = mv2(ch, 1, f"conv0_{i}")(x, train=train)
        if self.left_att:
            x = AttentionModule(ch, dtype=self.dtype, name="att0")(x, features_left[0])

        c = mv2(ch * 2, 2, "down1")(x, train=train)
        for i in range(self.blocks[1] - 1):
            c = mv2(ch * 2, 1, f"conv2_{i}")(c, train=train)
        if self.left_att:
            c = AttentionModule(ch * 2, dtype=self.dtype, name="att2")(c, features_left[1])
        conv2 = c

        c = mv2(ch * 4, 2, "down3")(conv2, train=train)
        for i in range(self.blocks[2] - 1):
            c = mv2(ch * 4, 1, f"conv4_{i}")(c, train=train)
        if self.left_att:
            c = AttentionModule(ch * 4, dtype=self.dtype, name="att4")(c, features_left[2])
        conv4 = c

        up5 = DeconvBlock(ch * 2, 3, 2, norm="batch", dtype=self.dtype,
                          name="up5")(conv4, train=train)
        redir2 = mv2(ch * 2, 1, "redir2")(conv2, train=train)
        conv5 = nn.relu(up5 + redir2)

        up6 = DeconvBlock(ch, 3, 2, norm="batch", dtype=self.dtype,
                          name="up6")(conv5, train=train)
        redir1 = mv2(ch, 1, "redir1")(x, train=train)
        return nn.relu(up6 + redir1)


@MODELS.register
class LightStereo(nn.Module):
    """forward(data) → {'disp_pred': [B,H,W], 'disp_4': [B,H,W] (train only)}.

    data['left'] / data['right']: [B, H, W, 3] normalized images.
    """

    max_disp: int = 192
    expanse_ratio: int = 4
    aggregation_blocks: Sequence[int] = (1, 2, 4)
    left_att: bool = True
    backbone: str = "MobileNetv2"  # or 'EfficientNetv2' (LX variant)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        left, right = data["left"], data["right"]
        backbone = Backbone(self.backbone, dtype=self.dtype, name="backbone")
        if train:
            feats_l = backbone(left, train=True)
            feats_r = backbone(right, train=True)
        else:
            feats_l, feats_r = siamese(
                lambda x: backbone(x, train=False), left, right)

        d4 = self.max_disp // 4
        volume = correlation_volume(feats_l[0], feats_r[0], d4)  # [B,H/4,W/4,D/4]
        volume = Aggregation(
            in_channels=d4, blocks=self.aggregation_blocks,
            expanse_ratio=self.expanse_ratio, left_att=self.left_att,
            backbone_channels=backbone.output_channels[:3],
            dtype=self.dtype, name="cost_agg",
        )(volume, feats_l, train=train)

        prob = nn.softmax(volume.astype(head_dtype(self.dtype)), axis=-1)
        init_disp = disparity_regression(prob, d4)  # [B,H/4,W/4]

        # superpixel weights (reference lightstereo.py:30-42,58-62)
        xspx = ConvBlock(24, 3, norm="instance", act=leaky_relu(), dtype=self.dtype,
                         name="refine1a")(feats_l[0], train=train)
        xspx = ConvBlock(24, 3, norm="instance", act=nn.relu, dtype=self.dtype,
                         name="refine1b")(xspx, train=train)
        stem2 = ConvBlock(16, 3, strides=2, norm="batch", act=leaky_relu(),
                          dtype=self.dtype, name="stem2a")(left, train=train)
        stem2 = ConvBlock(16, 3, norm="batch", act=nn.relu, dtype=self.dtype,
                          name="stem2b")(stem2, train=train)
        xspx = FPNLayer(16, dtype=self.dtype, name="refine2")(xspx, stem2, train=train)
        xspx = DeconvBlock(9, 4, 2, dtype=self.dtype, name="refine3")(xspx, train=train)
        spx_pred = nn.softmax(xspx.astype(head_dtype(self.dtype)), axis=-1)  # [B,H,W,9]

        disp_pred = context_upsample(init_disp * 4.0, spx_pred)  # [B,H,W]
        out = {"disp_pred": disp_pred}
        if train:
            h, w = left.shape[1], left.shape[2]
            out["disp_4"] = resize_bilinear(init_disp[..., None], (h, w))[..., 0] * 4.0
        return out

    def get_loss(self, pred: Dict[str, jnp.ndarray], data: Dict[str, jnp.ndarray]):
        """Smooth-L1 full-res + 0.3 × low-res (reference lightstereo.py:72-86)."""
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        loss = masked_smooth_l1(pred["disp_pred"], gt, mask)
        loss = loss + 0.3 * masked_smooth_l1(pred["disp_4"], gt, mask)
        return loss, {"loss_disp": loss}
