"""CoEx — normalized correlation + Guided Cost-volume Excitation, TPU-native.

Re-design of the reference CoEx
(reference: stereo/modeling/models/coex/{coex.py,coex_backbone.py,
coex_cost_processor.py,coex_disp_processor.py}):

- MobileNetV2 trunk + BN FeatUp decoder; stem_2/stem_4 spixel branch;
- attention cost volume: cosine similarity of projected descriptors at 1/4
  → [B, D/4, H/4, W/4, 1] (NDHWC);
- 3-level 3D UNet aggregation with disparity-strided downsampling and
  channelAtt (GCE) gating at every scale;
- top-k (k=2) soft-argmax regression + superpixel upsample;
- loss 0.77·(1.0·full + 0.3·low) (reference coex.py:51-63).

The trunk reproduces the reference quirk of applying the stem BN without
timm's activation (coex_backbone.py:62-63, stem_act=False).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import context_upsample, correlation_volume, resize_bilinear
from ...registry import MODELS
from ...parallel.sharding import shard_disparity
from ..backbones import MobileNetV2Features
from ..igev.blocks import BasicConvBN, Conv2x, FeatureAtt
from ..layers import head_dtype, pin_impl3d, siamese
from ..losses import disp_valid_mask, masked_smooth_l1


class FeatUp(nn.Module):
    """BN-variant FPN decoder (reference coex_backbone.py:10-28)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        x4, x8, x16, x32 = feats
        y16 = Conv2x(96, deconv=True, norm="batch", dtype=self.dtype,
                     name="deconv32_16")(x32, x16, train=train)   # 192c
        y8 = Conv2x(32, deconv=True, norm="batch", dtype=self.dtype,
                    name="deconv16_8")(y16, x8, train=train)      # 64c
        y4 = Conv2x(24, deconv=True, norm="batch", dtype=self.dtype,
                    name="deconv8_4")(y8, x4, train=train)        # 48c
        y4 = BasicConvBN(48, 3, dtype=self.dtype, name="conv4")(y4, train=train)
        return [y4, y8, y16, x32]


@MODELS.register
class CoExNet(nn.Module):
    """forward(data) → {'disp_pred', 'disp_preds' (train: [full, low])}."""

    max_disp: int = 192
    spixel_branch_channels: Sequence[int] = (32, 48)
    matching_weighted: bool = False
    gce: bool = True
    aggregation_disp_strides: int = 2
    aggregation_channels: Sequence[int] = (16, 32, 48)
    aggregation_blocks_num: Sequence[int] = (2, 2, 2)
    regression_topk: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    @pin_impl3d("native", "native")
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        left, right = data["left"], data["right"]
        b, h, w, _ = left.shape

        trunk = MobileNetV2Features(stem_act=False, dtype=self.dtype,
                                    name="trunk")
        up = FeatUp(dtype=self.dtype, name="up")
        extract = lambda x: up(trunk(x, train=train)[1:], train=train)  # noqa: E731
        if train:
            feats_l = extract(left)
            feats_r = extract(right)
        else:
            feats_l, feats_r = siamese(extract, left, right)

        sp0, sp1 = self.spixel_branch_channels
        stem_2a = BasicConvBN(sp0, 3, 2, dtype=self.dtype, name="stem_2a")
        stem_2b = BasicConvBN(sp0, 3, 1, relu=False, dtype=self.dtype, name="stem_2b")
        stem_4a = BasicConvBN(sp1, 3, 2, dtype=self.dtype, name="stem_4a")
        stem_4b = BasicConvBN(sp1, 3, 1, relu=False, dtype=self.dtype, name="stem_4b")
        stem_2 = lambda x: nn.relu(stem_2b(stem_2a(x, train=train), train=train))  # noqa: E731
        stem_4 = lambda x: nn.relu(stem_4b(stem_4a(x, train=train), train=train))  # noqa: E731

        stem_2x = stem_2(left)
        stem_4x = stem_4(stem_2x)
        stem_2y = stem_2(right)
        stem_4y = stem_4(stem_2y)
        feats_l[0] = jnp.concatenate([feats_l[0], stem_4x], axis=-1)  # 96c
        feats_r[0] = jnp.concatenate([feats_r[0], stem_4y], axis=-1)

        # attention cost volume: cosine similarity of projected descriptors
        # (reference coex_cost_processor.py:38-66)
        hidden = 48
        conv = BasicConvBN(hidden, 3, 1, dtype=self.dtype, name="cv_conv")
        desc = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="cv_desc")
        x_ = desc(conv(feats_l[0], train=train))
        y_ = desc(conv(feats_r[0], train=train))
        if self.matching_weighted:
            wgt = nn.sigmoid(self.param("matching_weights",
                                        nn.initializers.normal(1.0), (hidden,)))
            x_, y_ = x_ * wgt, y_ * wgt
        x_ = x_ / (jnp.linalg.norm(x_, axis=-1, keepdims=True) + 1e-12)
        y_ = y_ / (jnp.linalg.norm(y_, axis=-1, keepdims=True) + 1e-12)
        d4 = self.max_disp // 4
        cost = correlation_volume(x_, y_, d4) * hidden  # sum- not mean-product
        cost = shard_disparity(  # D over mesh 'model' (no-op off-mesh)
            jnp.transpose(cost, (0, 3, 1, 2))[..., None])  # [B,D,H/4,W/4,1]

        # aggregation UNet (reference coex_cost_processor.py:101-240)
        chs = [8] + list(self.aggregation_channels)
        sd = self.aggregation_disp_strides
        cost = BasicConvBN(8, 3, 1, ndim=3, dtype=self.dtype,
                           name="conv_stem")(cost, train=train)
        if self.gce:
            cost = FeatureAtt(8, dtype=self.dtype, name="att_stem")(
                cost, feats_l[0], train=train)

        cost_feat = [cost]
        cur = cost
        for i in range(3):
            for n in range(self.aggregation_blocks_num[i]):
                stride = (sd, 2, 2) if n == 0 else 1
                cur = BasicConvBN(chs[i + 1], 3, stride, ndim=3, dtype=self.dtype,
                                  name=f"down{i}_{n}")(cur, train=train)
            if self.gce:
                cur = FeatureAtt(chs[i + 1], dtype=self.dtype, name=f"att_down{i}")(
                    cur, feats_l[i + 1], train=train)
            cost_feat.append(cur)

        for i in range(3):
            j = 2 - i  # mirror index
            out_ch = 1 if j == 0 else chs[j]
            cur = BasicConvBN(out_ch, 4, (sd, 2, 2), ndim=3, deconv=True,
                              bn=j != 0, relu=j != 0, dtype=self.dtype,
                              name=f"up{j}")(cur, train=train)
            skip = cost_feat[j]
            if cur.shape[1:4] != skip.shape[1:4]:
                cur = jax.image.resize(cur, (*skip.shape[:4], cur.shape[-1]),
                                       method="nearest")
            if j == 0:
                break
            cur = jnp.concatenate([cur, skip], axis=-1)
            cur = BasicConvBN(chs[j], 1, 1, ndim=3, dtype=self.dtype,
                              name=f"skip{j}")(cur, train=train)
            cur = BasicConvBN(chs[j], 3, 1, ndim=3, dtype=self.dtype,
                              name=f"agg{j}a")(cur, train=train)
            cur = BasicConvBN(chs[j], 3, 1, ndim=3, dtype=self.dtype,
                              name=f"agg{j}b")(cur, train=train)
            if self.gce:
                cur = FeatureAtt(chs[j], dtype=self.dtype, name=f"att_up{j}")(
                    cur, feats_l[j], train=train)
        cost = cur[..., 0]  # [B,D,H/4,W/4]

        # superpixel weights (reference coex_disp_processor.py:92-99)
        xspx = BasicConvBN(24, 3, 1, dtype=self.dtype, name="spx_4a")(
            feats_l[0], train=train)
        xspx = nn.relu(BasicConvBN(24, 3, 1, relu=False, dtype=self.dtype,
                                   name="spx_4b")(xspx, train=train))
        xspx = Conv2x(32, deconv=True, norm="batch", dtype=self.dtype,
                      name="spx_2")(xspx, stem_2x, train=train)
        spx = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=self.dtype, name="spx")(xspx)
        spx_pred = nn.softmax(spx.astype(head_dtype(self.dtype)), axis=-1)  # [B,H,W,9]

        # top-k regression (reference coex_disp_processor.py:28-66)
        cost_t = jnp.transpose(cost, (0, 2, 3, 1)).astype(head_dtype(self.dtype))  # [B,H/4,W/4,D]
        k = self.regression_topk
        topv, topi = jax.lax.top_k(cost_t, k)
        prob = nn.softmax(topv, axis=-1)
        disp_4 = jnp.sum(prob * topi.astype(head_dtype(self.dtype)), axis=-1)  # [B,H/4,W/4]

        disp_1 = context_upsample(disp_4 * 4.0, spx_pred)  # [B,H,W]

        out = {"disp_pred": disp_1}
        if train:
            low = resize_bilinear((disp_4 * 4.0)[..., None], (h, w))[..., 0]
            out["disp_preds"] = [disp_1, low]
        return out

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        weights = (1.0, 0.3)
        loss = 0.0
        for p, wgt in zip(pred["disp_preds"], weights):
            loss = loss + wgt * masked_smooth_l1(p, gt, mask)
        loss = loss * 0.77
        return loss, {"loss_disp": loss}
