"""GwcNet — group-wise correlation + stacked 3D hourglass, TPU-native.

Re-design of the reference GwcNet
(reference: stereo/modeling/models/gwcnet/{gwcnet.py,gwcnet_backbone.py,
gwcnet_cost_processor.py,gwcnet_disp_processor.py,hourglass.py}) in flax.linen
with NDHWC volumes:

- dilated-residual backbone; gwc features = concat(l2,l3,l4) (320ch), optional
  12-ch concat features;
- volume = gwc(40 groups) [⧺ concat] at D/4 → [B, D/4, H/4, W/4, 40(+24)];
- pre-hourglass 3D convs + 3 unshared hourglasses with redir skips;
- 4 supervision heads (training), trilinear align_corners=False upsample;
  eval computes only head 3. Loss weights [0.5, 0.5, 0.7, 1.0]
  (reference gwcnet.py:46).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import build_concat_volume, build_gwc_volume, disparity_regression
from ...parallel.sharding import shard_disparity
from ...registry import MODELS
from ..layers import ConvBlock, DeconvBlock, head_dtype, pin_impl3d, siamese
from ..losses import disp_valid_mask, masked_smooth_l1
from ..psmnet.psmnet import ResBlock


class GwcBackbone(nn.Module):
    """Residual trunk; gwc_feature = concat(l2,l3,l4) 320ch at 1/4
    (reference gwcnet_backbone.py:38-92)."""

    concat_feature: bool = True
    concat_channels: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(3):
            x = ConvBlock(32, 3, strides=2 if i == 0 else 1, norm="batch",
                          act=nn.relu, dtype=self.dtype, name=f"firstconv{i}")(x, train=train)
        for i in range(3):
            x = ResBlock(32, dtype=self.dtype, name=f"layer1_{i}")(x, train=train)
        x = ResBlock(64, strides=2, dtype=self.dtype, name="layer2_0")(x, train=train)
        for i in range(1, 16):
            x = ResBlock(64, dtype=self.dtype, name=f"layer2_{i}")(x, train=train)
        l2 = x
        for i in range(3):
            x = ResBlock(128, dtype=self.dtype, name=f"layer3_{i}")(x, train=train)
        l3 = x
        for i in range(3):
            x = ResBlock(128, dilation=2, dtype=self.dtype, name=f"layer4_{i}")(x, train=train)
        l4 = x

        gwc_feature = jnp.concatenate([l2, l3, l4], axis=-1)  # 320ch
        out = {"gwc_feature": gwc_feature}
        if self.concat_feature:
            c = ConvBlock(128, 3, norm="batch", act=nn.relu, dtype=self.dtype,
                          name="lastconv0")(gwc_feature, train=train)
            out["concat_feature"] = ConvBlock(
                self.concat_channels, 1, use_bias=False, dtype=self.dtype,
                name="lastconv1")(c, train=train)
        return out


class GwcHourglass(nn.Module):
    """Unshared hourglass with redir skips (reference hourglass.py:19-57)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # (`train` is positional so nn.remat can mark it static)
        c = self.features
        conv1 = ConvBlock(c * 2, 3, strides=2, norm="batch", act=nn.relu, ndim=3,
                          dtype=self.dtype, name="conv1")(x, train=train)
        conv2 = ConvBlock(c * 2, 3, norm="batch", act=nn.relu, ndim=3,
                          dtype=self.dtype, name="conv2")(conv1, train=train)
        conv3 = ConvBlock(c * 4, 3, strides=2, norm="batch", act=nn.relu, ndim=3,
                          dtype=self.dtype, name="conv3")(conv2, train=train)
        conv4 = ConvBlock(c * 4, 3, norm="batch", act=nn.relu, ndim=3,
                          dtype=self.dtype, name="conv4")(conv3, train=train)
        up5 = DeconvBlock(c * 2, 3, 2, norm="batch", ndim=3, dtype=self.dtype,
                          name="conv5")(conv4, train=train)
        redir2 = ConvBlock(c * 2, 1, norm="batch", ndim=3, dtype=self.dtype,
                           name="redir2")(conv2, train=train)
        conv5 = nn.relu(up5 + redir2)
        up6 = DeconvBlock(c, 3, 2, norm="batch", ndim=3, dtype=self.dtype,
                          name="conv6")(conv5, train=train)
        redir1 = ConvBlock(c, 1, norm="batch", ndim=3, dtype=self.dtype,
                           name="redir1")(x, train=train)
        return nn.relu(up6 + redir1)


@MODELS.register
class GwcNet(nn.Module):
    """forward(data) → {'disp_pred', 'disp_preds' (train: 4 heads)}."""

    max_disp: int = 192
    num_groups: int = 40
    use_concat_volume: bool = True
    concat_channels: int = 12
    downsample: int = 4
    dtype: Any = jnp.float32
    head_weights: Sequence[float] = (0.5, 0.5, 0.7, 1.0)
    # MODEL.REMAT: structural activation checkpointing — remat each 3D
    # hourglass and each full-res regression head (see the PSMNet note in
    # ../psmnet/psmnet.py for why whole-forward checkpointing doesn't move
    # this family's peak)
    remat: bool = False

    @nn.compact
    @pin_impl3d("native", "native")
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        backbone = GwcBackbone(self.use_concat_volume, self.concat_channels,
                               dtype=self.dtype, name="backbone")
        if train:
            feat_l = backbone(data["left"], train=True)
            feat_r = backbone(data["right"], train=True)
        else:
            feat_l, feat_r = siamese(lambda x: backbone(x, train=False),
                                     data["left"], data["right"])

        d4 = self.max_disp // self.downsample
        volume = build_gwc_volume(feat_l["gwc_feature"], feat_r["gwc_feature"],
                                  d4, self.num_groups)
        if self.use_concat_volume:
            cat_vol = build_concat_volume(feat_l["concat_feature"],
                                          feat_r["concat_feature"], d4)
            volume = jnp.concatenate([volume, cat_vol], axis=-1)
        volume = shard_disparity(volume)  # split D over the mesh 'model' axis

        c = 32
        cost0 = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name="dres0a")(volume, train=train)
        cost0 = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name="dres0b")(cost0, train=train)
        res = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                        name="dres1a")(cost0, train=train)
        res = ConvBlock(c, 3, norm="batch", ndim=3, dtype=self.dtype,
                        name="dres1b")(res, train=train)
        cost0 = res + cost0

        # static_argnums: 0 is the module itself, 2 is the `train` bool
        HG = nn.remat(GwcHourglass, static_argnums=(2,)) if self.remat \
            else GwcHourglass
        out1 = HG(c, dtype=self.dtype, name="dres2")(cost0, train)
        out2 = HG(c, dtype=self.dtype, name="dres3")(out1, train)
        out3 = HG(c, dtype=self.dtype, name="dres4")(out2, train)

        h, w = data["left"].shape[1], data["left"].shape[2]
        b = data["left"].shape[0]

        def classify(x, name):
            x = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name=f"{name}a")(x, train=train)
            return ConvBlock(1, 3, ndim=3, dtype=self.dtype, name=f"{name}b")(x, train=train)

        def regress(cost):
            cost = cost[..., 0].astype(head_dtype(self.dtype))  # [B, D/4, H/4, W/4]
            # trilinear align_corners=False = half-pixel-center linear resize
            cost = jax.image.resize(cost, (b, self.max_disp, h, w), method="trilinear")
            prob = nn.softmax(cost, axis=1)
            return disparity_regression(prob, self.max_disp, axis=1)

        if self.remat:
            # recompute full-res cost/softmax in backward instead of keeping
            # two [B,D,H,W] tensors per supervision head
            regress = jax.checkpoint(
                regress, policy=jax.checkpoint_policies.nothing_saveable)

        disp3 = regress(classify(out3, "classif3"))
        out = {"disp_pred": disp3}
        if train:
            out["disp_preds"] = [
                regress(classify(cost0, "classif0")),
                regress(classify(out1, "classif1")),
                regress(classify(out2, "classif2")),
                disp3,
            ]
        return out

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        loss = 0.0
        for p, wgt in zip(pred["disp_preds"], self.head_weights):
            loss = loss + wgt * masked_smooth_l1(p, gt, mask)
        return loss, {"loss_disp": loss}
