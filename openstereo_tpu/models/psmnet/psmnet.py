"""PSMNet — concat cost volume + stacked 3D hourglass, TPU-native.

Re-design of the reference PSMNet
(reference: stereo/modeling/models/psmnet/{psmnet.py,psmnet_backbone.py,
psmnet_cost_processor.py,psmnet_disp_processor.py}) in flax.linen:

- SPP backbone with dilated residual stages → 32-ch features at 1/4;
- concat volume [B, D/4, H/4, W/4, 64] (NDHWC — channels last so the 3D convs
  contract on the MXU);
- dres0/dres1 + 3 stacked hourglasses with pre/post skip wiring and 3
  supervision heads; cost maps trilinearly upsampled (align_corners=True,
  matmul-based) to [B, D, H, W]; softmax over D + soft-argmax;
- loss: weighted smooth-L1 over the 3 heads, weights [0.5, 0.7, 1.0]
  (reference psmnet.py:36-44).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import build_concat_volume, disparity_regression, resize_linear_align_corners
from ...parallel.sharding import shard_disparity
from ...registry import MODELS
from ..layers import ConvBlock, DeconvBlock, head_dtype, siamese
from ..losses import disp_valid_mask, masked_smooth_l1


class ResBlock(nn.Module):
    """conv-bn-relu + conv-bn with additive skip, no post-activation
    (reference submodule.py:219-243)."""

    features: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = ConvBlock(self.features, 3, strides=self.strides, dilation=self.dilation,
                      norm="batch", act=nn.relu, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvBlock(self.features, 3, dilation=self.dilation, norm="batch",
                      dtype=self.dtype, name="conv2")(y, train=train)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvBlock(self.features, 1, strides=self.strides, norm="batch",
                          dtype=self.dtype, name="downsample")(x, train=train)
        return y + x


class SPPBackbone(nn.Module):
    """PSMNet feature extractor: CNN + spatial pyramid pooling → 32ch at 1/4
    (reference psmnet_backbone.py:7-121)."""

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
        out_4_0 = x
        for i in range(3):
            x = ResBlock(128, dtype=self.dtype, name=f"layer3_{i}")(x, train=train)
        for i in range(3):
            x = ResBlock(128, dilation=2, dtype=self.dtype, name=f"layer4_{i}")(x, train=train)
        out_8 = x

        h, w = out_8.shape[1], out_8.shape[2]
        branches = []
        for i, pool in enumerate((64, 32, 16, 8)):
            # clamp the pooling window to the feature size so small inputs
            # (unit tests, tiny crops) stay valid; identical to the reference
            # at production resolutions where h,w >= 64 at 1/8 scale
            ph, pw = min(pool, h), min(pool, w)
            b = nn.avg_pool(out_8, (ph, pw), strides=(ph, pw))
            b = ConvBlock(32, 1, norm="batch", act=nn.relu, dtype=self.dtype,
                          name=f"branch{i}")(b, train=train)
            b = resize_linear_align_corners(b, (h, w), axes=(1, 2))
            branches.append(b)

        feat = jnp.concatenate([out_4_0, out_8] + branches[::-1], axis=-1)  # 320ch
        feat = ConvBlock(128, 3, norm="batch", act=nn.relu, dtype=self.dtype,
                         name="lastconv0")(feat, train=train)
        feat = ConvBlock(32, 1, use_bias=False, dtype=self.dtype,
                         name="lastconv1")(feat, train=train)
        return feat


class Hourglass3D(nn.Module):
    """Shared-skip 3D hourglass (reference psmnet_cost_processor.py:54-132).

    in [B,D,H,W,C] → (out [.,C], pre [.,2C]@/2, post [.,2C]@/2).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, presqu=None, postsqu=None, train: bool = False):
        # (`train` is positional so nn.remat can mark it static)
        c = self.features
        out = ConvBlock(c * 2, 3, strides=2, norm="batch", act=nn.relu, ndim=3,
                        dtype=self.dtype, name="conv1")(x, train=train)
        pre = ConvBlock(c * 2, 3, norm="batch", ndim=3, dtype=self.dtype,
                        name="conv2")(out, train=train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)

        out = ConvBlock(c * 2, 3, strides=2, norm="batch", act=nn.relu, ndim=3,
                        dtype=self.dtype, name="conv3")(pre, train=train)
        out = ConvBlock(c * 2, 3, norm="batch", act=nn.relu, ndim=3,
                        dtype=self.dtype, name="conv4")(out, train=train)

        up5 = DeconvBlock(c * 2, 3, 2, norm="batch", ndim=3, dtype=self.dtype,
                          name="conv5")(out, train=train)
        post = nn.relu(up5 + (presqu if presqu is not None else pre))
        out = DeconvBlock(c, 3, 2, norm="batch", ndim=3, dtype=self.dtype,
                          name="conv6")(post, train=train)
        return out, pre, post


@MODELS.register
class PSMNet(nn.Module):
    """forward(data) → {'disp_pred': [B,H,W], 'train_preds': [3×[B,H,W]] (train)}."""

    max_disp: int = 192
    dtype: Any = jnp.float32
    head_weights: Sequence[float] = (0.5, 0.7, 1.0)
    # MODEL.REMAT: structural activation checkpointing. A whole-forward
    # jax.checkpoint barely moves PSMNet's peak (the live set inside the
    # hourglass chain and the three full-res regression heads IS the peak;
    # and the align-corners resize lowers to banded matmuls, so
    # 'dots_saveable' pins the ~400 MB upsampled cost tensors). Instead,
    # remat each 3D hourglass and each regression head so backward walks
    # them one at a time. Mirrors the memory role of the reference's
    # torch.utils.checkpoint usage (SURVEY.md §2.12) — the reference never
    # solved this for PSMNet (it simply trains at batch ≤ 4/GPU).
    remat: bool = False

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        backbone = SPPBackbone(dtype=self.dtype, name="backbone")
        if train:
            feat_l = backbone(data["left"], train=True)
            feat_r = backbone(data["right"], train=True)
        else:
            feat_l, feat_r = siamese(lambda x: backbone(x, train=False),
                                     data["left"], data["right"])

        volume = build_concat_volume(feat_l, feat_r, self.max_disp // 4)
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

        # static_argnums: 0 is the module itself, 4 is the `train` bool
        HG = nn.remat(Hourglass3D, static_argnums=(4,)) if self.remat \
            else Hourglass3D
        out1, pre1, post1 = HG(c, dtype=self.dtype, name="dres2")(
            cost0, None, None, train)
        out1 = out1 + cost0
        out2, pre2, post2 = HG(c, dtype=self.dtype, name="dres3")(
            out1, pre1, post1, train)
        out2 = out2 + cost0
        out3, _, _ = HG(c, dtype=self.dtype, name="dres4")(
            out2, pre2, post2, train)
        out3 = out3 + cost0

        def classify(x, name):
            x = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name=f"{name}a")(x, train=train)
            return ConvBlock(1, 3, ndim=3, dtype=self.dtype, name=f"{name}b")(x, train=train)

        cost1 = classify(out1, "classif1")
        cost2 = classify(out2, "classif2") + cost1
        cost3 = classify(out3, "classif3") + cost2

        h, w = data["left"].shape[1], data["left"].shape[2]

        def regress(cost):
            cost = cost[..., 0].astype(head_dtype(self.dtype))  # [B, D/4, H/4, W/4]
            cost = resize_linear_align_corners(cost, (self.max_disp, h, w), axes=(1, 2, 3))
            prob = nn.softmax(cost, axis=1)
            return disparity_regression(prob, self.max_disp, axis=1)  # [B,H,W]

        if self.remat:
            # recompute the full-res cost/softmax from the small [B,D/4,H/4,
            # W/4] input in backward instead of keeping 2×400 MB per head
            regress = jax.checkpoint(
                regress, policy=jax.checkpoint_policies.nothing_saveable)

        disp3 = regress(cost3)
        out = {"disp_pred": disp3}
        if train:
            out["train_preds"] = [regress(cost1), regress(cost2), disp3]
        return out

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        loss = 0.0
        for p, wgt in zip(pred["train_preds"], self.head_weights):
            loss = loss + wgt * masked_smooth_l1(p, gt, mask)
        return loss, {"loss_disp": loss}
