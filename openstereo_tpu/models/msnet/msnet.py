"""MobileStereoNet 2D / 3D, TPU-native.

Re-design of the reference MSNet
(reference: stereo/modeling/models/msnet/{MSNet2D.py,MSNet3D.py,submodule.py}):

- shared mobile feature trunk (MobileV2 stem + MobileV1 residual stages,
  concat(l2,l3,l4) = 320ch at 1/4);
- **MSNet3D**: 40-group gwc volume → MobileV2-residual 3D aggregation +
  3 hourglass3D; 4 heads, weights [0.5,0.5,0.7,1.0];
- **MSNet2D**: *interlaced volume* — per shift, interleave L/R descriptors
  and compress the 64-channel interleave with a shared strided 3D conv stack
  into a scalar, giving a 2D-aggregatable [B,H/4,W/4,D] volume
  (reference MSNet2D.py:137-156). On TPU all D shifts are batched through
  the shared compressor in one pass (shift-stack along batch) instead of a
  Python loop of D separate convolutions;
- trilinear (half-pixel) upsample of cost maps + soft-argmax.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import build_gwc_volume, disparity_regression
from ...registry import MODELS
from ...parallel.sharding import shard_disparity
from ..layers import (
    ConvBlock,
    DeconvBlock,
    MobileV1Residual,
    MobileV2Residual,
    MobileV2Residual3D,
    head_dtype,
    siamese,
)
from ..losses import disp_valid_mask, masked_smooth_l1


class MobileFeatureTrunk(nn.Module):
    """MobileV2 stem + V1 residual stages → concat 320ch at 1/4
    (reference submodule.py:183-234)."""

    add_relus: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i, s in enumerate((2, 1, 1)):
            x = MobileV2Residual(32, strides=s, expanse_ratio=3, dtype=self.dtype,
                                 name=f"firstconv{i}")(x, train=train)
            if self.add_relus:
                x = nn.relu(x)
        for i in range(3):
            x = MobileV1Residual(32, dtype=self.dtype, name=f"layer1_{i}")(x, train=train)
        x = MobileV1Residual(64, strides=2, dtype=self.dtype, name="layer2_0")(x, train=train)
        for i in range(1, 16):
            x = MobileV1Residual(64, dtype=self.dtype, name=f"layer2_{i}")(x, train=train)
        l2 = x
        for i in range(3):
            x = MobileV1Residual(128, dtype=self.dtype, name=f"layer3_{i}")(x, train=train)
        l3 = x
        for i in range(3):
            x = MobileV1Residual(128, dilation=2, dtype=self.dtype,
                                 name=f"layer4_{i}")(x, train=train)
        l4 = x
        return jnp.concatenate([l2, l3, l4], axis=-1)  # 320


class Hourglass2D(nn.Module):
    """MobileV2-residual 2D hourglass (reference MSNet2D.py:10-46)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.features
        mv2 = lambda f, s, name: MobileV2Residual(  # noqa: E731
            f, strides=s, expanse_ratio=2, dtype=self.dtype, name=name)
        conv1 = mv2(c * 2, 2, "conv1")(x, train=train)
        conv2 = mv2(c * 2, 1, "conv2")(conv1, train=train)
        conv3 = mv2(c * 4, 2, "conv3")(conv2, train=train)
        conv4 = mv2(c * 4, 1, "conv4")(conv3, train=train)
        up5 = DeconvBlock(c * 2, 3, 2, norm="batch", dtype=self.dtype,
                          name="conv5")(conv4, train=train)
        conv5 = nn.relu(up5 + mv2(c * 2, 1, "redir2")(conv2, train=train))
        up6 = DeconvBlock(c, 3, 2, norm="batch", dtype=self.dtype,
                          name="conv6")(conv5, train=train)
        return nn.relu(up6 + mv2(c, 1, "redir1")(x, train=train))


class Hourglass3DMobile(nn.Module):
    """MobileV2-residual 3D hourglass (reference MSNet3D.py:10-46)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = self.features
        mv2 = lambda f, s, name: MobileV2Residual3D(  # noqa: E731
            f, strides=s, expanse_ratio=2, dtype=self.dtype, name=name)
        conv1 = mv2(c * 2, 2, "conv1")(x, train=train)
        conv2 = mv2(c * 2, 1, "conv2")(conv1, train=train)
        conv3 = mv2(c * 4, 2, "conv3")(conv2, train=train)
        conv4 = mv2(c * 4, 1, "conv4")(conv3, train=train)
        # impl3d="native": these deconvs sit between MobileV2Residual3D
        # stacks whose convs use XLA's native NDHWC layout — the tap-merged
        # path would relayout at each boundary (measured 89 ms vs 81 ms)
        up5 = DeconvBlock(c * 2, 3, 2, norm="batch", ndim=3, impl3d="native",
                          dtype=self.dtype, name="conv5")(conv4, train=train)
        conv5 = nn.relu(up5 + mv2(c * 2, 1, "redir2")(conv2, train=train))
        up6 = DeconvBlock(c, 3, 2, norm="batch", ndim=3, impl3d="native",
                          dtype=self.dtype, name="conv6")(conv5, train=train)
        return nn.relu(up6 + mv2(c, 1, "redir1")(x, train=train))


@MODELS.register
class MSNet3D(nn.Module):
    """forward(data) → {'disp_pred', 'disp_preds' (train)}."""

    max_disp: int = 192
    num_groups: int = 40
    hourglass_size: int = 32
    dtype: Any = jnp.float32
    head_weights: Sequence[float] = (0.5, 0.5, 0.7, 1.0)

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        trunk = MobileFeatureTrunk(dtype=self.dtype, name="trunk")
        if train:
            feat_l = trunk(data["left"], train=True)
            feat_r = trunk(data["right"], train=True)
        else:
            feat_l, feat_r = siamese(lambda x: trunk(x, train=False),
                                     data["left"], data["right"])

        d4 = self.max_disp // 4
        volume = shard_disparity(  # D over mesh 'model' (no-op off-mesh)
            build_gwc_volume(feat_l, feat_r, d4, self.num_groups))

        c = self.hourglass_size
        mv2 = lambda name: MobileV2Residual3D(  # noqa: E731
            c, expanse_ratio=3, dtype=self.dtype, name=name)
        cost0 = mv2("dres0a")(volume, train=train)
        cost0 = mv2("dres0b")(cost0, train=train)
        res = mv2("dres1a")(cost0, train=train)
        res = mv2("dres1b")(res, train=train)
        cost0 = res + cost0

        out1 = Hourglass3DMobile(c, dtype=self.dtype, name="hg1")(cost0, train=train)
        out2 = Hourglass3DMobile(c, dtype=self.dtype, name="hg2")(out1, train=train)
        out3 = Hourglass3DMobile(c, dtype=self.dtype, name="hg3")(out2, train=train)

        b, h, w = data["left"].shape[0], data["left"].shape[1], data["left"].shape[2]

        def classify(x, name):
            x = ConvBlock(c, 3, norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name=f"{name}a")(x, train=train)
            return ConvBlock(1, 3, ndim=3, dtype=self.dtype, name=f"{name}b")(x, train=train)

        def regress(cost):
            cost = cost[..., 0].astype(head_dtype(self.dtype))
            cost = jax.image.resize(cost, (b, self.max_disp, h, w), method="trilinear")
            return disparity_regression(nn.softmax(cost, axis=1), self.max_disp, axis=1)

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


class InterlacedCompressor(nn.Module):
    """Shared 3D-conv stack compressing a 64-channel L/R interleave to a
    scalar matching cost (reference MSNet2D.py:73-84 conv3d+volume11)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, interleaved, col_valid=None, *, train: bool = False):
        """interleaved: [N, H, W, 64]; col_valid: [N, W] bool column validity.

        The reference runs each shift on a width-CROPPED slice, so every conv
        stage sees zero padding at the crop boundary.  With the full-width
        batched formulation the invalid columns must be re-zeroed after every
        stage (bias/BN make them nonzero), or the boundary column diverges
        (reference MSNet2D.py:146-156).
        """
        if col_valid is not None:
            interleaved = jnp.where(
                col_valid[:, None, :, None], interleaved, 0.0)
        x = jnp.transpose(interleaved, (0, 3, 1, 2))[..., None]  # [N,64,H,W,1]
        m3 = None if col_valid is None else col_valid[:, None, None, :, None]
        for f, k, name in ((16, 8, "c0"), (32, 4, "c1"), (16, 2, "c2")):
            x = ConvBlock(f, (k, 3, 3), strides=(k, 1, 1),
                          padding=[(0, 0), (1, 1), (1, 1)], use_bias=True,
                          norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name=name)(x, train=train)
            if m3 is not None:
                x = jnp.where(m3, x, 0.0)
        x = x[:, 0]  # [N, H, W, 16]
        return ConvBlock(1, 1, norm="batch", act=nn.relu, dtype=self.dtype,
                         name="volume11")(x, train=train)[..., 0]


@MODELS.register
class MSNet2D(nn.Module):
    """forward(data) → {'disp_pred', 'disp_preds' (train)}."""

    max_disp: int = 192
    hg_size: int = 48
    dtype: Any = jnp.float32
    head_weights: Sequence[float] = (0.5, 0.5, 0.7, 1.0)

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        trunk = MobileFeatureTrunk(add_relus=True, dtype=self.dtype, name="trunk")
        if train:
            feat_l = trunk(data["left"], train=True)
            feat_r = trunk(data["right"], train=True)
        else:
            feat_l, feat_r = siamese(lambda x: trunk(x, train=False),
                                     data["left"], data["right"])

        # preconv11: 320 → 32 (reference MSNet2D.py:65-71); shared weights for
        # both views, so instantiate once and call twice
        pre_blocks = [ConvBlock(f, 1, norm="batch", act=nn.relu, dtype=self.dtype,
                                name=f"preconv{i}")
                      for i, f in enumerate((256, 128, 64))]
        pre_final = nn.Conv(32, (1, 1), dtype=self.dtype, name="preconv3")

        def preconv(x):
            for blk in pre_blocks:
                x = blk(x, train=train)
            return pre_final(x)

        featL = preconv(feat_l)
        featR = preconv(feat_r)

        bsz, h4, w4, c = featL.shape
        d4 = self.max_disp // 4

        # interlace all shifts, batch through the shared compressor in one
        # pass; per-shift column validity (col >= d) reproduces the
        # reference's width-cropped per-shift computation exactly
        shifts = []
        for d in range(d4):
            r_shift = featR if d == 0 else jnp.pad(featR[:, :, :-d], ((0, 0), (0, 0), (d, 0), (0, 0)))
            inter = jnp.stack([featL, r_shift], axis=-1).reshape(bsz, h4, w4, 2 * c)
            shifts.append(inter)
        stacked = jnp.concatenate(shifts, axis=0)  # [D*B, H, W, 64]
        col_valid = (jnp.arange(w4)[None, :]
                     >= jnp.repeat(jnp.arange(d4), bsz)[:, None])  # [D*B, W]
        planes = InterlacedCompressor(dtype=self.dtype, name="compressor")(
            stacked, col_valid, train=train)  # [D*B, H, W]
        volume = planes.reshape(d4, bsz, h4, w4)
        # zero out-of-frame entries (reference writes only [..., i:])
        wi = jnp.arange(w4)[None, None, None, :]
        di = jnp.arange(d4)[:, None, None, None]
        volume = jnp.where(wi >= di, volume, 0.0)
        volume = jnp.transpose(volume, (1, 2, 3, 0))  # [B, H/4, W/4, D]

        c2 = self.hg_size
        mv2 = lambda name: MobileV2Residual(  # noqa: E731
            c2, expanse_ratio=3, dtype=self.dtype, name=name)
        cost0 = nn.relu(mv2("dres0a")(volume, train=train))
        cost0 = nn.relu(mv2("dres0b")(cost0, train=train))
        res = nn.relu(mv2("dres1a")(cost0, train=train))
        res = mv2("dres1b")(res, train=train)
        cost0 = res + cost0

        out1 = Hourglass2D(c2, dtype=self.dtype, name="hg1")(cost0, train=train)
        out2 = Hourglass2D(c2, dtype=self.dtype, name="hg2")(out1, train=train)
        out3 = Hourglass2D(c2, dtype=self.dtype, name="hg3")(out2, train=train)

        b, h, w = data["left"].shape[0], data["left"].shape[1], data["left"].shape[2]

        def classify(x, name):
            x = ConvBlock(c2, 3, norm="batch", act=nn.relu, dtype=self.dtype,
                          name=f"{name}a")(x, train=train)
            return ConvBlock(c2, 3, dtype=self.dtype, name=f"{name}b")(x, train=train)

        def regress(cost):
            cost = jnp.transpose(cost, (0, 3, 1, 2)).astype(head_dtype(self.dtype))  # [B,D,H/4,W/4]
            cost = jax.image.resize(cost, (b, self.max_disp, h, w), method="trilinear")
            return disparity_regression(nn.softmax(cost, axis=1), self.max_disp, axis=1)

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
