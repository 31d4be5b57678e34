"""AANet — adaptive multi-scale aggregation with deformable convs, TPU-native.

Re-design of the reference AANet
(reference: stereo/modeling/models/aanet/{aanet.py,submodule.py} + the CUDA
deformable-conv extension, SURVEY.md §2.9):

- ResNet-40 trunk with a stride-3 stem (features at 1/3, 1/6, 1/12) and
  deformable bottlenecks in the last stage; FPN neck (128ch);
- correlation-volume pyramid (D/3, D/6, D/12 — D-as-channels 2D volumes);
- 6 stacked Adaptive Aggregation Modules: intra-scale (deformable simple
  bottlenecks on the volume; `ops.modulated_deform_conv` gather+matmul op
  replaces the CUDA kernels) + HRNet-style cross-scale fusion;
- soft-argmax per scale; two StereoDRNet refinements (1/3 → 1/2… here ×2 to
  full res via NUM_DOWNSAMPLE=2);
- loss: multi-scale smooth-L1 with bilinear-upscaled (and value-scaled)
  predictions, weights [1/3, 2/3, 1, 1, 1] (reference aanet.py:116-133).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import correlation_volume, disparity_regression, resize_linear_torch
from ...ops.sampler import bilinear_sampler
from ...ops.deform_conv import modulated_deform_conv
from ...registry import MODELS
from ..layers import ConvBlock, leaky_relu, head_dtype, siamese
from ..losses import disp_valid_mask, masked_smooth_l1


class DeformConv2d(nn.Module):
    """Offset/mask-predicting modulated deformable conv layer
    (reference submodule.py:199-270)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 2
    deformable_groups: int = 2
    double_mask: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, dg = self.kernel_size, self.deformable_groups
        kk = k * k
        # torch-symmetric padding p=dilation (XLA SAME pads asymmetrically
        # at stride 2 — a half-pixel shift vs the reference offset conv)
        pad = self.dilation * (k - 1) // 2
        om = nn.Conv(dg * 3 * kk, (k, k), strides=(self.strides,) * 2,
                     kernel_dilation=(self.dilation,) * 2,
                     padding=[(pad, pad)] * 2,
                     feature_group_count=dg, use_bias=True,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="offset_conv")(x)
        offset = om[..., : dg * 2 * kk]
        mask = nn.sigmoid(om[..., dg * 2 * kk :])
        if self.double_mask:
            mask = mask * 2.0
        weights = self.param(
            "kernel", nn.initializers.he_normal(), (k, k, x.shape[-1], self.features))
        return modulated_deform_conv(
            x, offset, mask, weights.astype(self.dtype), stride=self.strides,
            dilation=self.dilation, deformable_groups=dg)


class Bottleneck(nn.Module):
    """ResNet bottleneck ×4 expansion; optional deformable 3×3
    (reference submodule.py:272-314 + torchvision Bottleneck)."""

    planes: int
    strides: int = 1
    expansion: int = 4
    deform: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        width = self.planes
        out_ch = self.planes * self.expansion
        y = ConvBlock(width, 1, norm="batch", act=nn.relu, dtype=self.dtype,
                      name="conv1")(x, train=train)
        if self.deform:
            y = DeformConv2d(width, strides=self.strides, dilation=2,
                             dtype=self.dtype, name="conv2")(y)
            use_ra = (not train) or (not self.is_mutable_collection("batch_stats"))
            y = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                             dtype=self.dtype, name="bn2")(y)
            y = nn.relu(y)
        else:
            y = ConvBlock(width, 3, strides=self.strides, norm="batch", act=nn.relu,
                          dtype=self.dtype, name="conv2")(y, train=train)
        y = ConvBlock(out_ch, 1, norm="batch", dtype=self.dtype,
                      name="conv3")(y, train=train)
        if self.strides != 1 or x.shape[-1] != out_ch:
            x = ConvBlock(out_ch, 1, strides=self.strides, norm="batch",
                          dtype=self.dtype, name="downsample")(x, train=train)
        return nn.relu(x + y)


class SimpleBottleneck(nn.Module):
    """Bottleneck without channel expansion; optional deformable 3×3
    (reference submodule.py:316-410)."""

    planes: int
    deform: bool = False
    mdconv_dilation: int = 2
    deformable_groups: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        width = self.planes
        y = ConvBlock(width, 1, norm="batch", act=nn.relu, dtype=self.dtype,
                      name="conv1")(x, train=train)
        if self.deform:
            y = DeformConv2d(width, dilation=self.mdconv_dilation,
                             deformable_groups=self.deformable_groups,
                             dtype=self.dtype, name="conv2")(y)
            use_ra = (not train) or (not self.is_mutable_collection("batch_stats"))
            y = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                             dtype=self.dtype, name="bn2")(y)
            y = nn.relu(y)
        else:
            y = ConvBlock(width, 3, norm="batch", act=nn.relu, dtype=self.dtype,
                          name="conv2")(y, train=train)
        y = ConvBlock(self.planes, 1, norm="batch", dtype=self.dtype,
                      name="conv3")(y, train=train)
        return nn.relu(x + y)


class AANetFeature(nn.Module):
    """ResNet-40 with stride-3 stem → [1/3 128c, 1/6 256c, 1/12 512c]
    (reference submodule.py:114-196)."""

    feature_mdconv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = 32
        x = ConvBlock(c, 7, strides=3, norm="batch", act=nn.relu,
                      dtype=self.dtype, name="stem")(x, train=train)
        for i in range(3):
            x = Bottleneck(c, dtype=self.dtype, name=f"layer1_{i}")(x, train=train)
        l1 = x
        for i in range(4):
            x = Bottleneck(c * 2, strides=2 if i == 0 else 1, dtype=self.dtype,
                           name=f"layer2_{i}")(x, train=train)
        l2 = x
        for i in range(6):
            x = Bottleneck(c * 4, strides=2 if i == 0 else 1,
                           deform=self.feature_mdconv, dtype=self.dtype,
                           name=f"layer3_{i}")(x, train=train)
        return [l1, l2, x]


class FPN(nn.Module):
    """Lateral 1×1 + top-down nearest + 3×3 fuse (reference submodule.py:412-462)."""

    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], *, train: bool = False):
        laterals = [nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                            name=f"lateral{i}")(f) for i, f in enumerate(feats)]
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            up = up[:, : laterals[i - 1].shape[1], : laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        return [ConvBlock(self.out_channels, 3, norm="batch", act=nn.relu,
                          dtype=self.dtype, name=f"fpn{i}")(l, train=train)
                for i, l in enumerate(laterals)]


class AdaptiveAggregationModule(nn.Module):
    """ISA (deform bottlenecks on D-as-channels volumes) + CSA fusion
    (reference submodule.py:538-628)."""

    num_scales: int
    num_out_branches: int
    max_disp: int  # at 1/3
    num_blocks: int = 1
    simple_bottleneck: bool = False
    mdconv_dilation: int = 2
    deformable_groups: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, volumes: List[jnp.ndarray], *, train: bool = False):
        volumes = list(volumes)
        for i in range(self.num_scales):
            d = self.max_disp // (2 ** i)
            for j in range(self.num_blocks):
                volumes[i] = SimpleBottleneck(
                    d, deform=not self.simple_bottleneck,
                    mdconv_dilation=self.mdconv_dilation,
                    deformable_groups=self.deformable_groups, dtype=self.dtype,
                    name=f"branch{i}_{j}")(volumes[i], train=train)

        if self.num_scales == 1:
            return volumes

        fused = []
        for i in range(self.num_out_branches):
            di = self.max_disp // (2 ** i)
            acc = None
            for j in range(self.num_scales):
                v = volumes[j]
                if i == j:
                    ex = v
                elif i < j:  # upsample coarser branch
                    ex = ConvBlock(di, 1, norm="batch", dtype=self.dtype,
                                   name=f"fuse{i}_{j}")(v, train=train)
                else:  # downsample finer branch by strided convs
                    ex = v
                    dj = self.max_disp // (2 ** j)
                    for s in range(i - j - 1):
                        ex = ConvBlock(dj, 3, strides=2, norm="batch",
                                       act=leaky_relu(0.2), dtype=self.dtype,
                                       name=f"fuse{i}_{j}_{s}")(ex, train=train)
                    ex = ConvBlock(di, 3, strides=2, norm="batch", dtype=self.dtype,
                                   name=f"fuse{i}_{j}_last")(ex, train=train)
                if ex.shape[1:3] != volumes[i].shape[1:3]:
                    ex = resize_linear_torch(ex, volumes[i].shape[1:3], (1, 2))
                acc = ex if acc is None else acc + ex
            fused.append(nn.leaky_relu(acc, 0.2))
        return fused


class StereoNetRefinement(nn.Module):
    """Edge-aware residual refinement from StereoNet — upsample, concat the
    left image, dilated residual blocks, ReLU'd residual add (reference
    disp_refinement/disp_refinement.py:32-74). AANet's alternate
    REFINEMENT_TYPE; unlike StereoDRNet it never warps the right view."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, low_disp, left_img, right_img=None, *, train: bool = False):
        h, w = left_img.shape[1], left_img.shape[2]
        scale = w / low_disp.shape[2]
        if scale == 1.0:
            disp = low_disp
        else:
            # torch F.interpolate(bilinear, align_corners=False): no
            # antialiasing (jax.image.resize would widen the kernel)
            disp = resize_linear_torch(low_disp[..., None], (h, w),
                                       (1, 2))[..., 0] * scale

        x = jnp.concatenate([disp[..., None], left_img], axis=-1)  # [B,H,W,4]
        y = ConvBlock(32, 3, norm="batch", act=leaky_relu(0.2), dtype=self.dtype,
                      name="conv")(x, train=train)
        # dilated BasicBlocks run LeakyReLU(0.2) mid AND post-add
        # (reference submodule.py:33-66, leaky_relu=True default)
        for bi, dil in enumerate((1, 2, 4, 8, 1, 1)):
            r = ConvBlock(32, 3, dilation=dil, norm="batch",
                          act=leaky_relu(0.2),
                          dtype=self.dtype, name=f"dil{bi}a")(y, train=train)
            r = ConvBlock(32, 3, dilation=dil, norm="batch", dtype=self.dtype,
                          name=f"dil{bi}b")(r, train=train)
            y = nn.leaky_relu(y + r, 0.2)
        res = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                      name="final")(y)[..., 0]
        return nn.relu(disp + res)


class StereoDRNetRefinement(nn.Module):
    """Warp-error residual refinement (reference submodule.py:717-790)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, low_disp, left_img, right_img, *, train: bool = False):
        h, w = left_img.shape[1], left_img.shape[2]
        scale = w / low_disp.shape[2]
        if scale == 1.0:
            disp = low_disp
        else:
            # torch F.interpolate(bilinear, align_corners=False): no
            # antialiasing (jax.image.resize would widen the kernel)
            disp = resize_linear_torch(low_disp[..., None], (h, w),
                                       (1, 2))[..., 0] * scale

        # reference disp_warp (submodule.py:770-790): grid normalised with
        # 2x/(W-1)-1 through grid_sample's default align_corners=False and
        # BORDER padding → effective source (x-d)·W/(W-1) - 0.5, y·H/(H-1)
        # - 0.5, clamped — kept exactly (clamping coords = border mode)
        bh, bw = left_img.shape[1], left_img.shape[2]
        xs = jnp.arange(bw, dtype=disp.dtype)[None, None, :]
        ys = jnp.arange(bh, dtype=disp.dtype)[None, :, None]
        sx = jnp.clip((xs - disp) * (bw / max(bw - 1, 1)) - 0.5, 0.0, bw - 1)
        sy = jnp.clip((ys * (bh / max(bh - 1, 1)) - 0.5)
                      + jnp.zeros_like(disp), 0.0, bh - 1)
        warped = bilinear_sampler(right_img, jnp.stack([sx, sy], axis=-1))
        error = warped - left_img
        c1 = ConvBlock(16, 3, norm="batch", act=leaky_relu(0.2), dtype=self.dtype,
                       name="conv1")(jnp.concatenate([error, left_img], -1), train=train)
        c2 = ConvBlock(16, 3, norm="batch", act=leaky_relu(0.2), dtype=self.dtype,
                       name="conv2")(disp[..., None], train=train)
        y = jnp.concatenate([c1, c2], axis=-1)
        # dilated BasicBlocks run LeakyReLU(0.2) mid AND post-add
        # (reference submodule.py:33-66, leaky_relu=True default)
        for bi, dil in enumerate((1, 2, 4, 8, 1, 1)):
            r = ConvBlock(32, 3, dilation=dil, norm="batch",
                          act=leaky_relu(0.2),
                          dtype=self.dtype, name=f"dil{bi}a")(y, train=train)
            r = ConvBlock(32, 3, dilation=dil, norm="batch", dtype=self.dtype,
                          name=f"dil{bi}b")(r, train=train)
            y = nn.leaky_relu(y + r, 0.2)
        res = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                      name="final")(y)[..., 0]
        return nn.relu(disp + res)


@MODELS.register
class AANet(nn.Module):
    """forward(data) → {'disp_pred', 'disp_preds' (train: 5 scales)}."""

    max_disp: int = 192
    num_scales: int = 3
    num_fusions: int = 6
    num_stage_blocks: int = 1
    num_deform_blocks: int = 2
    mdconv_dilation: int = 2
    deformable_groups: int = 2
    num_downsample: int = 2
    no_feature_mdconv: bool = False
    refinement_type: str = "stereodrnet"  # or 'stereonet' (reference aanet.py:10)
    dtype: Any = jnp.float32
    loss_weights: Sequence[float] = (1 / 3, 2 / 3, 1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        left, right = data["left"], data["right"]
        d3 = self.max_disp // 3

        trunk = AANetFeature(not self.no_feature_mdconv, dtype=self.dtype, name="trunk")
        fpn = FPN(128, dtype=self.dtype, name="fpn")
        extract = lambda x: fpn(trunk(x, train=train), train=train)  # noqa: E731
        if train:
            feats_l = extract(left)
            feats_r = extract(right)
        else:
            feats_l, feats_r = siamese(extract, left, right)

        volumes = [correlation_volume(fl, fr, d3 // (2 ** s))
                   for s, (fl, fr) in enumerate(zip(feats_l, feats_r))]

        for i in range(self.num_fusions):
            n_out = self.num_scales
            simple = i < self.num_fusions - self.num_deform_blocks
            volumes = AdaptiveAggregationModule(
                self.num_scales, n_out, d3, self.num_stage_blocks, simple,
                self.mdconv_dilation, self.deformable_groups, dtype=self.dtype,
                name=f"fusion{i}")(volumes, train=train)

        volumes = [nn.Conv(d3 // (2 ** i), (1, 1), dtype=self.dtype,
                           name=f"final_conv{i}")(v)
                   for i, v in enumerate(volumes)]

        # coarse→fine soft-argmax pyramid (1/12, 1/6, 1/3)
        disp_pyramid = []
        for i in range(len(volumes) - 1, -1, -1):
            prob = nn.softmax(volumes[i].astype(head_dtype(self.dtype)), axis=-1)
            disp_pyramid.append(disparity_regression(prob, volumes[i].shape[-1]))

        disp = disp_pyramid[-1]
        for i in range(self.num_downsample):
            scale = 1.0 / (2 ** (self.num_downsample - i - 1))
            if scale == 1.0:
                li, ri = left, right
            else:
                hw = (int(left.shape[1] * scale), int(left.shape[2] * scale))
                li = resize_linear_torch(left, hw, (1, 2))
                ri = resize_linear_torch(right, hw, (1, 2))
            refine_cls = (StereoDRNetRefinement
                          if self.refinement_type == "stereodrnet"
                          else StereoNetRefinement)
            disp = refine_cls(dtype=self.dtype, name=f"refine{i}")(
                disp, li, ri, train=train)
            disp_pyramid.append(disp)

        out = {"disp_pred": disp_pyramid[-1]}
        if train:
            out["disp_preds"] = disp_pyramid
        return out

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"]
        h, w = gt.shape[1], gt.shape[2]
        mask = disp_valid_mask(gt, self.max_disp)
        loss = 0.0
        for p, wgt in zip(pred["disp_preds"], self.loss_weights):
            scale = w / p.shape[2]
            if scale != 1.0:
                p = resize_linear_torch(p[..., None], (h, w),
                                        (1, 2))[..., 0] * scale
            loss = loss + wgt * masked_smooth_l1(p, gt, mask)
        return loss, {"loss_disp": loss}
