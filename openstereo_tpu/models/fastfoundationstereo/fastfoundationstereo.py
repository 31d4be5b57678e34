"""FastFoundationStereo — the distilled real-time FoundationStereo student,
TPU-native.

Re-design of the reference FastFoundationStereo
(reference: stereo/modeling/models/fast_foundationstereo/core/
{foundation_stereo.py,extractor.py,submodule.py,update.py}): the same AHCF
cost filtering and selective-GRU refinement as FoundationStereo, but the
frozen DepthAnythingV2 branch is gone — its capacity is distilled into the
EdgeNeXt trunk offline (the `vit_size` config only sets the widened channel
budget, reference extractor.py:46-53), the context net is a light shared-
backbone head (single 1/4 scale, n_gru_layers=1), and iteration counts drop
to 12/8.

The reference ships two CUDA volume builders (`build_gwc_volume_triton`,
`_optimized_pytorch1`) purely to avoid torch's python-loop volume
materialisation; here the builders are the same static-shift jnp
constructions XLA already fuses (ops/cost_volume.py — measured at the HBM
roofline, docs/BENCHMARKS.md), so no kernel-language port is needed.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import context_upsample, disparity_regression, resize_linear_align_corners
from ...parallel.sharding import shard_disparity
from ...registry import MODELS
from ..backbones.dpt import DAV2_CONFIGS
from ..backbones.edgenext import EdgeNeXtFeatures
from ..foundationstereo.blocks import (AHCFHourglass,
                                       BasicSelectiveMultiUpdateBlock,
                                       ChannelAttentionEnhancement, Conv2xFS,
                                       ResnetBasicBlock3D,
                                       SpatialAttentionExtractor)
from ..foundationstereo.foundationstereo import (_FSGRUIteration,
                                                 _l2_normalize,
                                                 build_cosine_gwc_volume,
                                                 build_fs_concat_volume)
from ..igev.blocks import BasicConvBN, Conv2x, FeatureAtt
from ..igev.geometry import CombinedGeoEncodingVolume, lookup_dtype
from ..layers import ConvBlock, head_dtype, siamese
from ..losses import disp_valid_mask, masked_l1, masked_smooth_l1
from ..igev.blocks import BasicConvIN


class FFSFeature(nn.Module):
    """EdgeNeXt trunk + Conv2x_IN decoder, widened 1/4 head (reference
    fast_foundationstereo/core/extractor.py:37-77 — no ViT at inference)."""

    vit_size: str = "vitl"  # sets the distilled channel budget only
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        vit_dim = DAV2_CONFIGS[self.vit_size][0] // 2
        c4, c8, c16, c32 = EdgeNeXtFeatures(dtype=self.dtype, name="trunk")(
            x, train=train)
        # fast Conv2x_IN fuses with a RESIDUAL InstanceNorm block
        # (fast_foundationstereo/core/submodule.py:335-371), same as the
        # FoundationStereo teacher
        y16 = Conv2xFS(160, dtype=self.dtype,
                       name="deconv32_16")(c32, c16, train=train)  # 320c
        y8 = Conv2xFS(96, dtype=self.dtype,
                      name="deconv16_8")(y16, c8, train=train)     # 192c
        y4 = Conv2xFS(48, dtype=self.dtype,
                      name="deconv8_4")(y8, c4, train=train)       # 96c
        y4 = nn.Conv(96 + vit_dim, (1, 1), dtype=self.dtype, name="conv4")(y4)
        return [y4, y8, y16, c32]


class SharedContextNet(nn.Module):
    """Per-scale 3×3 heads over the shared stereo features (reference
    fast_foundationstereo/core/extractor.py:11-25: single 1/4 scale)."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x4):
        net = nn.Conv(self.hidden_dim, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv04_net")(x4)
        inp = nn.Conv(self.hidden_dim, (3, 3), padding="SAME", dtype=self.dtype,
                      name="conv04_inp")(x4)
        return [(net, inp)]


@MODELS.register
class FastFoundationStereo(nn.Module):
    """forward(data) → {'disp_pred', + train: 'init_disp','disp_preds'}."""

    max_disp: int = 192
    vit_size: str = "vitl"
    hidden_dim: int = 128
    volume_dim: int = 28
    cv_groups: int = 8
    concat_channels: int = 24
    n_gru_layers: int = 1
    corr_levels: int = 2
    corr_radius: int = 4
    train_iters: int = 12
    valid_iters: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        left, right = data["left"], data["right"]
        b, h, w, _ = left.shape
        d4 = self.max_disp // 4

        feature = FFSFeature(self.vit_size, dtype=self.dtype, name="feature")
        if train:
            feats_l = feature(left, train=True)
            feats_r = feature(right, train=True)
        else:
            feats_l, feats_r = siamese(lambda x: feature(x, train=False),
                                       left, right)

        stem_2a = BasicConvIN(32, 3, 2, dtype=self.dtype, name="stem_2a")
        stem_2b = ConvBlock(32, 3, norm="instance", act=nn.relu,
                            dtype=self.dtype, name="stem_2b")
        stem_2x = stem_2b(stem_2a(left, train=train), train=train)

        proj = nn.Conv(self.concat_channels // 2, (1, 1), dtype=self.dtype,
                       name="proj_cmb")
        gwc = build_cosine_gwc_volume(feats_l[0], feats_r[0], d4, self.cv_groups)
        cat = build_fs_concat_volume(proj(feats_l[0]), proj(feats_r[0]), d4)
        comb = shard_disparity(jnp.concatenate(
            [gwc.astype(self.dtype), cat], axis=-1))

        comb = nn.Conv(self.volume_dim, (1, 1, 1), dtype=self.dtype,
                       name="corr_stem0")(comb)
        comb = BasicConvBN(self.volume_dim, 3, ndim=3, dtype=self.dtype,
                           name="corr_stem1")(comb, train=train)
        comb = ResnetBasicBlock3D(self.volume_dim, dtype=self.dtype,
                                  name="corr_stem2")(comb, train=train)
        comb = ResnetBasicBlock3D(self.volume_dim, dtype=self.dtype,
                                  name="corr_stem3")(comb, train=train)
        comb = FeatureAtt(self.volume_dim, dtype=self.dtype,
                          name="corr_feature_att")(comb, feats_l[0], train=train)
        comb = AHCFHourglass(self.volume_dim, [f.shape[-1] for f in feats_l],
                             max_disp=self.max_disp, headwise_att=True,
                             dtype=self.dtype,
                             name="cost_agg")(comb, feats_l, train=train)

        cls = BasicConvBN(self.volume_dim // 2, 3, ndim=3, dtype=self.dtype,
                          name="classifier0")(comb, train=train)
        cls = ResnetBasicBlock3D(self.volume_dim // 2, dtype=self.dtype,
                                 name="classifier1")(cls, train=train)
        cost = nn.Conv(1, (7, 7, 7), padding="SAME", dtype=self.dtype,
                       name="classifier2")(cls)
        prob = nn.softmax(cost[..., 0].astype(head_dtype(self.dtype)), axis=1)
        init_disp = disparity_regression(prob, d4, axis=1)

        cnet = SharedContextNet(self.hidden_dim, dtype=self.dtype,
                                name="cnet")(feats_l[0])
        net_list = [jnp.tanh(o[0]) for o in cnet]
        inp_list = [nn.relu(o[1]) for o in cnet]
        # single shared cam/sam across levels (reference fast
        # foundation_stereo.py:142-143, applied per level at :236-238)
        cam = ChannelAttentionEnhancement(self.hidden_dim, dtype=self.dtype,
                                          name="cam")
        inp_list = [cam(x) * x for x in inp_list]
        sam = SpatialAttentionExtractor(dtype=self.dtype, name="sam")
        att = [sam(x) for x in inp_list]

        geo_fn = CombinedGeoEncodingVolume(
            _l2_normalize(feats_l[0].astype(lookup_dtype(self.dtype)), -1),
            _l2_normalize(feats_r[0].astype(lookup_dtype(self.dtype)), -1),
            comb.astype(lookup_dtype(self.dtype)),
            num_levels=self.corr_levels, radius=self.corr_radius)

        bb, h4, w4 = init_disp.shape
        coords = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (bb, h4, w4))

        # reference: Conv2x(32, 32, deconv=True, bn=False) — norm-free
        spx_2_gru = Conv2x(32, deconv=True, norm="none", dtype=self.dtype,
                           name="spx_2_gru")
        spx_gru = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype, name="spx_gru")

        def upsample_disp(disp4, mask_feat, stem):
            y = spx_2_gru(mask_feat, stem, train=train)
            spx = nn.softmax(spx_gru(y).astype(head_dtype(self.dtype)), axis=-1)
            return context_upsample(disp4 * 4.0, spx)

        iters = self.train_iters if train else self.valid_iters
        loop = nn.scan(
            _FSGRUIteration, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=nn.broadcast, length=iters,
        )(hidden_dim=self.hidden_dim, n_gru_layers=self.n_gru_layers,
          radius=self.corr_radius, num_levels=self.corr_levels,
          motion_fuse_kernel=1,  # fast update.py:33 fuses with a 1x1 conv
          dtype=self.dtype, name="gru_loop")
        carry = (tuple(net_list), init_disp[..., None])
        consts = (geo_fn.geo_lookup, geo_fn.corr_lookup,
                  tuple(inp_list), tuple(att), coords)
        carry, (disp_seq, mask_seq) = loop(carry, consts)

        if train:
            n_it = disp_seq.shape[0]
            d = disp_seq.reshape(n_it * bb, h4, w4)
            m = mask_seq.reshape(n_it * bb, h4, w4, mask_seq.shape[-1])
            s = jnp.tile(stem_2x, (n_it, 1, 1, 1))
            ups = upsample_disp(d, m, s).reshape(n_it, bb, h, w)
            return {
                "disp_pred": ups[-1],
                "disp_preds": [ups[i] for i in range(n_it)],
                "init_disp": resize_linear_align_corners(
                    init_disp[..., None], (h, w), axes=(1, 2))[..., 0] * 4.0,
            }
        disp_up = upsample_disp(carry[1][..., 0], mask_seq[-1], stem_2x)
        return {"disp_pred": disp_up}

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        loss = masked_smooth_l1(pred["init_disp"], gt, mask)
        preds = pred["disp_preds"]
        n = len(preds)
        gamma = 0.9 ** (15.0 / max(n - 1, 1))
        for i, p in enumerate(preds):
            loss = loss + (gamma ** (n - i - 1)) * masked_l1(p, gt, mask)
        return loss, {"loss_disp": loss}
