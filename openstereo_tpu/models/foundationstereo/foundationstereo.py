"""FoundationStereo — zero-shot foundation stereo model, TPU-native.

Re-design of the reference FoundationStereo (CVPR 2025)
(reference: stereo/modeling/models/foundationstereo/core/
{foundation_stereo.py,extractor.py,submodule.py,update.py,geometry.py}):

- side-tuning feature extractor: an EdgeNeXt-small CNN trunk fused with
  frozen DepthAnythingV2 (DINOv2 ViT + DPT) monocular-priors features;
- Attentive Hybrid Cost Filtering: cosine group-wise + concat volume →
  reduced (spatial ⊗ disparity) 3D convs + a disparity-axis transformer;
- selective ConvGRU refinement (small/large kernel pair gated by spatial
  attention), driven by the same hat-matrix geometry lookups as IGEV;
- superpixel upsampling.

TPU-first decisions (vs the reference CUDA path):
- the GRU loop is one `nn.scan` — traced once, parameters broadcast;
- geometry lookups are MXU hat-matrix contractions (ops in
  models/igev/geometry.py), not grid_sample gathers;
- the ViT runs on 14×16-lcm-resized inputs computed at trace time (static
  shapes), is marked frozen by `stop_gradient` on its features, and its
  FLOPs overlap the CNN trunk under one jit;
- flash-attention is unnecessary: the disparity transformer's sequence
  length is max_disp/16 ≤ 48, so plain MXU attention fits VMEM.

Weights note (docs/PARITY.md): the reference initialises the ViT from
DepthAnythingV2 checkpoints downloaded from HuggingFace — unavailable in
this zero-egress environment, so training here starts the trunk at random
init; converted checkpoints can be injected via MODEL.PRETRAINED_MODEL.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import (context_upsample, disparity_regression,
                    resize_bicubic_torch, resize_linear_align_corners)
from ...parallel.sharding import shard_disparity
from ...registry import MODELS
from ..backbones.dpt import DAV2_CONFIGS, DepthAnythingV2
from ..backbones.edgenext import EdgeNeXtFeatures
from ..igev.blocks import BasicConvBN, BasicConvIN, Conv2x, FeatureAtt
from ..igev.geometry import CombinedGeoEncodingVolume, lookup_dtype
from ..layers import ConvBlock, head_dtype, siamese
from ..losses import disp_valid_mask, masked_l1, masked_smooth_l1
from .blocks import (AHCFHourglass, BasicSelectiveMultiUpdateBlock,
                     ChannelAttentionEnhancement, ContextNetDino, Conv2xFS,
                     ResnetBasicBlock3D, ResnetBasicBlockIN,
                     SpatialAttentionExtractor)


def _l2_normalize(x, axis, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def build_cosine_gwc_volume(left, right, max_disp: int, num_groups: int):
    """Cosine group-wise correlation volume [B,D,H,W,G]
    (reference submodule.py:422-446: per-group L2-normalised dot product)."""
    b, h, w, c = left.shape
    ln = _l2_normalize(left.reshape(b, h, w, num_groups, c // num_groups), -1)
    rn = _l2_normalize(right.reshape(b, h, w, num_groups, c // num_groups), -1)
    ln = ln.reshape(b, h, w, c)
    rn = rn.reshape(b, h, w, c)
    planes = []
    for d in range(max_disp):
        r_shift = jnp.pad(rn, ((0, 0), (0, 0), (d, 0), (0, 0)))[:, :, :w]
        g = jnp.sum((ln * r_shift).reshape(b, h, w, num_groups, -1), axis=-1)
        mask = (jnp.arange(w) >= d)[None, None, :, None]
        planes.append(jnp.where(mask, g, 0.0))
    return jnp.stack(planes, axis=1)


def build_fs_concat_volume(left, right, max_disp: int):
    """Concat volume with UN-zeroed left half (reference submodule.py:450-461
    keeps refimg_fea at every shift; only the right half is zero-filled)."""
    b, h, w, c = left.shape
    planes = []
    for d in range(max_disp):
        r = jnp.pad(right, ((0, 0), (0, 0), (d, 0), (0, 0)))[:, :, :w]
        mask = (jnp.arange(w) >= d)[None, None, :, None]
        planes.append(jnp.concatenate([left, jnp.where(mask, r, 0.0)], axis=-1))
    return jnp.stack(planes, axis=1)


def resize_keep_aspect(h: int, w: int, divider: int = 112,
                       max_side: int = 1344):
    """Trace-time ViT input size (reference Utils.get_resize_keep_aspect_ratio:
    scale so max side ≤ max_side, round up to the 14·16 lcm)."""
    rnd = lambda x: int(math.ceil(x / divider) * divider)  # noqa: E731
    hr, wr = rnd(h), rnd(w)
    if hr > max_side or wr > max_side:
        if hr > wr:
            wr, hr = rnd(wr * max_side / hr), max_side
        else:
            hr, wr = rnd(hr * max_side / wr), max_side
    return hr, wr


class FSFeature(nn.Module):
    """EdgeNeXt trunk + frozen DAv2 features, Conv2x_IN decoder
    (reference extractor.py:321-369). Returns ([x4,x8,x16,x32], vit_feat)."""

    vit_size: str = "vits"
    freeze_vit: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, _ = x.shape
        vit_dim = DAV2_CONFIGS[self.vit_size][0] // 2

        hr, wr = resize_keep_aspect(h, w)
        x_vit = resize_bicubic_torch(x, (hr, wr), axes=(1, 2))
        vit_feat, _depth = DepthAnythingV2(self.vit_size, dtype=self.dtype,
                                           name="dino")(x_vit)
        if self.freeze_vit:
            vit_feat = jax.lax.stop_gradient(vit_feat)
        vit_feat = resize_linear_align_corners(
            vit_feat, (h // 4, w // 4), axes=(1, 2))

        c4, c8, c16, c32 = EdgeNeXtFeatures(dtype=self.dtype, name="trunk")(
            x, train=train)
        y16 = Conv2xFS(160, dtype=self.dtype,
                       name="deconv32_16")(c32, c16, train=train)   # 320c
        y8 = Conv2xFS(96, dtype=self.dtype,
                      name="deconv16_8")(y16, c8, train=train)      # 192c
        y4 = Conv2xFS(48, dtype=self.dtype,
                      name="deconv8_4")(y8, c4, train=train)        # 96c
        y4 = jnp.concatenate([y4, vit_feat], axis=-1)               # 96+vit_dim
        y4 = BasicConvIN(96 + vit_dim, 3, dtype=self.dtype,
                         name="conv4a")(y4, train=train)
        y4 = ResnetBasicBlockIN(96 + vit_dim, dtype=self.dtype,
                                name="conv4b")(y4, train=train)
        y4 = ResnetBasicBlockIN(96 + vit_dim, dtype=self.dtype,
                                name="conv4c")(y4, train=train)
        return [y4, y8, y16, c32], vit_feat


class _FSGRUIteration(nn.Module):
    """Scanned selective-GRU iteration (reference foundation_stereo.py:246-263)."""

    hidden_dim: int
    n_gru_layers: int
    radius: int
    num_levels: int
    motion_fuse_kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        # static lookups ride a broadcast input, not the carry — scan
        # autodiff stacks per-step carries as backward residuals (iters×
        # the volume memory); broadcast constants are saved once.
        net, disp = carry
        geo_lookup, corr_lookup, inp, att, coords = consts
        disp = jax.lax.stop_gradient(disp)
        r = self.radius
        dx = jnp.arange(-r, r + 1, dtype=disp.dtype)
        scales = [2.0 ** i for i in range(self.num_levels)]
        geo_feats = geo_lookup([disp[..., 0, None] / s + dx for s in scales])
        corr_feats = corr_lookup(
            [(coords - disp[..., 0])[..., None] / s + dx for s in scales])
        feats = []
        for g, c_ in zip(geo_feats, corr_feats):
            feats.extend([g, c_])
        geo_feat = jnp.concatenate(feats, axis=-1)

        net, mask_feat, delta = BasicSelectiveMultiUpdateBlock(
            self.hidden_dim, self.n_gru_layers, self.motion_fuse_kernel,
            dtype=self.dtype,
            name="update_block")(list(net), inp, geo_feat, disp, att)
        disp = disp + delta
        return (tuple(net), disp), (disp[..., 0], mask_feat)


@MODELS.register
class FoundationStereo(nn.Module):
    """forward(data) → {'disp_pred', + train: 'init_disp','disp_preds'}.

    Expects ImageNet-normalised images (the reference applies its transform
    pipeline upstream; foundation_stereo.py:194-196 keeps them as-is).
    """

    max_disp: int = 192
    vit_size: str = "vits"
    hidden_dim: int = 128
    volume_dim: int = 28
    cv_groups: int = 8
    n_gru_layers: int = 3
    corr_levels: int = 2
    corr_radius: int = 4
    train_iters: int = 22
    valid_iters: int = 32
    freeze_vit: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        left, right = data["left"], data["right"]
        b, h, w, _ = left.shape
        d4 = self.max_disp // 4

        feature = FSFeature(self.vit_size, self.freeze_vit, dtype=self.dtype,
                            name="feature")
        if train:
            feats_l, vit_l = feature(left, train=True)
            feats_r, _ = feature(right, train=True)
        else:
            (feats_l, vit_l), (feats_r, _) = siamese(
                lambda x: feature(x, train=False), left, right)

        stem_2a = BasicConvIN(32, 3, 2, dtype=self.dtype, name="stem_2a")
        stem_2b = ConvBlock(32, 3, norm="instance", act=nn.relu,
                            dtype=self.dtype, name="stem_2b")
        stem_2x = stem_2b(stem_2a(left, train=train), train=train)

        # hybrid volume: cosine gwc (8 groups) ∥ concat of 12-c projections
        proj = nn.Conv(12, (1, 1), dtype=self.dtype, name="proj_cmb")
        gwc = build_cosine_gwc_volume(feats_l[0], feats_r[0], d4, self.cv_groups)
        cat = build_fs_concat_volume(proj(feats_l[0]), proj(feats_r[0]), d4)
        comb = shard_disparity(jnp.concatenate(
            [gwc.astype(self.dtype), cat], axis=-1))  # [B,D/4,H/4,W/4,32]

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
                             max_disp=self.max_disp, dtype=self.dtype,
                             name="cost_agg")(comb, feats_l, train=train)

        cls = BasicConvBN(self.volume_dim // 2, 3, ndim=3, dtype=self.dtype,
                          name="classifier0")(comb, train=train)
        cls = ResnetBasicBlock3D(self.volume_dim // 2, dtype=self.dtype,
                                 name="classifier1")(cls, train=train)
        cost = nn.Conv(1, (7, 7, 7), padding="SAME", dtype=self.dtype,
                       name="classifier2")(cls)
        prob = nn.softmax(cost[..., 0].astype(head_dtype(self.dtype)), axis=1)
        init_disp = disparity_regression(prob, d4, axis=1)  # [B,H/4,W/4]

        # context net with ViT fusion; CAM-weighted inputs, SAM attention maps
        cnet = ContextNetDino((self.hidden_dim,) * 3, dtype=self.dtype,
                              name="cnet")(left, vit_l, train=train)
        net_list = [jnp.tanh(o[0]) for o in cnet]
        inp_list = [nn.relu(o[1]) for o in cnet]
        # ONE cam / ONE sam shared across all pyramid levels
        # (reference foundation_stereo.py:139-140 creates single modules and
        # applies them to every level in the list comprehensions at :237-238)
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

        # reference foundation_stereo.py:159: Conv2x(32, 32, True, bn=False)
        # — NO norm in the superpixel branch (unlike IGEV's bn=True)
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
          dtype=self.dtype, name="gru_loop")

        carry = (tuple(net_list), init_disp[..., None])
        consts = (geo_fn.geo_lookup, geo_fn.corr_lookup,
                  tuple(inp_list), tuple(att), coords)
        carry, (disp_seq, mask_seq) = loop(carry, consts)

        if train:
            n_it = disp_seq.shape[0]
            disp_flat = disp_seq.reshape(n_it * bb, h4, w4)
            mask_flat = mask_seq.reshape(n_it * bb, h4, w4, mask_seq.shape[-1])
            stem_rep = jnp.tile(stem_2x, (n_it, 1, 1, 1))
            ups = upsample_disp(disp_flat, mask_flat, stem_rep)
            ups = ups.reshape(n_it, bb, h, w)
            out = {
                "disp_pred": ups[-1],
                "disp_preds": [ups[i] for i in range(n_it)],
                "init_disp": resize_linear_align_corners(
                    init_disp[..., None], (h, w), axes=(1, 2))[..., 0] * 4.0,
            }
            return out
        disp_up = upsample_disp(carry[1][..., 0], mask_seq[-1], stem_2x)
        return {"disp_pred": disp_up}

    def get_loss(self, pred: Dict, data: Dict):
        """init smooth-L1 + γ-weighted L1 over iterates, γ=0.9^(15/(n-1))
        (reference foundation_stereo.py:288-321)."""
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        loss = masked_smooth_l1(pred["init_disp"], gt, mask)
        preds = pred["disp_preds"]
        n = len(preds)
        gamma = 0.9 ** (15.0 / max(n - 1, 1))
        for i, p in enumerate(preds):
            loss = loss + (gamma ** (n - i - 1)) * masked_l1(p, gt, mask)
        return loss, {"loss_disp": loss}
