"""MonSter — mono-stereo dual-branch iterative fusion, TPU-native.

Re-design of the reference MonSter (CVPR 2025)
(reference: stereo/modeling/models/monster/{monster.py,update.py,
refinement.py,dpt.py}):

- a frozen DepthAnythingV2 (DINOv2 ViT + DPT) produces a relative mono
  depth map; a trainable DPT *pyramid* decoder on the same ViT taps feeds
  both the stereo feature pyramid (FeatTransfer) and the context net;
- the stereo branch is IGEV-shaped: gwc volume (8 groups) → hourglass GEV
  → init disparity → GRU refinement with hat-matrix geometry lookups;
- the last 7 GRU iterations run *mutual* refinement: the mono depth is
  scale/shift-aligned to the current stereo disparity (closed-form masked
  least squares, vmapped over batch), both branches exchange warp-error
  ("flaw") features and geometry lookups through twin Mix update blocks,
  and both disparities are updated;
- a full-resolution REMP block refines the final prediction from the warp
  errors of both maps.

TPU-first decisions:
- the ViT runs once per image per pair at a 14/16-rescaled size
  (align-corners bilinear as banded matmuls, static shapes) and its taps
  feed both decoders — no second encoder pass (the reference calls
  get_intermediate_layers once per image too, monster.py:322-330);
- phase-1 and phase-2 GRU iterations are two `nn.scan` loops (traced
  once); the scale-shift alignment happens between them, outside the scan;
- frozen-branch semantics via `stop_gradient` on the mono decoder's
  depth + the encoder taps (reference monster.py:303-306 requires_grad_).

Weights note: see docs/PARITY.md — DepthAnythingV2 checkpoints are not
fetchable here; the trunk initialises randomly, converted checkpoints load
via MODEL.PRETRAINED_MODEL.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import context_upsample, disp_warp, disparity_regression, resize_linear_align_corners, resize_linear_torch
from ...parallel.sharding import shard_disparity
from ...registry import MODELS
from ..backbones.dinov2 import VIT_CONFIGS, DinoViT
from ..backbones.dpt import DAV2_CONFIGS, DPTHead, DPTPyramidDecoder
from ..igev.blocks import BasicConvBN, BasicConvIN, Conv2x
from ..igev.geometry import CombinedGeoEncodingVolume, lookup_dtype
from ..igev.update import BasicMultiUpdateBlock
from ..layers import ConvBlock, head_dtype
from ..losses import disp_valid_mask, masked_l1, masked_smooth_l1
from ...ops.cost_volume import build_gwc_volume
from .blocks import (FeatTransfer, FeatTransferCnet, MixUpdateBlock,
                     MonsterHourglass, REMP, compute_scale_shift)
from ..igev.blocks import FeatureAtt


class _MonoStereoBranches(nn.Module):
    """Shared ViT encoder → frozen depth head (left) + trainable pyramid
    decoder (both views). Images are resized ×14/16 so the patch grid is
    the 1/16 grid of the original (reference monster.py:312-330)."""

    encoder: str = "vits"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left, right):
        b, h, w, _ = left.shape
        hr, wr = h * 14 // 16, w * 14 // 16
        feats, out_ch = DAV2_CONFIGS[self.encoder]
        dim = VIT_CONFIGS[self.encoder][0]

        resize = lambda x: resize_linear_align_corners(  # noqa: E731
            x, (hr, wr), axes=(1, 2))
        vit = DinoViT(self.encoder, dtype=self.dtype, name="mono_encoder")
        # the encoder is frozen (reference monster.py:303-304
        # requires_grad_(False)): cut gradients at the taps so its params
        # get exact zeros AND the ViT backward pass is skipped entirely
        taps_l = jax.tree.map(jax.lax.stop_gradient, vit(resize(left)))
        taps_r = jax.tree.map(jax.lax.stop_gradient, vit(resize(right)))
        ph, pw = hr // 14, wr // 14
        _feat, depth = DPTHead(dim, feats, out_ch, dtype=self.dtype,
                               name="mono_decoder")(taps_l, ph, pw)
        depth = jax.lax.stop_gradient(depth)
        depth = resize_linear_torch(depth[..., None], (h, w), axes=(1, 2))[..., 0]

        dec = DPTPyramidDecoder(dim, feats, out_ch, dtype=self.dtype,
                                name="feat_decoder")
        pyr_l = dec(taps_l, ph, pw)
        pyr_r = dec(taps_r, ph, pw)
        return depth, list(pyr_l), list(pyr_r)


class _MonsterIterationA(nn.Module):
    """Standard (stereo-only) GRU iteration."""

    hidden_dims: Sequence[int]
    n_gru_layers: int
    radius: int
    num_levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        # static lookups ride a broadcast input, not the carry (scan
        # autodiff would stack per-step carries iters× as residuals)
        net, disp = carry
        geo_lookup, corr_lookup, inp, coords = consts
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
        net, mask_feat, delta = BasicMultiUpdateBlock(
            hidden_dims=tuple(self.hidden_dims), n_gru_layers=self.n_gru_layers,
            dtype=self.dtype, name="update_block")(
            list(net), inp, geo_feat, disp,
            iter16=self.n_gru_layers == 3, iter08=self.n_gru_layers >= 2)
        disp = disp + delta
        return (tuple(net), disp), (disp[..., 0], mask_feat)


class _MonsterIterationB(nn.Module):
    """Mutual-refinement iteration: twin Mix update blocks exchange flaw
    features and geometry lookups (reference monster.py:411-446)."""

    hidden_dims: Sequence[int]
    n_gru_layers: int
    radius: int
    num_levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        net, net_m, disp, disp_m = carry
        geo_lookup, corr_lookup, inp, coords, feat_l, feat_r = consts
        disp = jax.lax.stop_gradient(disp)
        disp_m = jax.lax.stop_gradient(disp_m)

        r = self.radius
        dx = jnp.arange(-r, r + 1, dtype=disp.dtype)
        scales = [2.0 ** i for i in range(self.num_levels)]

        def geo(d):
            gf = geo_lookup([d[..., 0, None] / s + dx for s in scales])
            cf = corr_lookup(
                [(coords - d[..., 0])[..., None] / s + dx for s in scales])
            feats = []
            for g, c_ in zip(gf, cf):
                feats.extend([g, c_])
            return jnp.concatenate(feats, axis=-1)

        geo_s, geo_m = geo(disp), geo(disp_m)
        warped_m, _ = disp_warp(feat_r, disp_m[..., 0], padding="border", torch_unaligned=True)
        flaw_m = warped_m - feat_l
        warped_s, _ = disp_warp(feat_r, disp[..., 0], padding="border", torch_unaligned=True)
        flaw_s = warped_s - feat_l

        net, mask_feat, delta = MixUpdateBlock(
            tuple(self.hidden_dims), self.n_gru_layers, dtype=self.dtype,
            name="update_mix_stereo")(
            list(net), inp, flaw_s, disp, geo_s, flaw_m, disp_m, geo_m)
        net_m, mask_feat_m, delta_m = MixUpdateBlock(
            tuple(self.hidden_dims), self.n_gru_layers, dtype=self.dtype,
            name="update_mix_mono")(
            list(net_m), inp, flaw_m, disp_m, geo_m, flaw_s, disp, geo_s)
        disp = disp + delta
        disp_m = disp_m + delta_m
        return (tuple(net), tuple(net_m), disp, disp_m), \
            (disp[..., 0], mask_feat, disp_m[..., 0], mask_feat_m)


@MODELS.register
class MonSter(nn.Module):
    """forward(data) → {'disp_pred', + train: 'init_disp','disp_preds',
    'depth_mono'}. Expects ImageNet-normalised images."""

    max_disp: int = 192
    encoder: str = "vits"
    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    corr_levels: int = 2
    corr_radius: int = 4
    train_iters: int = 22
    valid_iters: int = 32
    mix_iters: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        left, right = data["left"], data["right"]
        b, h, w, _ = left.shape
        d4 = self.max_disp // 4

        depth_mono, pyr_l, pyr_r = _MonoStereoBranches(
            self.encoder, dtype=self.dtype, name="mono")(left, right)
        disp_mono_4x = resize_linear_torch(
            depth_mono[..., None], (h // 4, w // 4), axes=(1, 2))

        feat_tr = FeatTransfer(dtype=self.dtype, name="feat_transfer")
        feats_l = feat_tr(pyr_l, train=train)
        feats_r = feat_tr(pyr_r, train=train)

        stem = lambda f, name: (  # noqa: E731
            BasicConvIN(f, 3, 2, dtype=self.dtype, name=f"{name}a"),
            ConvBlock(f, 3, norm="instance", act=nn.relu, dtype=self.dtype,
                      name=f"{name}b"))
        s2a, s2b = stem(32, "stem_2")
        s4a, s4b = stem(48, "stem_4")
        s8a, s8b = stem(96, "stem_8")
        s16a, s16b = stem(192, "stem_16")
        run = lambda a, bm, x: bm(a(x, train=train), train=train)  # noqa: E731
        stem_2x = run(s2a, s2b, left)
        stem_4x = run(s4a, s4b, stem_2x)
        stem_8x = run(s8a, s8b, stem_4x)
        stem_16x = run(s16a, s16b, stem_8x)
        stem_2y = run(s2a, s2b, right)
        stem_4y = run(s4a, s4b, stem_2y)

        feats_l[0] = jnp.concatenate([feats_l[0], stem_4x], axis=-1)  # 96c
        feats_r[0] = jnp.concatenate([feats_r[0], stem_4y], axis=-1)

        conv = BasicConvIN(96, 3, 1, dtype=self.dtype, name="conv")
        desc = nn.Conv(96, (1, 1), dtype=self.dtype, name="desc")
        match_left = desc(conv(feats_l[0], train=train))
        match_right = desc(conv(feats_r[0], train=train))

        gwc = shard_disparity(build_gwc_volume(match_left, match_right, d4, 8))
        gwc = BasicConvBN(8, 3, 1, ndim=3, dtype=self.dtype,
                          name="corr_stem")(gwc, train=train)
        gwc = FeatureAtt(8, dtype=self.dtype, name="corr_feature_att")(
            gwc, feats_l[0], train=train)
        geo_volume = MonsterHourglass(8, dtype=self.dtype, name="cost_agg")(
            gwc, feats_l, train=train)

        cost = nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype, name="classifier")(geo_volume)
        prob = nn.softmax(cost[..., 0].astype(head_dtype(self.dtype)), axis=1)
        init_disp = disparity_regression(prob, d4, axis=1)  # [B,H/4,W/4]

        cnet = FeatTransferCnet(self.hidden_dims[0], dtype=self.dtype,
                                name="feat_transfer_cnet")(
            pyr_l, [stem_16x, stem_8x, stem_4x])
        net_list = [jnp.tanh(o[0]) for o in cnet]
        inp_raw = [nn.relu(o[1]) for o in cnet]
        inp_list = []
        for i, inp in enumerate(inp_raw):
            z = nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"context_zqr{i}")(inp)
            inp_list.append(tuple(jnp.split(z, 3, axis=-1)))

        geo_fn = CombinedGeoEncodingVolume(
            match_left.astype(lookup_dtype(self.dtype)),
            match_right.astype(lookup_dtype(self.dtype)),
            geo_volume.astype(lookup_dtype(self.dtype)),
            num_levels=self.corr_levels, radius=self.corr_radius)
        bb, h4, w4 = init_disp.shape
        coords = jnp.broadcast_to(
            jnp.arange(w4, dtype=jnp.float32)[None, None, :], (bb, h4, w4))

        spx_2_gru = Conv2x(32, deconv=True, norm="batch", dtype=self.dtype,
                           name="spx_2_gru")
        spx_gru = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype, name="spx_gru")

        def upsample_disp(disp4, mask_feat, stem):
            y = spx_2_gru(mask_feat, stem, train=train)
            spx = nn.softmax(spx_gru(y).astype(head_dtype(self.dtype)), axis=-1)
            return context_upsample(disp4 * 4.0, spx)

        iters = self.train_iters if train else self.valid_iters
        n_a = max(iters - self.mix_iters, 0)
        n_b = iters - n_a

        common = dict(hidden_dims=tuple(self.hidden_dims)[::-1],
                      n_gru_layers=self.n_gru_layers, radius=self.corr_radius,
                      num_levels=self.corr_levels, dtype=self.dtype)
        loop_a = nn.scan(_MonsterIterationA, variable_broadcast="params",
                         split_rngs={"params": False}, in_axes=nn.broadcast,
                         length=n_a)(
            **common, name="gru_loop")
        consts_a = (geo_fn.geo_lookup, geo_fn.corr_lookup,
                    tuple(inp_list), coords)
        # the mono branch's hidden states are a clone of the INITIAL
        # (pre-loop) states, not the post-phase-A ones
        # (reference monster.py:408 clones before the iteration loop)
        net_list_init = tuple(net_list)
        carry_a = (tuple(net_list), init_disp[..., None])
        carry_a, (disp_seq_a, mask_seq_a) = loop_a(carry_a, consts_a)
        net_list, disp = carry_a[0], carry_a[1]

        # scale/shift-align the mono disparity to the current stereo one
        # (reference monster.py:416-421, at itr == iters-7)
        scale, shift = compute_scale_shift(
            disp_mono_4x[..., 0].astype(jnp.float32),
            jax.lax.stop_gradient(disp[..., 0]).astype(jnp.float32))
        disp_m = (scale[:, None, None, None] * disp_mono_4x
                  + shift[:, None, None, None]).astype(disp.dtype)

        loop_b = nn.scan(_MonsterIterationB, variable_broadcast="params",
                         split_rngs={"params": False}, in_axes=nn.broadcast,
                         length=n_b)(
            **common, name="gru_loop_mix")
        consts_b = (geo_fn.geo_lookup, geo_fn.corr_lookup,
                    tuple(inp_list), coords,
                    feats_l[0].astype(head_dtype(self.dtype)),
                    feats_r[0].astype(head_dtype(self.dtype)))
        carry_b = (net_list, net_list_init, disp, disp_m)
        carry_b, (disp_seq_b, mask_seq_b, disp_seq_m, mask_seq_m) = \
            loop_b(carry_b, consts_b)
        final_disp, final_mask = carry_b[2], mask_seq_b[-1]

        remp = REMP(dtype=self.dtype, name="REMP")

        if not train:
            disp_up = upsample_disp(final_disp[..., 0], final_mask, stem_2x)
            disp_m_up = upsample_disp(disp_seq_m[-1], mask_seq_m[-1], stem_2x)
            disp_up = disp_up + remp(disp_m_up[..., None], disp_up[..., None],
                                     left, right, train=False)[..., 0]
            return {"disp_pred": disp_up}

        # train: upsample every iterate (both phases + mono branch), batched
        def batch_upsample(seq_d, seq_m):
            n_it = seq_d.shape[0]
            d = seq_d.reshape(n_it * bb, h4, w4)
            m = seq_m.reshape(n_it * bb, h4, w4, seq_m.shape[-1])
            s = jnp.tile(stem_2x, (n_it, 1, 1, 1))
            u = upsample_disp(d, m, s)
            return u.reshape(n_it, bb, h, w)

        preds = []
        if n_a:
            ups_a = batch_upsample(disp_seq_a, mask_seq_a)
            preds += [ups_a[i] for i in range(n_a)]
        ups_b = batch_upsample(disp_seq_b, mask_seq_b)
        ups_m = batch_upsample(disp_seq_m, mask_seq_m)
        # reference ordering: mono-up then stereo-up per mixed iteration
        # (monster.py:437-452); the last stereo pred gets the REMP residual
        for i in range(n_b):
            preds.append(ups_m[i])
            if i == n_b - 1:
                refined = ups_b[i] + remp(
                    ups_m[i][..., None], ups_b[i][..., None], left, right,
                    train=True)[..., 0]
                preds.append(refined)
            else:
                preds.append(ups_b[i])

        # init-disp supervision head (monster.py:390-395)
        xspx = BasicConvIN(24, 3, 1, dtype=self.dtype, name="spx_4a")(
            feats_l[0], train=train)
        xspx = ConvBlock(24, 3, norm="instance", act=nn.relu, dtype=self.dtype,
                         name="spx_4b")(xspx, train=train)
        xspx = Conv2x(32, deconv=True, norm="instance", dtype=self.dtype,
                      name="spx_2")(xspx, stem_2x, train=train)
        spx = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                               dtype=self.dtype, name="spx")(xspx)
        spx = nn.softmax(spx.astype(head_dtype(self.dtype)), axis=-1)
        init_up = context_upsample(init_disp * 4.0, spx)

        return {"disp_pred": preds[-1], "disp_preds": preds,
                "init_disp": init_up, "depth_mono": depth_mono}

    def get_loss(self, pred: Dict, data: Dict):
        """init smooth-L1 + γ-weighted L1 over all (mono+stereo) iterates,
        γ=0.9^(15/(n-1)) (reference monster.py:478-503)."""
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        loss = masked_smooth_l1(pred["init_disp"], gt, mask)
        preds = pred["disp_preds"]
        n = len(preds)
        gamma = 0.9 ** (15.0 / max(n - 1, 1))
        for i, p in enumerate(preds):
            loss = loss + (gamma ** (n - i - 1)) * masked_l1(p, gt, mask)
        return loss, {"loss_disp": loss}
