"""IGEV-Stereo — geometry-encoding volume + iterative ConvGRU refinement.

TPU-native re-design of the reference IGEVStereo
(reference: stereo/modeling/models/igev/igev_stereo.py:79-247):

- gwc volume (8 groups, D/4) gated by image features, aggregated by a 3-level
  3D hourglass with FeatureAtt at every scale → geometry encoding volume
  (NDHWC throughout; 3D convs contract on the MXU);
- init disparity by soft-argmax over the GEV;
- per-iteration lookups of (GEV, all-pairs correlation) pyramids via
  vectorised 1D linear gathers (geometry.py) — no grid_sample;
- 3-scale ConvGRU updates with slow-fast scheduling, superpixel upsampling
  of each iterate (train) / the last (eval);
- loss = smooth-L1 on init + γ-weighted L1 over iterates
  (γ=0.9 adjusted, reference igev_stereo.py:220-247).

The GRU loop is a Python loop over a static iteration count with
`lax.stop_gradient` on the carried disparity (the reference's detach).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import build_gwc_volume, context_upsample, disparity_regression
from ...registry import MODELS
from ...parallel.sharding import shard_disparity
from ..layers import ConvBlock, head_dtype, siamese
from ..losses import disp_valid_mask, masked_l1, masked_smooth_l1
from .blocks import (
    BasicConvBN,
    BasicConvIN,
    Conv2x,
    Feature,
    FeatureAtt,
    MultiBasicEncoder,
)
from .geometry import CombinedGeoEncodingVolume, lookup_dtype
from .update import BasicMultiUpdateBlock


class GeoHourglass(nn.Module):
    """3-level 3D hourglass with feature attention at every scale
    (reference igev_stereo.py:7-77; also StereoBase's hourglass,
    stereobase/hourglass.py:7-104 — identical structure with
    in_channels = total cost-volume channels). Output channels == features."""

    features: int  # 8 for IGEV; the fused volume channel count for StereoBase
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, features, *, train: bool = False):
        c = self.features
        B3 = lambda f, k, s, name, **kw: BasicConvBN(  # noqa: E731
            f, k, s, ndim=3, dtype=self.dtype, name=name, **kw)

        conv1 = B3(c * 2, 3, 2, "conv1a")(x, train=train)
        conv1 = B3(c * 2, 3, 1, "conv1b")(conv1, train=train)
        conv1 = FeatureAtt(c * 2, dtype=self.dtype, name="att8")(
            conv1, features[1], train=train)

        conv2 = B3(c * 4, 3, 2, "conv2a")(conv1, train=train)
        conv2 = B3(c * 4, 3, 1, "conv2b")(conv2, train=train)
        conv2 = FeatureAtt(c * 4, dtype=self.dtype, name="att16")(
            conv2, features[2], train=train)

        conv3 = B3(c * 6, 3, 2, "conv3a")(conv2, train=train)
        conv3 = B3(c * 6, 3, 1, "conv3b")(conv3, train=train)
        conv3 = FeatureAtt(c * 6, dtype=self.dtype, name="att32")(
            conv3, features[3], train=train)

        up2 = B3(c * 4, 4, 2, "conv3_up", deconv=True)(conv3, train=train)
        conv2 = jnp.concatenate([up2, conv2], axis=-1)
        conv2 = B3(c * 4, 1, 1, "agg0a")(conv2, train=train)
        conv2 = B3(c * 4, 3, 1, "agg0b")(conv2, train=train)
        conv2 = B3(c * 4, 3, 1, "agg0c")(conv2, train=train)
        conv2 = FeatureAtt(c * 4, dtype=self.dtype, name="att_up16")(
            conv2, features[2], train=train)

        up1 = B3(c * 2, 4, 2, "conv2_up", deconv=True)(conv2, train=train)
        conv1 = jnp.concatenate([up1, conv1], axis=-1)
        conv1 = B3(c * 2, 1, 1, "agg1a")(conv1, train=train)
        conv1 = B3(c * 2, 3, 1, "agg1b")(conv1, train=train)
        conv1 = B3(c * 2, 3, 1, "agg1c")(conv1, train=train)
        conv1 = FeatureAtt(c * 2, dtype=self.dtype, name="att_up8")(
            conv1, features[1], train=train)

        return B3(c, 4, 2, "conv1_up", deconv=True, bn=False, relu=False)(
            conv1, train=train)


class _GRUIteration(nn.Module):
    """One slow-fast GRU iteration — the body of the scanned loop.

    carry = (net_list, disp); the static lookup pyramids / context tensors
    arrive as a BROADCAST input (in_axes=nn.broadcast), NOT in the carry:
    scan's autodiff stacks every per-step carry as a backward residual, so
    carrying the geo pyramid would store it iters× (a 22x ~5 GB blow-up at
    the reference train crop — the broadcast form saves it once).
    Emits (disp [B,H/4,W/4], mask_feat_4) per iteration.
    """

    hidden_dims: Sequence[int]
    n_gru_layers: int
    slow_fast_gru: bool
    radius: int
    num_levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        net_list, disp = carry
        geo_lookup, corr_lookup, inp_list, coords = consts
        net_list = list(net_list)
        disp = jax.lax.stop_gradient(disp)

        # geometry lookup (CombinedGeoEncodingVolume.__call__ inlined over
        # the broadcast MultiLookup consts — one merged einsum per pyramid)
        r = self.radius
        dx = jnp.arange(-r, r + 1, dtype=disp.dtype)
        scales = [2.0 ** i for i in range(self.num_levels)]
        # 5D blocks, no concat: the motion encoder's 1x1 conv contracts
        # each block in place (SplitPointwise), killing the per-iteration
        # concat + relayout copies. Only profitable when the geo volume is
        # wide enough that the per-block contraction feeds the MXU
        # (StereoBase C=24: 156 -> 150 ms; IGEV C=8: 137 -> 143 ms
        # REGRESSION with blocks) — gate on the channel count.
        blocks = geo_lookup.cat.shape[-2] >= 16
        geo_feats = geo_lookup(
            [disp[..., 0, None] / s + dx for s in scales], flat=not blocks)
        corr_feats = corr_lookup(
            [(coords - disp[..., 0])[..., None] / s + dx for s in scales],
            flat=not blocks)
        geo_feat = []
        for g, c in zip(geo_feats, corr_feats):
            geo_feat.extend([g, c])
        if not blocks:
            geo_feat = jnp.concatenate(geo_feat, axis=-1)

        update_block = BasicMultiUpdateBlock(
            hidden_dims=tuple(self.hidden_dims), n_gru_layers=self.n_gru_layers,
            dtype=self.dtype, name="update_block")
        if self.n_gru_layers == 3 and self.slow_fast_gru:
            net_list = update_block(net_list, inp_list, iter16=True,
                                    iter08=False, iter04=False, update=False)
        if self.n_gru_layers >= 2 and self.slow_fast_gru:
            net_list = update_block(net_list, inp_list,
                                    iter16=self.n_gru_layers == 3,
                                    iter08=True, iter04=False, update=False)
        net_list, mask_feat_4, delta = update_block(
            net_list, inp_list, geo_feat, disp,
            iter16=self.n_gru_layers == 3, iter08=self.n_gru_layers >= 2)
        disp = disp + delta
        return (tuple(net_list), disp), (disp[..., 0], mask_feat_4)


@MODELS.register
class IGEV(nn.Module):
    """forward(data) → {'disp_pred', 'init_disp'+'disp_preds' (train)}.

    Expects raw [0,255] images (normalises to [-1,1] internally like the
    reference, igev_stereo.py:144-145).
    """

    max_disp: int = 192
    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    n_downsample: int = 2
    slow_fast_gru: bool = True
    corr_levels: int = 2
    corr_radius: int = 4
    train_iters: int = 22
    valid_iters: int = 32
    # MODEL.REMAT: checkpoint the scanned GRU cell — backward recomputes
    # each iteration instead of stashing its internals (the per-iteration
    # lookup residuals alone are ~1 GB/iter at the reference 320x736 crop,
    # overflowing the 16 GB chip at batch 4 x 22 iters)
    remat: bool = False
    # MODEL.SCAN_UNROLL: lax.scan unroll factor for the GRU loop — lets XLA
    # fuse across iterations to amortize per-step dispatch of the many
    # small update ops (numerically identity; costs compile time and
    # code size, so off by default)
    scan_unroll: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        image1 = 2.0 * (data["left"] / 255.0) - 1.0
        image2 = 2.0 * (data["right"] / 255.0) - 1.0

        feature = Feature(dtype=self.dtype, name="feature")
        if train:
            feats_l = feature(image1, train=True)
            feats_r = feature(image2, train=True)
        else:
            feats_l, feats_r = siamese(lambda x: feature(x, train=False),
                                       image1, image2)

        # stems: BasicConv_IN (LeakyReLU) then plain conv+IN+ReLU
        # (reference igev_stereo.py:97-106 — the second stage uses nn.ReLU)
        stem_2a = BasicConvIN(32, 3, 2, dtype=self.dtype, name="stem_2a")
        stem_2b = ConvBlock(32, 3, norm="instance", act=nn.relu,
                            dtype=self.dtype, name="stem_2b")
        stem_4a = BasicConvIN(48, 3, 2, dtype=self.dtype, name="stem_4a")
        stem_4b = ConvBlock(48, 3, norm="instance", act=nn.relu,
                            dtype=self.dtype, name="stem_4b")
        stem_2 = lambda x: stem_2b(stem_2a(x, train=train), train=train)  # noqa: E731
        stem_4 = lambda x: stem_4b(stem_4a(x, train=train), train=train)  # noqa: E731

        if train:
            stem_2x = stem_2(image1)
            stem_4x = stem_4(stem_2x)
            stem_2y = stem_2(image2)
            stem_4y = stem_4(stem_2y)
        else:
            (stem_2x, stem_4x), (stem_2y, stem_4y) = siamese(
                lambda x: ((s2 := stem_2(x)), stem_4(s2)), image1, image2)
        feats_l[0] = jnp.concatenate([feats_l[0], stem_4x], axis=-1)  # 96c
        feats_r[0] = jnp.concatenate([feats_r[0], stem_4y], axis=-1)

        conv = BasicConvIN(96, 3, 1, dtype=self.dtype, name="conv")
        desc = nn.Conv(96, (1, 1), dtype=self.dtype, name="desc")
        match_left = desc(conv(feats_l[0], train=train))
        match_right = desc(conv(feats_r[0], train=train))

        d4 = self.max_disp // 4
        gwc = shard_disparity(  # D over mesh 'model' (no-op off-mesh)
            build_gwc_volume(match_left, match_right, d4, 8))  # [B,D/4,H/4,W/4,8]
        # corr_stem: conv3d + BN + LeakyReLU (reference igev_stereo.py:122 —
        # BasicConv defaults bn=True, relu=True)
        gwc = BasicConvBN(8, 3, 1, ndim=3, dtype=self.dtype,
                          name="corr_stem")(gwc, train=train)
        gwc = FeatureAtt(8, dtype=self.dtype, name="corr_feature_att")(
            gwc, feats_l[0], train=train)
        geo_volume = GeoHourglass(8, dtype=self.dtype, name="cost_agg")(
            gwc, feats_l, train=train)  # [B,D/4,H/4,W/4,8]

        cost = nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype, name="classifier")(geo_volume)
        prob = nn.softmax(cost[..., 0].astype(head_dtype(self.dtype)), axis=1)
        init_disp = disparity_regression(prob, d4, axis=1)  # [B,H/4,W/4]

        # context network
        cnet = MultiBasicEncoder([list(self.hidden_dims), list(self.hidden_dims)],
                                 norm="batch", downsample=self.n_downsample,
                                 dtype=self.dtype, name="cnet")(image1, train=train)
        net_list = [jnp.tanh(o[0]) for o in cnet]
        inp_raw = [nn.relu(o[1]) for o in cnet]
        inp_list = []
        for i, inp in enumerate(inp_raw):
            z = nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"context_zqr{i}")(inp)
            inp_list.append(tuple(jnp.split(z, 3, axis=-1)))

        geo_fn = CombinedGeoEncodingVolume(
            match_left.astype(lookup_dtype(self.dtype)), match_right.astype(lookup_dtype(self.dtype)),
            geo_volume.astype(lookup_dtype(self.dtype)),
            num_levels=self.corr_levels, radius=self.corr_radius)

        b, h4, w4 = init_disp.shape
        coords = jnp.broadcast_to(jnp.arange(w4, dtype=jnp.float32)[None, None, :],
                                  (b, h4, w4))

        spx_2_gru = Conv2x(32, deconv=True, norm="batch", dtype=self.dtype,
                           name="spx_2_gru")
        spx_gru = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype, name="spx_gru")

        def upsample_disp(disp4, mask_feat_4, stem_2x):
            x = spx_2_gru(mask_feat_4, stem_2x, train=train)
            spx = nn.softmax(spx_gru(x).astype(head_dtype(self.dtype)), axis=-1)
            return context_upsample(disp4 * 4.0, spx)  # [B,H,W]

        # GRU iterations as a single-trace lax.scan (nn.scan): 22/32 unrolled
        # update blocks would explode XLA compile time at full resolution; the
        # scanned cell is traced once and parameters are broadcast across
        # iterations (the reference's Python loop shares modules the same way).
        iters = self.train_iters if train else self.valid_iters
        cell = (nn.remat(_GRUIteration, prevent_cse=False)
                if (self.remat and train) else _GRUIteration)
        ScannedLoop = nn.scan(
            cell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            length=iters,
            unroll=self.scan_unroll,
        )
        loop = ScannedLoop(
            hidden_dims=tuple(self.hidden_dims)[::-1],
            n_gru_layers=self.n_gru_layers,
            slow_fast_gru=self.slow_fast_gru,
            radius=self.corr_radius,
            num_levels=self.corr_levels,
            dtype=self.dtype,
            name="gru_loop",
        )
        carry = (tuple(net_list), init_disp[..., None])
        consts = (geo_fn.geo_lookup, geo_fn.corr_lookup,
                  tuple(inp_list), coords)
        carry, (disp_seq, mask_seq) = loop(carry, consts)
        final_disp = carry[1]
        final_mask_feat = mask_seq[-1]

        if train:
            # upsample every iterate: fold iterations into the batch axis so
            # the superpixel convs run once over [iters·B, ...]
            n_it = disp_seq.shape[0]
            disp_flat = disp_seq.reshape(n_it * b, h4, w4)
            mask_flat = mask_seq.reshape(n_it * b, h4, w4, mask_seq.shape[-1])
            stem_rep = jnp.tile(stem_2x, (n_it, 1, 1, 1))
            ups = upsample_disp(disp_flat, mask_flat, stem_rep)
            ups = ups.reshape(n_it, b, *ups.shape[1:])
            disp_preds = [ups[i] for i in range(n_it)]
            disp_up = disp_preds[-1]
        else:
            disp_up = upsample_disp(final_disp[..., 0], final_mask_feat, stem_2x)

        out = {"disp_pred": disp_up}
        if train:
            # superpixel upsample of the init disparity (train supervision)
            xspx = BasicConvIN(24, 3, 1, dtype=self.dtype, name="spx_4a")(
                feats_l[0], train=train)
            xspx = ConvBlock(24, 3, norm="instance", act=nn.relu,
                             dtype=self.dtype, name="spx_4b")(xspx, train=train)
            xspx = Conv2x(32, deconv=True, norm="instance", dtype=self.dtype,
                          name="spx_2")(xspx, stem_2x, train=train)
            spx = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype, name="spx")(xspx)
            spx = nn.softmax(spx.astype(head_dtype(self.dtype)), axis=-1)
            out["init_disp"] = context_upsample(init_disp * 4.0, spx)
            out["disp_preds"] = disp_preds
        return out

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
