"""IGEV++ — multi-range geometry encoding volumes with selective fusion.

TPU-native re-design of the reference IGEVPPStereo
(reference: stereo/modeling/models/igevpp/igevpp_stereo.py:99-295):

- the IGEV MobileNetV2 trunk/stems/descriptors (igevpp/extractor.py:325-359,
  InstanceNorm decoder — shared via models/igev/blocks.py with
  norm='instance');
- ONE gwc volume over the full MAX_DISP/4 bins, then three disparity ranges
  carved from it (igevpp_stereo.py:182-186): small = first S bins as-is,
  medium = first M bins depth-pooled 2× by a learned (2,1,1) conv, large =
  all bins depth-pooled 4× by a (4,1,1) conv — each aggregated by its own
  InstanceNorm 3D hourglass (with an extra conv0+att_4 stage and an 8×-wide
  bottleneck, igevpp_stereo.py:22-97) and soft-argmaxed at its interval;
- a selective-fusion head predicts 3 per-pixel weights from the image
  features + the three coarse disparities (igevpp_stereo.py:139-147,204-205);
- per GRU iteration, the three GEVs are sampled around the current disparity
  (full pyramid for the small range; /2 and /4 single lookups for the
  others, igevpp/geometry.py:35-77), each encoded to 96 channels, blended
  by the selective weights, concatenated with the all-pairs-correlation
  lookup and fed to the 3-scale ConvGRU cascade (igevpp/update.py:125-169);
- loss = weighted smooth-L1 on the three upsampled coarse disparities
  (1.0/0.5/0.2 with per-range validity caps) + γ-weighted L1 over iterates.

The reference gates the per-range loss caps on the dataset *name* at
runtime (igevpp_stereo.py:265-273); here they are the static `disp_caps`
field (the TPU-native choice — jit-compatible), set per config.

Like the reference, images arrive raw (no NormalizeImage in the igevpp
cfgs) and no internal normalisation is applied.
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
from ..losses import masked_l1, masked_smooth_l1
from ..igev.blocks import BasicConvBN, BasicConvIN, Conv2x, Feature, FeatureAtt
from ..igev.blocks import MultiBasicEncoder
from ..igev.geometry import (MultiLookup, all_pairs_correlation,
                             avg_pool_last, lookup_dtype)
from ..igev.update import ConvGRU, DispHead, interp_to, pool2x


class PPHourglass(nn.Module):
    """IGEV++ 3D hourglass: extra conv0+att_4 stage, 8×-wide bottleneck,
    InstanceNorm throughout (reference igevpp_stereo.py:22-97)."""

    features: int  # 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, features, *, train: bool = False):
        c = self.features
        B3 = lambda f, k, s, name, **kw: BasicConvIN(  # noqa: E731
            f, k, s, ndim=3, dtype=self.dtype, name=name, **kw)
        Att = lambda f, name: FeatureAtt(  # noqa: E731
            f, norm="instance", dtype=self.dtype, name=name)

        conv0 = B3(c, 3, 1, "conv0")(x, train=train)
        conv0 = Att(c, "att4")(conv0, features[0], train=train)

        conv1 = B3(c * 2, 3, 2, "conv1a")(conv0, train=train)
        conv1 = B3(c * 2, 3, 1, "conv1b")(conv1, train=train)
        conv1 = Att(c * 2, "att8")(conv1, features[1], train=train)

        conv2 = B3(c * 4, 3, 2, "conv2a")(conv1, train=train)
        conv2 = B3(c * 4, 3, 1, "conv2b")(conv2, train=train)
        conv2 = Att(c * 4, "att16")(conv2, features[2], train=train)

        conv3 = B3(c * 8, 3, 2, "conv3a")(conv2, train=train)
        conv3 = B3(c * 8, 3, 1, "conv3b")(conv3, train=train)
        conv3 = Att(c * 8, "att32")(conv3, features[3], train=train)

        up2 = B3(c * 4, 4, 2, "conv3_up", deconv=True)(conv3, train=train)
        conv2 = jnp.concatenate([up2, conv2], axis=-1)
        conv2 = B3(c * 4, 1, 1, "agg0a")(conv2, train=train)
        conv2 = B3(c * 4, 3, 1, "agg0b")(conv2, train=train)
        conv2 = B3(c * 4, 3, 1, "agg0c")(conv2, train=train)
        conv2 = Att(c * 4, "att_up16")(conv2, features[2], train=train)

        up1 = B3(c * 2, 4, 2, "conv2_up", deconv=True)(conv2, train=train)
        conv1 = jnp.concatenate([up1, conv1], axis=-1)
        conv1 = B3(c * 2, 1, 1, "agg1a")(conv1, train=train)
        conv1 = B3(c * 2, 3, 1, "agg1b")(conv1, train=train)
        conv1 = B3(c * 2, 3, 1, "agg1c")(conv1, train=train)
        conv1 = Att(c * 2, "att_up8")(conv1, features[1], train=train)

        # IN=False, relu=False final deconv (no norm)
        return BasicConvBN(c, 4, 2, ndim=3, deconv=True, bn=False, relu=False,
                           dtype=self.dtype, name="conv1_up")(conv1, train=train)


class GeoEncoder(nn.Module):
    """1x1→128 relu→3x3→96, no final relu (igevpp/update.py:72-80)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, geo):
        g = nn.relu(nn.Conv(128, (1, 1), dtype=self.dtype, name="convg1")(geo))
        return nn.Conv(96, (3, 3), padding="SAME", dtype=self.dtype,
                       name="convg2")(g)


class BasicDispEncoder(nn.Module):
    """Fused geo features + disp → 128-channel motion features
    (igevpp/update.py:82-100)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, geo):
        conv = lambda f, k, name: nn.Conv(f, (k, k), padding="SAME",  # noqa: E731
                                          dtype=self.dtype, name=name)
        cor = nn.relu(conv(128, 1, "convc1")(geo))
        cor = nn.relu(conv(96, 3, "convc2")(cor))
        d = nn.relu(conv(32, 7, "convd1")(disp))
        d = nn.relu(conv(32, 3, "convd2")(d))
        out = nn.relu(conv(127, 3, "conv")(jnp.concatenate([cor, d], axis=-1)))
        return jnp.concatenate([out, disp], axis=-1)  # 128


class PPUpdateBlock(nn.Module):
    """3-scale GRU cascade with selective multi-range geo fusion
    (igevpp/update.py:125-169). hidden_dims ordered [1/16, 1/8, 1/4]."""

    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, geo0, geo1, geo2, init_corr, sel_w, disp,
                 iter04=True, iter08=True, iter16=True, update=True):
        net = list(net)
        if iter16:
            net[2] = ConvGRU(self.hidden_dims[0], dtype=self.dtype, name="gru16")(
                net[2], inp[2], pool2x(net[1]))
        if iter08:
            extra = [pool2x(net[0])]
            if self.n_gru_layers > 2:
                extra.append(interp_to(net[2], net[1]))
            net[1] = ConvGRU(self.hidden_dims[1], dtype=self.dtype, name="gru08")(
                net[1], inp[1], *extra)
        if iter04:
            g0 = GeoEncoder(dtype=self.dtype, name="geo_encoder0")(geo0)
            g1 = GeoEncoder(dtype=self.dtype, name="geo_encoder1")(geo1)
            g2 = GeoEncoder(dtype=self.dtype, name="geo_encoder2")(geo2)
            geo = (sel_w[..., 0:1] * g0 + sel_w[..., 1:2] * g1
                   + sel_w[..., 2:3] * g2)
            geo = jnp.concatenate([geo, init_corr], axis=-1)
            motion = BasicDispEncoder(dtype=self.dtype, name="encoder")(disp, geo)
            extra = [motion]
            if self.n_gru_layers > 1:
                extra.append(interp_to(net[1], net[0]))
            net[0] = ConvGRU(self.hidden_dims[2], dtype=self.dtype, name="gru04")(
                net[0], inp[0], *extra)
        if not update:
            return net
        delta_disp = DispHead(256, dtype=self.dtype, name="disp_head")(net[0])
        mask_feat_4 = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                                      name="mask_feat_4")(net[0]))
        return net, mask_feat_4, delta_disp


class _PPIteration(nn.Module):
    """One IGEV++ GRU iteration (body of the scanned loop).

    carry = (net_list, disp); consts = (geo_lookup, corr_lookup, sel_w,
    inp_list, coords); emits (disp, mask_feat_4)."""

    hidden_dims: Sequence[int]
    n_gru_layers: int
    radius: int
    num_levels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        # static lookups ride a broadcast input, not the carry — scan
        # autodiff stacks per-step carries as backward residuals (iters×
        # the volume memory); broadcast constants are saved once.
        net_list, disp = carry
        (geo_lookup, corr_lookup, sel_w, inp_list, coords) = consts
        net_list = list(net_list)
        disp = jax.lax.stop_gradient(disp)

        r = self.radius
        dx = jnp.arange(-r, r + 1, dtype=disp.dtype)
        d0 = disp[..., 0]
        geo_parts = geo_lookup(
            [d0[..., None] / (2.0 ** i) + dx for i in range(self.num_levels)]
            + [d0[..., None] / 2.0 + dx, d0[..., None] / 4.0 + dx])
        geo0 = jnp.concatenate(geo_parts[:self.num_levels], axis=-1)
        gf1, gf2 = geo_parts[self.num_levels], geo_parts[self.num_levels + 1]
        init_corr = jnp.concatenate(corr_lookup(
            [(coords - d0)[..., None] / (2.0 ** i) + dx
             for i in range(self.num_levels)]), axis=-1)

        net_list, mask_feat_4, delta = PPUpdateBlock(
            hidden_dims=tuple(self.hidden_dims),
            n_gru_layers=self.n_gru_layers,
            dtype=self.dtype, name="update_block")(
                net_list, inp_list, geo0, gf1, gf2, init_corr, sel_w, disp,
                iter16=self.n_gru_layers == 3, iter08=self.n_gru_layers >= 2)
        disp = disp + delta
        return (tuple(net_list), disp), (disp[..., 0], mask_feat_4)


@MODELS.register  # "IGEVPP" == reference MODEL.NAME
class IGEVPP(nn.Module):
    """forward(data) → {'disp_pred', 'init_disp'(list)+'disp_preds' (train)}."""

    max_disp: int = 768
    s_disp_range: int = 48
    s_disp_interval: int = 1
    m_disp_range: int = 96
    m_disp_interval: int = 2
    l_disp_range: int = 192
    l_disp_interval: int = 4
    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    n_downsample: int = 2
    corr_levels: int = 2
    corr_radius: int = 4
    train_iters: int = 22
    valid_iters: int = 32
    # per-range validity caps for the 3 aggregation losses (the reference
    # switches 192/384/700 ↔ all-192 on dataset name; static here)
    disp_caps: Sequence[float] = (192.0, 384.0, 700.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        image1 = data["left"]
        image2 = data["right"]

        feature = Feature(dtype=self.dtype, name="feature")
        if train:
            feats_l = feature(image1, train=True)
            feats_r = feature(image2, train=True)
        else:
            feats_l, feats_r = siamese(lambda x: feature(x, train=False),
                                       image1, image2)

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

        # one full-range gwc volume, three carved ranges
        d4 = self.max_disp // 4
        all_volume = shard_disparity(  # D over mesh 'model' (no-op off-mesh)
            build_gwc_volume(match_left, match_right, d4, 8))
        vol0 = all_volume[:, :self.s_disp_range]
        vol1 = nn.Conv(8, (2, 1, 1), strides=(2, 1, 1), padding="VALID",
                       use_bias=False, dtype=self.dtype, name="patch0")(
                           all_volume[:, :self.m_disp_range])
        vol2 = nn.Conv(8, (4, 1, 1), strides=(4, 1, 1), padding="VALID",
                       use_bias=False, dtype=self.dtype, name="patch1")(all_volume)

        geo0 = PPHourglass(8, dtype=self.dtype, name="cost_agg0")(
            vol0, feats_l, train=train)
        geo1 = PPHourglass(8, dtype=self.dtype, name="cost_agg1")(
            vol1, feats_l, train=train)
        geo2 = PPHourglass(8, dtype=self.dtype, name="cost_agg2")(
            vol2, feats_l, train=train)

        classifier = nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False,
                             dtype=self.dtype, name="classifier")
        hd = head_dtype(self.dtype)

        def regress(geo, rng, interval):
            prob = nn.softmax(classifier(geo)[..., 0].astype(hd), axis=1)
            return disparity_regression(prob, rng, axis=1, interval=interval)

        agg_disp0 = regress(geo0, self.s_disp_range, self.s_disp_interval)
        agg_disp1 = regress(geo1, self.m_disp_range, self.m_disp_interval)
        agg_disp2 = regress(geo2, self.l_disp_range, self.l_disp_interval)

        # selective fusion weights (igevpp_stereo.py:139-147,204-205)
        dstack = jnp.stack([agg_disp0, agg_disp1, agg_disp2], axis=-1)
        df = BasicConvIN(64, 1, 1, dtype=self.dtype, name="disp_conv0")(
            dstack, train=train)
        df = BasicConvIN(64, 3, 1, dtype=self.dtype, name="disp_conv1")(
            df, train=train)
        sw = BasicConvIN(128, 1, 1, dtype=self.dtype, name="selective_conv0")(
            jnp.concatenate([feats_l[0], df], axis=-1), train=train)
        sw = BasicConvIN(128, 3, 1, dtype=self.dtype, name="selective_conv1")(
            sw, train=train)
        sw = nn.Conv(3, (3, 3), padding="SAME", use_bias=False,
                     dtype=self.dtype, name="selective_conv2")(sw)
        sel_w = nn.sigmoid(sw)

        # context network
        cnet = MultiBasicEncoder([list(self.hidden_dims), list(self.hidden_dims)],
                                 norm="batch", downsample=self.n_downsample,
                                 dtype=self.dtype, name="cnet")(image1, train=train)
        net_list = [jnp.tanh(o[0]) for o in cnet]
        inp_list = []
        for i, o in enumerate(cnet):
            z = nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"context_zqr{i}")(nn.relu(o[1]))
            inp_list.append(tuple(jnp.split(z, 3, axis=-1)))

        # lookup pyramids: geo0 2-level, geo1/geo2 single, corr 2-level —
        # all geo segments share C, so ONE MultiLookup samples geo0's
        # levels + geo1 + geo2 in a single merged einsum per iteration
        ld = lookup_dtype(self.dtype)
        to_lookup = lambda v: jnp.transpose(  # noqa: E731  [B,H,W,C,D]
            v.astype(ld), (0, 2, 3, 4, 1))
        geo0_pyr = [to_lookup(geo0)]
        for _ in range(self.corr_levels - 1):
            geo0_pyr.append(avg_pool_last(geo0_pyr[-1]))
        geo_lookup = MultiLookup(geo0_pyr + [to_lookup(geo1), to_lookup(geo2)])
        corr = all_pairs_correlation(
            match_left.astype(ld), match_right.astype(ld))[:, :, :, None, :]
        corr_pyr = [corr]
        for _ in range(self.corr_levels - 1):
            corr_pyr.append(avg_pool_last(corr_pyr[-1]))
        corr_lookup = MultiLookup(corr_pyr)

        b, h4, w4 = agg_disp0.shape
        coords = jnp.broadcast_to(jnp.arange(w4, dtype=jnp.float32)[None, None, :],
                                  (b, h4, w4))

        spx_2_gru = Conv2x(32, deconv=True, norm="instance", dtype=self.dtype,
                           name="spx_2_gru")
        spx_gru = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype, name="spx_gru")

        def upsample_disp(disp4, mask_feat_4, stem_2x):
            x = spx_2_gru(mask_feat_4, stem_2x, train=train)
            spx = nn.softmax(spx_gru(x).astype(hd), axis=-1)
            return context_upsample(disp4 * 4.0, spx)  # [B,H,W]

        iters = self.train_iters if train else self.valid_iters
        ScannedLoop = nn.scan(
            _PPIteration,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            length=iters,
        )
        loop = ScannedLoop(
            hidden_dims=tuple(self.hidden_dims)[::-1],
            n_gru_layers=self.n_gru_layers,
            radius=self.corr_radius,
            num_levels=self.corr_levels,
            dtype=self.dtype,
            name="gru_loop",
        )
        carry = (tuple(net_list), agg_disp0[..., None])
        consts = (geo_lookup, corr_lookup, sel_w, tuple(inp_list), coords)
        carry, (disp_seq, mask_seq) = loop(carry, consts)
        final_disp = carry[1]
        final_mask_feat = mask_seq[-1]

        if train:
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
            # shared superpixel weights upsample all three coarse heads
            xspx = BasicConvIN(64, 3, 1, dtype=self.dtype, name="spx_4a")(
                feats_l[0], train=train)
            xspx = ConvBlock(64, 3, norm="instance", act=nn.relu,
                             dtype=self.dtype, name="spx_4b")(xspx, train=train)
            xspx = Conv2x(32, deconv=True, norm="instance", dtype=self.dtype,
                          name="spx_2")(xspx, stem_2x, train=train)
            spx = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype, name="spx")(xspx)
            spx = nn.softmax(spx.astype(hd), axis=-1)
            out["init_disp"] = [context_upsample(d * 4.0, spx)
                                for d in (agg_disp0, agg_disp1, agg_disp2)]
            out["disp_preds"] = disp_preds
        return out

    def get_loss(self, pred: Dict, data: Dict):
        """1.0/0.5/0.2-weighted smooth-L1 on the three range heads (each with
        its own validity cap) + γ-weighted L1 over GRU iterates
        (reference igevpp_stereo.py:258-295)."""
        gt = data["disp"]
        valid = (gt < self.max_disp) & (gt > 0)
        caps = list(self.disp_caps)
        loss = 0.0
        for w, p, cap in zip((1.0, 0.5, 0.2), pred["init_disp"], caps):
            loss = loss + w * masked_smooth_l1(p, gt, valid & (gt < cap))
        mask = valid & (gt < caps[-1])
        preds = pred["disp_preds"]
        n = len(preds)
        gamma = 0.9 ** (15.0 / max(n - 1, 1))
        for i, p in enumerate(preds):
            loss = loss + (gamma ** (n - i - 1)) * masked_l1(p, gt, mask)
        return loss, {"loss_disp": loss}
