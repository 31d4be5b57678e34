"""StereoBase — OpenStereo's flagship strong-baseline GRU stereo model.

TPU-native re-design of the reference StereoBase
(reference: stereo/modeling/models/stereobase/stereobase_gru.py:14-242):

- MobileNetV2 trunk + Conv2x decoder feature pyramid (backbone.py:32-68,
  identical to IGEV's `Feature`), stem_2/stem_4 image stems;
- a **configurable fused cost volume**: any combination of group-wise
  correlation (NUM_GROUPS), concat (CONCAT_CHANNELS per side), L1 "sub",
  and interlaced (shared 3D-conv compressed) volumes, concatenated on the
  channel axis (stereobase_gru.py:139-160; cost_volume.py:59-169);
- a 3-level feature-gated 3D hourglass over the fused volume
  (hourglass.py:7-104 — shared with IGEV's GeoHourglass here);
- init disparity by soft-argmax, then iterative multi-scale ConvGRU
  refinement with pyramid lookups of (geo volume, all-pairs correlation)
  — the machinery shared with IGEV (gru_blocks.py:170-328 ==
  igev/{geometry,update}.py), run as one `nn.scan` over a static
  iteration count;
- superpixel context upsample of every iterate (train) / the last (eval);
- loss = smooth-L1 on the upsampled init disparity + γ-weighted L1 over
  the iterates (γ=0.9 adjusted, stereobase_gru.py:215-242).

Unlike IGEV, images arrive **pre-normalised** by the transform pipeline
(cfgs/stereobase/stereobase_sceneflow.yaml uses NormalizeImage 0.5/0.5);
the model performs no internal normalisation.

Layouts are NHWC / NDHWC (D,H,W spatial; channels on the 128-lane axis);
the volume builders are static-slice jnp ops; lookups are hat-matrix MXU
contractions (igev/geometry.py) rather than grid_sample gathers.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops import (
    build_concat_volume,
    build_gwc_volume,
    build_sub_volume,
    context_upsample,
    disparity_regression,
)
from ...registry import MODELS
from ...parallel.sharding import shard_disparity
from ..layers import ConvBlock, head_dtype, siamese
from ..losses import disp_valid_mask, masked_l1, masked_smooth_l1
from ..igev.blocks import BasicConvIN, Conv2x, Feature, FeatureAtt, MultiBasicEncoder
from ..igev.geometry import CombinedGeoEncodingVolume, lookup_dtype
from ..igev.igev import GeoHourglass, _GRUIteration


class InterlacedVolume(nn.Module):
    """Interleave L/R features per disparity shift and compress each shift
    with a shared 3D-conv stack into `num_features` channels
    (reference cost_volume.py:120-169).

    All D shifts are folded into the batch axis so the conv stack runs ONCE
    over [D·B, 2C, H, W, 1] instead of the reference's Python loop of D
    separate conv3d launches; per-shift column validity re-zeroes the
    out-of-frame columns after every stage (the reference computes each
    shift on a width-cropped slice, so stage boundaries see zeros).
    """

    num_features: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_l, feat_r, max_disp: int, *, train: bool = False):
        b, h, w, c = feat_l.shape
        shifts = []
        for d in range(max_disp):
            r = feat_r if d == 0 else jnp.pad(
                feat_r[:, :, :-d], ((0, 0), (0, 0), (d, 0), (0, 0)))
            shifts.append(jnp.stack([feat_l, r], axis=-1).reshape(b, h, w, 2 * c))
        x = jnp.concatenate(shifts, axis=0)  # [D·B, H, W, 2C]
        col_valid = (jnp.arange(w)[None, :]
                     >= jnp.repeat(jnp.arange(max_disp), b)[:, None])  # [D·B, W]
        x = jnp.where(col_valid[:, None, :, None], x, 0.0)
        x = jnp.transpose(x, (0, 3, 1, 2))[..., None]  # [D·B, 2C, H, W, 1]
        m3 = col_valid[:, None, None, :, None]
        # depth-reduction stack: 2C --(k8 s8)--> 2C/8 --(k8 s8)--> 2C/64
        # --(k3 s3, valid)--> 1 plane (reference kernel/stride schedule)
        for f, k, s, name in ((16, 8, 8, "c0"), (32, 8, 8, "c1"), (16, 3, 3, "c2")):
            x = ConvBlock(f, (k, 3, 3), strides=(s, 1, 1),
                          padding=[(0, 0), (1, 1), (1, 1)],
                          norm="batch", act=nn.relu, ndim=3, dtype=self.dtype,
                          name=name)(x, train=train)
            x = jnp.where(m3, x, 0.0)
        x = x[:, 0]  # [D·B, H, W, 16]
        x = ConvBlock(self.num_features, 1, norm="batch",
                      act=nn.relu, dtype=self.dtype,
                      name="volume11")(x, train=train)
        x = jnp.where(col_valid[:, None, :, None], x, 0.0)
        vol = x.reshape(max_disp, b, h, w, self.num_features)
        return jnp.transpose(vol, (1, 0, 2, 3, 4))  # [B, D, H, W, F]


@MODELS.register
@MODELS.register(name="StereoBaseGRU")  # reference MODEL.NAME
class StereoBase(nn.Module):
    """forward(data) → {'disp_pred', 'init_disp'+'disp_preds' (train)}.

    Expects images already normalised by the data pipeline (reference
    stereobase cfgs apply NormalizeImage MEAN/STD 0.5 — images in [-1,1]).
    """

    max_disp: int = 192
    num_groups: int = 8
    use_gwc_volume: bool = True
    use_concat_volume: bool = False
    use_sub_volume: bool = False
    use_interlaced_volume: bool = False
    concat_channels: int = 12
    interlaced_channels: int = 8
    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    n_downsample: int = 2
    slow_fast_gru: bool = False
    corr_levels: int = 2
    corr_radius: int = 4
    train_iters: int = 22
    eval_iters: int = 32
    dtype: Any = jnp.float32

    @property
    def volume_channels(self) -> int:
        c = 0
        if self.use_gwc_volume:
            c += self.num_groups
        if self.use_concat_volume:
            c += 2 * self.concat_channels
        if self.use_sub_volume:
            c += 1
        if self.use_interlaced_volume:
            c += self.interlaced_channels
        return c

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

        # stems: IN + LeakyReLU then IN + ReLU (stereobase_gru.py:63-78)
        def stem_pair(f, name):
            a = BasicConvIN(f, 3, 2, dtype=self.dtype, name=f"{name}a")
            b = ConvBlock(f, 3, norm="instance", act=nn.relu, dtype=self.dtype,
                          name=f"{name}b")
            return lambda x: b(a(x, train=train), train=train)

        stem_2 = stem_pair(32, "stem_2")
        stem_4 = stem_pair(48, "stem_4")
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

        # fused cost volume (stereobase_gru.py:139-160)
        d4 = self.max_disp // 4
        volumes = []
        if self.use_gwc_volume:
            volumes.append(build_gwc_volume(match_left, match_right, d4,
                                            self.num_groups))
        if self.use_concat_volume:
            concat0 = ConvBlock(32, 3, norm="batch", act=nn.relu,
                                dtype=self.dtype, name="concat_conv0")
            concat1 = nn.Conv(self.concat_channels, (1, 1), use_bias=False,
                              dtype=self.dtype, name="concat_conv1")
            cc = lambda x: concat1(concat0(x, train=train))  # noqa: E731
            volumes.append(build_concat_volume(cc(match_left), cc(match_right), d4))
        if self.use_sub_volume:
            sub = build_sub_volume(match_left, match_right, d4)  # [B,H,W,D]
            volumes.append(jnp.transpose(sub, (0, 3, 1, 2))[..., None])
        if self.use_interlaced_volume:
            volumes.append(InterlacedVolume(
                self.interlaced_channels, dtype=self.dtype,
                name="build_interlaced_volume")(
                    match_left, match_right, d4, train=train))
        cost_volume = (volumes[0] if len(volumes) == 1
                       else jnp.concatenate(volumes, axis=-1))
        cost_volume = shard_disparity(cost_volume)  # D over mesh 'model'

        vc = self.volume_channels
        geo_volume = GeoHourglass(vc, dtype=self.dtype, name="cost_agg")(
            cost_volume, feats_l, train=train)  # [B,D/4,H/4,W/4,vc]

        cost = nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype, name="classifier")(geo_volume)
        prob = nn.softmax(cost[..., 0].astype(head_dtype(self.dtype)), axis=1)
        init_disp = disparity_regression(prob, d4, axis=1)  # [B,H/4,W/4]

        # context network (gru_blocks.py:62-149)
        cnet = MultiBasicEncoder([list(self.hidden_dims), list(self.hidden_dims)],
                                 norm="batch", downsample=self.n_downsample,
                                 dtype=self.dtype, name="cnet")(image1, train=train)
        net_list = [jnp.tanh(o[0]) for o in cnet]
        inp_list = []
        for i, o in enumerate(cnet):
            z = nn.Conv(self.hidden_dims[i] * 3, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"context_zqr{i}")(nn.relu(o[1]))
            inp_list.append(tuple(jnp.split(z, 3, axis=-1)))

        geo_fn = CombinedGeoEncodingVolume(
            match_left.astype(lookup_dtype(self.dtype)),
            match_right.astype(lookup_dtype(self.dtype)),
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

        iters = self.train_iters if train else self.eval_iters
        ScannedLoop = nn.scan(
            _GRUIteration,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            length=iters,
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
            # upsample every iterate: fold iterations into batch so the
            # superpixel convs run once over [iters·B, ...]
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
            # superpixel upsample of the init disparity (stereobase_gru.py:205-209)
            xspx = BasicConvIN(24, 3, 1, dtype=self.dtype, name="spx_4a")(
                feats_l[0], train=train)
            xspx = ConvBlock(24, 3, norm="instance", act=nn.relu, dtype=self.dtype,
                             name="spx_4b")(xspx, train=train)
            xspx = Conv2x(32, deconv=True, norm="instance", dtype=self.dtype,
                          name="spx_2")(xspx, stem_2x, train=train)
            spx = nn.ConvTranspose(9, (4, 4), strides=(2, 2), padding="SAME",
                                   dtype=self.dtype, name="spx")(xspx)
            spx = nn.softmax(spx.astype(head_dtype(self.dtype)), axis=-1)
            out["init_disp"] = context_upsample(init_disp * 4.0, spx)
            out["disp_preds"] = disp_preds
        return out

    def get_loss(self, pred: Dict, data: Dict):
        """Smooth-L1 on init + γ-weighted L1 over iterates
        (reference stereobase_gru.py:215-242, identical to IGEV's)."""
        gt = data["disp"]
        mask = disp_valid_mask(gt, self.max_disp)
        loss = masked_smooth_l1(pred["init_disp"], gt, mask)
        preds = pred["disp_preds"]
        n = len(preds)
        gamma = 0.9 ** (15.0 / max(n - 1, 1))
        for i, p in enumerate(preds):
            loss = loss + (gamma ** (n - i - 1)) * masked_l1(p, gt, mask)
        return loss, {"loss_disp": loss}
