"""NMRF-Stereo — neural Markov random field stereo matching.

TPU-native re-design of reference stereo/modeling/models/nmrf/NMRF.py:24-506:
image encoder (ResNet-IN or Swin-T + deformable neck) → groupwise
correlation volume at 1/8 → DPN disparity-proposal extraction → NMRF
inference (5 swin-NMP layers over N=4 candidate labels, 8x8-subpixel
disparity + score heads) → NMRF refinement at 1/4 (5 swin-NMP layers on the
winning mode, 4x4-subpixel head).

The two custom CUDA ops of the reference become TPU-native kernels:
multi-scale deformable attention → ops/msda.py (gathers + MXU
contraction), superpixel-guided disparity downsample → ops/superpixel.py
(sort/scan modes). The criterion — bipartite proposal matching, initial
distribution cross-entropy, prob-weighted coarse losses, aux-layer L1 —
is implemented in pure jnp and runs inside the jitted train step
(reference NMRF.py:309-488, matcher.py:6-41).

Eval-time padding: the reference wraps inputs in InputPadder(divis_by=32)
(NMRF.py:225-227); in this framework the eval transform pipeline already
pads to fixed static shapes (RightTopPad — both 544x960 SceneFlow and
384x1248 KITTI are divisible by 32), so no in-model padding is needed.
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.cost_volume import build_gwc_volume
from ...ops.superpixel import superpixel_downsample
from ...registry import MODELS
from ..layers import head_dtype, siamese
from ..losses import smooth_l1
from .dpn import DPN
from .neck import ResNetEncoder, SwinEncoder
from .nmp import Inference, MLPHead, Refinement

Dtype = Any


class _InReluStack(nn.Module):
    """Conv3x3(bias=F) + InstanceNorm + relu + Conv1x1(bias=F)
    (reference NMRF.py:78-87). One instance is applied at BOTH the 1/8 and
    1/4 scales — the reference shares these weights across scales too."""

    mid: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.mid, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="c0")(x)
        y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         use_bias=False, use_scale=False, dtype=self.dtype,
                         name="in")(y)
        y = nn.relu(y)
        return nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                       name="c1")(y)


@MODELS.register
class NMRF(nn.Module):
    """forward(data) → {'disp_pred' [B,H,W], train: aux head outputs}."""

    model_type: str = "swin"          # 'swin' | 'resnet'
    out_channels: int = 128
    divis_by: int = 32                # informational; padding is in the
    compat: bool = False              # data pipeline (see module docstring)
    max_disp: int = 320
    num_proposals: int = 4
    num_infer_layers: int = 5
    num_refine_layers: int = 5
    infer_embed_dim: int = 128
    infer_n_heads: int = 4
    mlp_ratio: float = 4.0
    window_size: int = 6
    refine_window_size: int = 4
    with_refinement: bool = True
    backbone_drop_path: float = 0.4
    loss_max_disp: int = 192
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        image1 = data["left"]
        image2 = data["right"]

        if self.model_type == "swin":
            encoder = SwinEncoder(self.out_channels,
                                  drop_path_rate=self.backbone_drop_path,
                                  dtype=self.dtype, name="image_encoder")
        else:
            encoder = ResNetEncoder(self.out_channels, dtype=self.dtype,
                                    name="image_encoder")
        # one 2B-batch pass — NMRF's reference does the same (NMRF.py:194-209;
        # no BatchNorm anywhere, so train/eval numerics are unaffected)
        (f1_4, f1_8), (f2_4, f2_8) = siamese(
            lambda x: encoder(x, train=train), image1, image2)

        d8 = self.max_disp // 8
        cost_group = 4
        # [B, D, H, W, G] -> [B, H, W, G, D]
        gwc = build_gwc_volume(f1_8, f2_8, d8, cost_group)
        cost_volume = jnp.transpose(gwc, (0, 2, 3, 4, 1))

        prob, label_seeds, labels = DPN(
            cost_group=cost_group, num_proposals=self.num_proposals,
            dtype=self.dtype, name="dpn")(cost_volume, f1_8, train=train)

        # shared projection stacks, applied at both scales (NMRF.py:233-258)
        concatconv = _InReluStack(128, 64, dtype=self.dtype,
                                  name="concatconv")
        gw = _InReluStack(128, 256, dtype=self.dtype, name="gw")

        fmap1 = concatconv(f1_8)
        fmap2 = concatconv(f2_8)
        fmap1_gw = gw(f1_8)
        fmap2_gw = gw(f2_8)
        labels_curr = jax.lax.stop_gradient(labels)

        tgts = Inference(
            cost_group=32, dim=self.infer_embed_dim,
            num_layers=self.num_infer_layers, num_heads=self.infer_n_heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            dtype=self.dtype, name="inference")(
            labels_curr, fmap1, fmap2, fmap1_gw, fmap2_gw,
            train=train, intermediates=train)

        infer_head = MLPHead(self.infer_embed_dim, 8 * 8, dtype=self.dtype,
                             name="infer_head")
        score_head = nn.Dense(8 * 8, dtype=self.dtype,
                              name="infer_score_head")
        b, h8, w8, n = labels_curr.shape

        def expand8(x):  # [B,h8,w8,N,64] -> [B,H,W,N]
            x = x.reshape(b, h8, w8, n, 8, 8)
            x = x.transpose(0, 1, 4, 2, 5, 3)
            return x.reshape(b, h8 * 8, w8 * 8, n)

        coarse_disps = []
        masks = []
        for tgt in tgts:
            delta = infer_head(tgt)                       # [B,h8,w8,N,64]
            coarse_disps.append(expand8(
                nn.relu(labels_curr[..., None] + delta)))
            masks.append(expand8(0.25 * score_head(tgt)))

        out: Dict[str, jnp.ndarray] = {}
        hdt = head_dtype(self.dtype)
        if self.with_refinement:
            # winning mode -> median-pool 4x4 -> 1/4 grid (NMRF.py:248-254)
            idx = jnp.argmax(masks[-1].astype(hdt), axis=-1)[..., None]
            disp_curr = jnp.take_along_axis(coarse_disps[-1], idx,
                                            axis=-1)[..., 0] * 2.0
            hq, wq = h8 * 2, w8 * 2
            dc = disp_curr.reshape(b, hq, 4, wq, 4).transpose(0, 1, 3, 2, 4)
            dc = dc.reshape(b, hq, wq, 16)
            # torch.median: LOWER median for even count
            disp_curr = jnp.sort(dc, axis=-1)[..., (16 - 1) // 2]
            disp_curr = jax.lax.stop_gradient(disp_curr)

            rtgts = Refinement(
                cost_group=32, dim=self.infer_embed_dim,
                num_layers=self.num_refine_layers,
                num_heads=self.infer_n_heads,
                window_size=self.refine_window_size,
                mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                name="refinement")(
                disp_curr, concatconv(f1_4), concatconv(f2_4),
                gw(f1_4), gw(f2_4), train=train, intermediates=train)
            refine_head = MLPHead(self.infer_embed_dim, 4 * 4,
                                  dtype=self.dtype, name="refine_head")

            def expand4(x):  # [B,hq,wq,16] -> [B,H,W]
                x = x.reshape(b, hq, wq, 4, 4)
                x = x.transpose(0, 1, 3, 2, 4)
                return x.reshape(b, hq * 4, wq * 4)

            disp_preds = [expand4(nn.relu(disp_curr[..., None]
                                          + refine_head(t))) for t in rtgts]
            disp = disp_preds[-1] * 4.0
        else:
            disp_preds = []
            idx = jnp.argmax(masks[-1].astype(hdt), axis=-1)[..., None]
            disp = jnp.take_along_axis(coarse_disps[-1], idx,
                                       axis=-1)[..., 0] * 8.0

        out["disp_pred"] = disp.astype(hdt)
        if train:
            out["prob"] = prob
            out["proposal"] = labels
            out["initial_proposal"] = label_seeds
            out["coarse_disps"] = coarse_disps
            out["mask_logits"] = masks
            out["refine_disps"] = disp_preds
        return out

    # ------------------------------------------------------------------
    # criterion (reference NMRF.py:309-488 + matcher.py:6-41)
    # ------------------------------------------------------------------

    def get_loss(self, pred: Dict, data: Dict):
        gt = data["disp"]
        b, h, w = gt.shape
        valid_in = data.get("valid", gt < 512)
        gt = jnp.where(valid_in, gt, 0.0)
        # pipelines may ship masks as f32 (ToTensor) — normalise to bool
        occ = data.get("occ_mask", jnp.zeros_like(gt, bool)).astype(bool)
        occ2 = data.get("occ_mask_2", jnp.zeros_like(gt, bool)).astype(bool)
        spx = data.get("super_pixel_label")
        if spx is None:
            # fallback superpixels: 10x10 grid cells (LSC region_size=10,
            # reference sceneflow_dataset.py:40-45, without the image-
            # adaptive refinement)
            ys = jnp.arange(h) // 10
            xs = jnp.arange(w) // 10
            spx = jnp.broadcast_to((ys[:, None] * 4096 + xs[None, :]),
                                   (b, h, w)).astype(jnp.int32)

        losses = {}
        wd = {"proposal_disp": 1.0, "init": 1.0, "loss_disp": 2.0}
        for i, wgt in enumerate((1.0, 1.0, 1.0, 1.4, 1.4)):
            wd[f"loss_coarse_disp_{i}"] = wgt
        for i, wgt in zip(range(5, 9), (1.4, 1.4, 1.6, 2.0)):
            wd[f"loss_disp_{i}"] = wgt

        # --- proposal matching loss (loss_prop, NMRF.py:331-367) ---
        tgt_mini = superpixel_downsample(gt, spx)          # [B,h8,w8,4]
        tgt_mini = tgt_mini.reshape(-1, 4)
        prop = pred["proposal"].reshape(-1, self.num_proposals) * 8.0
        losses.update(self._loss_prop(prop, tgt_mini))

        # --- initial distribution loss (loss_init, NMRF.py:369-418) ---
        losses["init"] = self._loss_init(pred["prob"], gt, occ, occ2)

        # --- final refined-disparity loss ---
        mask = (gt > 0) & (gt < self.loss_max_disp)
        if pred["refine_disps"]:
            losses["loss_disp"] = self._masked_l1(
                pred["refine_disps"][-1] * 4.0, gt, mask)

        # --- aux losses: coarse layers then refine intermediates ---
        for i, (cd, lg) in enumerate(zip(pred["coarse_disps"],
                                         pred["mask_logits"])):
            prob_l = nn.softmax(lg, axis=-1)
            err = jnp.abs(cd * 8.0 - gt[..., None])
            per_pix = jnp.sum(prob_l * err, axis=-1)
            losses[f"loss_coarse_disp_{i}"] = self._masked_mean(per_pix, mask)
        for j, rd in enumerate(pred["refine_disps"][:-1]):
            losses[f"loss_disp_{5 + j}"] = self._masked_l1(
                rd * 4.0, gt, mask)

        total = sum(losses[k] * wd[k] for k in losses if k in wd)
        info = {"scalar/train/loss_disp": total}
        epe = self._masked_mean(jnp.abs(pred["disp_pred"] - gt), mask)
        info["scalar/train/epe"] = epe
        return total, info

    @staticmethod
    def _masked_mean(x, mask):
        m = mask.astype(x.dtype)
        return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)

    def _masked_l1(self, p, gt, mask):
        return self._masked_mean(jnp.abs(p - gt), mask)

    def _loss_prop(self, disp_prop, tgt_disp):
        """Bipartite match proposals ↔ GT modes (NMRF.py:331-367 +
        matcher.bf_match)."""
        # ignore modes >= 320 (NMRF.py:333-334)
        tgt_disp = jnp.where(tgt_disp >= 320, 0.0, tgt_disp)
        dist = jnp.abs(tgt_disp[:, :, None] - disp_prop[:, None, :])
        dist = jnp.where(tgt_disp[:, :, None] == 0, 1e6, dist)
        dmin = jnp.min(dist, axis=-1)
        order = jnp.argsort(dmin, axis=-1)
        tgt_disp = jnp.take_along_axis(tgt_disp, order, axis=-1)

        # NMS: suppress modes within 8px of an earlier kept mode
        # (NMRF.py:343-346) — static 3-step unroll
        for i in range(3):
            ref = tgt_disp[:, i:i + 1]
            tail = tgt_disp[:, i + 1:]
            sup = (ref > 0) & (jnp.abs(tail - ref) < 8)
            tgt_disp = jnp.concatenate(
                [tgt_disp[:, :i + 1], jnp.where(sup, 0.0, tail)], axis=1)

        # brute-force 1-to-1 matching over the 24 permutations
        cost = jnp.abs(tgt_disp[:, :, None] - disp_prop[:, None, :])
        cost = jnp.where(tgt_disp[:, :, None] == 0, 1e5, cost)
        disp_error = jnp.min(cost.reshape(cost.shape[0], -1), axis=1)
        perms = np.asarray(list(itertools.permutations(range(4), 4)))
        rows = np.arange(4)
        totals = jnp.stack([cost[:, rows, p].sum(-1) for p in perms], axis=-1)
        best = jnp.argmin(totals, axis=-1)
        indices = jnp.asarray(perms)[best]                 # [M, 4]
        src = jnp.take_along_axis(disp_prop, indices, axis=1)

        mask = (tgt_disp > 0) & (tgt_disp < 192)
        total_gts = jnp.sum(mask)
        loss = jnp.sum(smooth_l1(src, tgt_disp) * mask)
        out = {"proposal_disp": loss / (total_gts + 1e-6)}
        return out

    def _loss_init(self, prob, gt, occ, occ2):
        """Cross-entropy of the DPN distribution against the soft-binned GT
        at 1/8 (NMRF.py:369-418)."""
        b, h8, w8, nd = prob.shape
        _, h, w = gt.shape
        gt = jnp.maximum(gt, 0.0)
        valid = (gt > 0) & (gt < 320) & (~occ)
        xs = jnp.arange(w)
        coord = xs[None, None, :] - gt
        valid = valid & (coord >= 0)
        ci = jnp.clip(jnp.floor(coord), 0, None).astype(jnp.int32)
        nocc2 = jnp.take_along_axis(~occ2, jnp.clip(ci, 0, w - 1), axis=-1)
        valid = valid & nocc2

        tgt = gt / 8.0
        wgt = valid.astype(prob.dtype)
        # blocks of 8x8 full-res pixels per 1/8 cell
        def to_blocks(x):
            x = x.reshape(b, h8, 8, w8, 8)
            return x.transpose(0, 1, 3, 2, 4).reshape(b * h8 * w8, 64)
        tgt, wgt, vb = to_blocks(tgt), to_blocks(wgt), to_blocks(
            valid.astype(jnp.float32))

        lower = jnp.floor(tgt).astype(jnp.int32)
        hp = tgt - lower
        lower = jnp.clip(lower, 0, nd - 1)
        high = jnp.clip(lower + 1, 0, nd - 1)
        m = b * h8 * w8
        rows = jnp.arange(m)[:, None] * nd
        label = jnp.zeros((m * nd,), prob.dtype)
        label = label.at[(rows + lower).reshape(-1)].add(
            ((1 - hp) * wgt).reshape(-1))
        label = label.at[(rows + high).reshape(-1)].add((hp * wgt).reshape(-1))
        label = label.reshape(m, nd)
        label = label / jnp.maximum(label.sum(-1, keepdims=True), 1e-3)

        logp = jnp.log(jnp.maximum(prob.reshape(m, nd), 1e-6))
        ce = -jnp.sum(logp * label)
        valid_pix = jnp.sum(vb.sum(-1) > 0)
        return ce / (valid_pix + 1e-6)
