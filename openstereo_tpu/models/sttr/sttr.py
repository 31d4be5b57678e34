"""STTR — stereo transformer with optimal-transport matching, TPU-native.

Re-design of the reference STTR
(reference: stereo/modeling/models/sttr/{sttr.py,utilities/*}):

- SPP backbone + DenseNet tokenizer → per-pixel 128-d tokens (full res),
  strided-sampled by DOWNSAMPLE (static slices, no index_select);
- alternating self/cross epipolar attention with relative sine encoding and
  remat (the reference's gradient checkpointing);
- optimal transport (log-space Sinkhorn, 10 iters, learned dustbin φ) via
  `lax.fori_loop` in float32;
- 3-px window disparity regression around the attention argmax, occlusion =
  1 − matched attention mass, nearest upsample + context adjustment layer;
- composite loss rr + l1_raw + l1 + occ_be, all masked statically
  (reference loss.py:184-212; boolean-index means become masked means).

Needs occlusion GT (FlyingThings3DSubsetDataset with RETURN_OCC_MASK) for
training, like the reference.
"""

from __future__ import annotations

import os

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import MODELS
from ..layers import head_dtype
from ..losses import masked_mean, smooth_l1
from .blocks import ContextAdjustmentLayer, SppBackboneIN, Tokenizer
from .transformer import Transformer

_EPS = 1e-6


def sinkhorn_log(attn: jnp.ndarray, log_mu: jnp.ndarray, log_nu: jnp.ndarray,
                 iters: int) -> jnp.ndarray:
    """Log-space Sinkhorn (reference regression_head.py:143-162). f32."""

    def body(_, uv):
        u, v = uv
        v = log_nu - jax.nn.logsumexp(attn + u[..., None], axis=-2)
        u = log_mu - jax.nn.logsumexp(attn + v[..., None, :], axis=-1)
        return u, v

    u = jnp.zeros_like(log_mu)
    v = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u, v))
    return attn + u[..., None] + v[..., None, :]


def optimal_transport(attn: jnp.ndarray, phi: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Add dustbins + Sinkhorn + renormalise (reference regression_head.py:164-190).

    attn: [N,H,W,W] raw similarities → [N,H,W+1,W+1] transport plan ×2W.
    """
    n, h, w, _ = attn.shape
    attn = attn.astype(head_dtype(attn.dtype))
    sim = jnp.concatenate([attn, jnp.broadcast_to(phi, (n, h, w, 1))], axis=-1)
    row = jnp.broadcast_to(phi, (n, h, 1, w + 1))
    sim = jnp.concatenate([sim, row], axis=-2)

    marginal = jnp.concatenate([jnp.ones((w,)), jnp.array([float(w)])]) / (2.0 * w)
    log_m = jnp.log(marginal)
    log_mu = jnp.broadcast_to(log_m, (n, h, w + 1))
    log_nu = jnp.broadcast_to(log_m, (n, h, w + 1))

    out = sinkhorn_log(sim, log_mu, log_nu, iters)
    return jnp.exp(out + jnp.log(2.0 * w))


def sample_1d_linear(source: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Linear sample along the last axis, clamped (reference misc.py:40-62).

    source [..., L], points [...] → [...].
    """
    l = source.shape[-1]
    lo = jnp.clip(jnp.floor(points), 0, l - 1)
    hi = jnp.clip(jnp.ceil(points), 0, l - 1)
    w_hi = points - lo
    w_lo = 1.0 - w_hi
    g_lo = jnp.take_along_axis(source, lo.astype(jnp.int32)[..., None], axis=-1)[..., 0]
    g_hi = jnp.take_along_axis(source, hi.astype(jnp.int32)[..., None], axis=-1)[..., 0]
    return g_lo * w_lo + g_hi * w_hi


def low_res_disp(attn: jnp.ndarray, occ_mask=None):
    """3-px window regression around argmax (reference regression_head.py:38-74).

    attn: [N,H,W,W] (dustbins stripped) → (disp [N,H,W], matched_attn [N,H,W]).
    """
    n, h, w, _ = attn.shape
    best = jnp.argmax(attn, axis=-1)  # [N,H,W]
    window = jnp.stack([best - 1, best, best + 1], axis=-1)  # [N,H,W,3]
    padded = jnp.pad(attn, ((0, 0), (0, 0), (0, 0), (1, 1)))
    attn_rw = jnp.take_along_axis(padded, window + 1, axis=-1)  # [N,H,W,3]

    norm = jnp.sum(attn_rw, axis=-1, keepdims=True)
    if occ_mask is None:
        norm = jnp.where(norm < 0.1, 1.0, norm)
    else:
        norm = jnp.where(occ_mask[..., None] > 0.5, 1.0, norm)
    attn_rw = attn_rw / norm

    # pos_shift[i, j] = max(i - j, 0)
    pos_l = jnp.arange(w, dtype=attn.dtype)[:, None]
    pos_r = jnp.arange(w, dtype=attn.dtype)[None, :]
    shift = jnp.maximum(pos_l - pos_r, 0.0)  # [W,W]
    shift_pad = jnp.pad(shift, ((0, 0), (1, 1)))
    shift_bc = jnp.broadcast_to(shift_pad, (n, h, w, w + 2))
    pos_rw = jnp.take_along_axis(shift_bc, window + 1, axis=-1)

    disp = jnp.sum(attn_rw * pos_rw, axis=-1)
    return disp, norm[..., 0]


@MODELS.register
class STTR(nn.Module):
    """forward(data) → {'disp_pred','occ_pred', + training aux}."""

    max_disp: int = 192
    channel_dim: int = 128
    nheads: int = 8
    num_attn_layers: int = 6
    downsample: int = 3
    cal_num_blocks: int = 8
    cal_feat_dim: int = 16
    cal_expansion_ratio: int = 4
    validation_max_disp: int = 192
    px_error_threshold: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], *, train: bool = False):
        left, right = data["left"], data["right"]
        bs, h, w, _ = left.shape

        backbone = SppBackboneIN(dtype=self.dtype, name="backbone")
        tokenizer = Tokenizer(self.channel_dim, dtype=self.dtype, name="tokenizer")
        # concat left+right along batch like the reference (one trunk pass)
        stacked = jnp.concatenate([left, right], axis=0)
        tokens = tokenizer(backbone(stacked, train=train), train=train)
        feat_left, feat_right = tokens[:bs], tokens[bs:]

        ds = self.downsample
        if ds > 0:
            off = ds // 2
            feat_left = feat_left[:, off::ds, off::ds]
            feat_right = feat_right[:, off::ds, off::ds]
            scale = w / feat_left.shape[2]
        else:
            scale = 1.0

        # fused Pallas attention on TPU. The analytic custom VJP
        # (ops/pallas/rel_attention.rel_attention_trainable) is
        # gradient-parity-tested, but on the remote-attached chip the fused
        # TRAIN step faults the TPU worker (eval is stable, and at the
        # reference 360×640 train crop the fused path showed no step-time
        # win anyway — docs/BENCHMARKS.md). Training therefore defaults to
        # the einsum path; OPENSTEREO_STTR_PALLAS_TRAIN=1 opts back in.
        use_pallas = (jax.default_backend() in ("tpu", "axon")
                      and os.environ.get("OPENSTEREO_STTR_PALLAS", "1") == "1"
                      and (not train or os.environ.get(
                          "OPENSTEREO_STTR_PALLAS_TRAIN", "0") == "1"))
        attn_raw = Transformer(self.channel_dim, self.nheads, self.num_attn_layers,
                               use_pallas=use_pallas,
                               dtype=self.dtype, name="transformer")(
            feat_left, feat_right, pos_scale=scale)  # [N,H',W',W']

        phi = self.param("phi", nn.initializers.zeros, ())
        attn_ot = optimal_transport(attn_raw, phi, iters=10)  # [N,H',W'+1,W'+1]

        # the reference clamps the 3-px window norm with the GT occlusion
        # mask whenever the sample carries one — at eval as well as train
        # (regression_head.py:258-279 sets occ_mask from x in both branches)
        occ_mask_s = None
        if "occ_mask" in data:
            occ_mask_s = data["occ_mask"][:, off::ds, off::ds] if ds > 0 else data["occ_mask"]

        disp_low, matched = low_res_disp(attn_ot[..., :-1, :-1], occ_mask_s)
        occ_low = 1.0 - matched

        # upsample (nearest) + context adjustment (reference regression_head.py:105-142).
        # torch F.interpolate(mode='nearest') picks src = floor(dst·in/out);
        # jax.image.resize rounds half-pixel centers — different pixels at
        # block boundaries, so index explicitly
        def nearest_up(x):
            hi = jnp.floor(jnp.arange(h) * (x.shape[1] / h)).astype(jnp.int32)
            wi = jnp.floor(jnp.arange(w) * (x.shape[2] / w)).astype(jnp.int32)
            return x[:, hi][:, :, wi]

        disp_up = nearest_up(disp_low * scale)
        occ_up = nearest_up(occ_low)

        mean_d = jnp.mean(disp_up)
        std_d = jnp.std(disp_up, ddof=1) + _EPS  # torch .std() is Bessel-corrected
        disp_n = ((disp_up - mean_d) / std_d)[..., None]
        occ_n = ((occ_up - 0.5) / 0.5)[..., None]
        cal = ContextAdjustmentLayer(self.cal_num_blocks, self.cal_feat_dim,
                                     self.cal_expansion_ratio, dtype=self.dtype,
                                     name="cal")
        disp_final, occ_final = cal(disp_n, occ_n, left)
        disp_final = disp_final[..., 0] * std_d + mean_d
        occ_final = occ_final[..., 0]

        out = {"disp_pred": disp_final, "occ_pred": occ_final,
               "disp_pred_low_res": disp_low * scale}
        if train and "disp" in data:
            # response at GT location for the rr loss (regression_head.py:76-103)
            disp_s = data["disp"][:, off::ds, off::ds] if ds > 0 else data["disp"]
            w_s = disp_low.shape[-1]
            # actual full-res column positions of the sampled tokens
            step = ds if ds > 0 else 1
            pos_l = (jnp.arange(w_s, dtype=jnp.float32) * step + (off if ds > 0 else 0))[None, None, :]
            target = (pos_l - disp_s) / scale  # [N,H',W'] in sampled coords
            out["gt_response"] = sample_1d_linear(attn_ot[..., :-1, :-1], target)
            if "occ_mask" in data:
                out["gt_response_occ_left"] = attn_ot[..., :-1, -1]
                out["gt_response_occ_right"] = attn_ot[..., -1, :-1]
        return out

    def get_loss(self, pred: Dict, data: Dict):
        """rr + l1_raw + l1 + occ_be, weights 1.0 (reference loss.py:184-212)."""
        ds = self.downsample
        off = ds // 2 if ds > 0 else 0
        disp = data["disp"]
        invalid = (disp <= 0.0) | (disp >= self.validation_max_disp)
        sub = lambda x: x[:, off::ds, off::ds] if ds > 0 else x  # noqa: E731
        invalid_s = sub(invalid)
        disp_s = sub(disp)

        losses = {}
        # rr loss: -log response at GT + dustbin responses in occluded regions
        valid_s = (~invalid_s).astype(head_dtype(self.dtype))
        rr_sum = jnp.sum(-jnp.log(pred["gt_response"] + _EPS) * valid_s)
        rr_cnt = jnp.sum(valid_s)
        if "gt_response_occ_left" in pred and "occ_mask" in data:
            occ_l = sub(data["occ_mask"]) > 0.5
            occ_r = sub(data["occ_mask_right"]) > 0.5
            rr_sum += jnp.sum(-jnp.log(pred["gt_response_occ_left"] + _EPS) * occ_l)
            rr_cnt += jnp.sum(occ_l)
            rr_sum += jnp.sum(-jnp.log(pred["gt_response_occ_right"] + _EPS) * occ_r)
            rr_cnt += jnp.sum(occ_r)
        losses["rr"] = rr_sum / jnp.maximum(rr_cnt, 1.0)

        losses["l1_raw"] = masked_mean(
            smooth_l1(pred["disp_pred_low_res"], disp_s), ~invalid_s)
        losses["l1"] = masked_mean(smooth_l1(pred["disp_pred"], disp), ~invalid)

        occ_pred = pred["occ_pred"]
        occ = data["occ_mask"] > 0.5
        be_sum = jnp.sum(-jnp.log(occ_pred + _EPS) * occ) + \
            jnp.sum(-jnp.log(1.0 - occ_pred + _EPS) * (~invalid))
        be_cnt = jnp.sum(occ) + jnp.sum(~invalid)
        losses["occ_be"] = be_sum / jnp.maximum(be_cnt, 1.0)

        total = losses["rr"] + losses["l1_raw"] + losses["l1"] + losses["occ_be"]
        return total, {"loss_disp": total, **{f"loss_{k}": v for k, v in losses.items()}}
