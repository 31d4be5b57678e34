"""Stereo evaluation metrics, per-image with masked reduction.

Equivalents of the reference metrics
(reference: stereo/evaluation/metric_per_image.py:4-44, metric.py:4-30):
- EPE: mean absolute disparity error over valid pixels
- D1: % of valid pixels with |err| > 3 AND |err| > 5% of gt
- bad-τ ("thres_k"): % of valid pixels with |err| > τ

All are pure jnp functions over a [B,H,W] batch returning per-image values
[B]; empty masks yield 0 (the reference's empty-mask guard). The trainer's
distributed eval gathers these across hosts and dedups by sample index.
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_image_mean(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-image mean over valid pixels. value/mask: [B,H,W] → [B]."""
    m = mask.astype(value.dtype)
    denom = jnp.sum(m, axis=(1, 2))
    total = jnp.sum(value * m, axis=(1, 2))
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)


def epe_metric(disp_pred: jnp.ndarray, disp_gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return _masked_image_mean(jnp.abs(disp_pred - disp_gt), mask)


def d1_metric(disp_pred: jnp.ndarray, disp_gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    err = jnp.abs(disp_pred - disp_gt)
    bad = (err > 3.0) & (err > 0.05 * jnp.abs(disp_gt))
    return _masked_image_mean(bad.astype(disp_pred.dtype), mask) * 100.0


def threshold_metric(disp_pred: jnp.ndarray, disp_gt: jnp.ndarray, mask: jnp.ndarray,
                     threshold: float) -> jnp.ndarray:
    bad = jnp.abs(disp_pred - disp_gt) > threshold
    return _masked_image_mean(bad.astype(disp_pred.dtype), mask) * 100.0


METRIC_FNS = {
    "epe": epe_metric,
    "d1_all": d1_metric,
    "thres_1": lambda p, g, m: threshold_metric(p, g, m, 1.0),
    "thres_2": lambda p, g, m: threshold_metric(p, g, m, 2.0),
    "thres_3": lambda p, g, m: threshold_metric(p, g, m, 3.0),
}


def compute_metrics(disp_pred: jnp.ndarray, disp_gt: jnp.ndarray, mask: jnp.ndarray,
                    names=("epe", "d1_all", "thres_1", "thres_2", "thres_3")):
    """Per-image metric dict {name: [B]} (reference trainer_template.py:250-286)."""
    return {name: METRIC_FNS[name](disp_pred, disp_gt, mask) for name in names}


# --------------------------------------------------------------------------
# Scalar (whole-batch) variants — every valid pixel in the batch weighted
# equally, rather than per-image means (reference: stereo/evaluation/
# metric.py:4-30, the utility counterpart of metric_per_image.py).

def _masked_batch_mean(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(value.dtype)
    denom = jnp.sum(m)
    return jnp.where(denom > 0, jnp.sum(value * m) / jnp.maximum(denom, 1.0), 0.0)


def epe_metric_scalar(disp_pred, disp_gt, mask) -> jnp.ndarray:
    return _masked_batch_mean(jnp.abs(disp_pred - disp_gt), mask)


def d1_metric_scalar(disp_pred, disp_gt, mask) -> jnp.ndarray:
    err = jnp.abs(disp_pred - disp_gt)
    bad = (err > 3.0) & (err > 0.05 * jnp.abs(disp_gt))
    return _masked_batch_mean(bad.astype(disp_pred.dtype), mask) * 100.0


def threshold_metric_scalar(disp_pred, disp_gt, mask, threshold: float) -> jnp.ndarray:
    bad = jnp.abs(disp_pred - disp_gt) > threshold
    return _masked_batch_mean(bad.astype(disp_pred.dtype), mask) * 100.0
