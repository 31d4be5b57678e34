"""Loss primitives shared by the model zoo.

The reference computes masked losses via boolean indexing
(`F.smooth_l1_loss(pred[mask], gt[mask])`, e.g. lightstereo.py:73-86) which is
a dynamic shape; on TPU we keep static shapes and reduce with where/sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber/smooth-L1 (torch F.smooth_l1_loss semantics, beta=1)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of `values` where `mask`; 0 if the mask is empty."""
    mask = mask.astype(values.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(values * mask) / denom


def masked_smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return masked_mean(smooth_l1(pred, target), mask)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return masked_mean(jnp.abs(pred - target), mask)


def disp_valid_mask(disp_gt: jnp.ndarray, max_disp: float) -> jnp.ndarray:
    """Standard validity mask: 0 < gt < max_disp (reference lightstereo.py:76)."""
    return (disp_gt > 0) & (disp_gt < max_disp)


# --------------------------------------------------------------------------
# Classification-loss reference implementations. The reference ships these
# as an unused utility library (reference: stereo/modeling/common/
# loss.py:6-73); kept here with the same semantics for users building
# occlusion/confidence heads. All mean-reduced, pure jnp.

def bce(probs: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Binary cross-entropy on probabilities (post-sigmoid), mean-reduced."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable BCE on logits: max(x,0) - x·t + log(1+e^-|x|)."""
    return jnp.mean(jnp.maximum(logits, 0.0) - logits * targets +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                  axis: int = 1) -> jnp.ndarray:
    """Softmax cross-entropy over `axis`. Targets are either integer class
    indices (logits shape minus the class axis) or a soft distribution with
    the same shape as logits."""
    logp = logits - jax.nn.logsumexp(logits, axis=axis, keepdims=True)
    if targets.shape == logits.shape:
        return -jnp.mean(jnp.sum(targets * logp, axis=axis))
    onehot_logp = jnp.take_along_axis(
        logp, jnp.expand_dims(targets.astype(jnp.int32), axis), axis=axis)
    return -jnp.mean(onehot_logp)


def kl_div(log_pred: jnp.ndarray, targets: jnp.ndarray,
           reduction: str = "mean", eps: float = 1e-12) -> jnp.ndarray:
    """KL(targets ‖ exp(log_pred)), pointwise t·(log t − log p) with the
    torch convention that inputs are already log-probabilities."""
    pointwise = targets * (jnp.log(jnp.maximum(targets, eps)) - log_pred)
    pointwise = jnp.where(targets > 0, pointwise, 0.0)
    if reduction == "mean":
        return jnp.mean(pointwise)
    if reduction == "batchmean":
        return jnp.sum(pointwise) / log_pred.shape[0]
    return pointwise
