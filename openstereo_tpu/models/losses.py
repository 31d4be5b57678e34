"""Loss primitives shared by the model zoo.

The reference computes masked losses via boolean indexing
(`F.smooth_l1_loss(pred[mask], gt[mask])`, e.g. lightstereo.py:73-86) which is
a dynamic shape; on TPU we keep static shapes and reduce with where/sum.
"""

from __future__ import annotations

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
