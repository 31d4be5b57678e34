"""Soft-argmax disparity regression (reference: stereo/modeling/disp_pred/disp_regression.py:8-12)."""

from __future__ import annotations

import jax.numpy as jnp


def disparity_regression(prob: jnp.ndarray, max_disp: int, axis: int = -1) -> jnp.ndarray:
    """Expected disparity under a probability volume.

    prob: probabilities over the disparity axis (already softmaxed),
    default layout [B, H, W, D]. Returns [B, H, W] (the axis is reduced).
    """
    assert prob.shape[axis] == max_disp, (prob.shape, axis, max_disp)
    shape = [1] * prob.ndim
    shape[axis] = max_disp
    disp_values = jnp.arange(max_disp, dtype=prob.dtype).reshape(shape)
    return jnp.sum(prob * disp_values, axis=axis)
