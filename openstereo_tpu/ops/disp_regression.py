"""Soft-argmax disparity regression (reference: stereo/modeling/disp_pred/disp_regression.py:8-12)."""

from __future__ import annotations

import jax.numpy as jnp


def disparity_regression(prob: jnp.ndarray, max_disp: int, axis: int = -1,
                         interval: int = 1) -> jnp.ndarray:
    """Expected disparity under a probability volume.

    prob: probabilities over the disparity axis (already softmaxed),
    default layout [B, H, W, D]. Returns [B, H, W] (the axis is reduced).

    `interval` spaces the disparity bin values (arange(0, max_disp,
    interval)) for coarse multi-range volumes (reference
    igev_rt/submodule.py:219-223 / igevpp S/M/L_DISP_INTERVAL).
    """
    n = max_disp // interval
    assert prob.shape[axis] == n, (prob.shape, axis, max_disp, interval)
    shape = [1] * prob.ndim
    shape[axis] = n
    disp_values = jnp.arange(0, max_disp, interval, dtype=prob.dtype).reshape(shape)
    return jnp.sum(prob * disp_values, axis=axis)
