"""In-model sharding constraints — the disparity/tensor-parallel axis.

The reference has exactly one parallelism strategy (DP via DDP — SURVEY.md
§2.11). This module adds the designed-from-scratch second axis: sharding the
**disparity dimension of 4D cost volumes** over the mesh `model` axis, so the
3D-aggregation FLOPs and the volume's HBM footprint split across chips, with
XLA inserting halo exchanges/collectives for the D-strided convolutions.

Constraints are ambient-mesh aware: without `jax.set_mesh` (single-chip or
pure-DP runs) every helper is an exact no-op, so models call them
unconditionally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _ambient_axes():
    try:
        mesh = jax.sharding.get_abstract_mesh()
        return dict(zip(mesh.axis_names, mesh.shape.values())) if mesh.axis_names else {}
    except Exception:
        return {}


def shard_disparity(volume: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Constrain a [B, D, H, W, C] cost volume: batch over 'data', D over 'model'."""
    axes = _ambient_axes()
    if axes.get("model", 1) <= 1:
        return volume
    if volume.shape[axis] % axes["model"] != 0:
        return volume
    spec = [None] * volume.ndim
    if "data" in axes:
        spec[0] = "data"
    spec[axis] = "model"
    return jax.lax.with_sharding_constraint(volume, P(*spec))


def constrain_batch(x: jnp.ndarray) -> jnp.ndarray:
    """Constrain the leading axis over 'data' (no-op without a mesh)."""
    axes = _ambient_axes()
    if "data" not in axes:
        return x
    return jax.lax.with_sharding_constraint(
        x, P("data", *([None] * (x.ndim - 1))))
