"""Device mesh and sharding helpers.

The reference's distributed layer is torch DDP over NCCL
(reference: tools/train.py:59, trainer_template.py:82-84 — see SURVEY.md §2.11).
The TPU-native design replaces all of it with a `jax.sharding.Mesh` and
jit-compiled collectives:

- axis 'data': data parallelism — the batch is sharded, params are replicated,
  and the gradient all-reduce (DDP's backward hook) is inserted by XLA because
  grads of replicated params w.r.t. sharded data are global sums;
- axis 'model': optional tensor-ish parallelism over the disparity dimension of
  4D cost volumes (a designed-from-scratch feature; the reference has no TP);
- cross-replica BatchNorm (the reference's SyncBN conversion,
  trainer_template.py:76-78) needs no special handling: under jit the batch
  statistics are reductions over the *global* batch axis.

Collectives ride ICI within a slice; multi-host runs bootstrap with
`jax.distributed.initialize` instead of torchrun.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over ('data', 'model'); data defaults to n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (data, model, len(devices))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put numeric array leaves batch-sharded; drop non-array entries
    (e.g. the 'name' path strings) so the result can enter a jitted step."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.dtype != object:
            out[k] = jax.device_put(v, sh)
        elif hasattr(v, "sharding"):  # already a jax array
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/state) over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)
