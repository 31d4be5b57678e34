"""Pretrained-weight loading (reference: stereo/utils/common_utils.py:142-180).

Two entry points:
- ``load_variables(path)`` — read a {'params','batch_stats'} tree from a
  flax-msgpack file (written by tools/convert_ckpt.py) or directly from a
  reference torch ``.pth`` (auto-converted when the model name is given).
- ``partial_load(current, new)`` — shape-checked partial merge with the
  reference's reporting semantics: tensors whose path+shape match are
  replaced, everything else is kept and counted.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np


def load_variables(path: str, model_name: Optional[str] = None) -> Dict:
    """Load variables from .msgpack (flax-serialized) or reference .pth."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from ..utils.torch_convert import convert, load_torch_state_dict

        if model_name is None:
            raise ValueError(".pth checkpoints need model_name for conversion")
        return convert(model_name, load_torch_state_dict(path))
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def partial_load(current: Dict, new: Dict) -> Tuple[Dict, int, int]:
    """Merge `new` into `current` where path+shape match.

    Returns (merged, n_loaded, n_skipped).  Mirrors the reference's
    load_params_from_file reporting (common_utils.py:142-180).
    """
    flat_new = jax.tree_util.tree_flatten_with_path(new)[0]
    new_map = {jax.tree_util.keystr(k): v for k, v in flat_new}
    cur_flat, treedef = jax.tree_util.tree_flatten_with_path(current)
    loaded = skipped = 0
    leaves = []
    for key, val in cur_flat:
        ks = jax.tree_util.keystr(key)
        cand = new_map.get(ks)
        if cand is not None and np.shape(cand) == np.shape(val):
            leaves.append(jax.numpy.asarray(cand, dtype=val.dtype))
            loaded += 1
        else:
            leaves.append(val)
    skipped = len(new_map) - loaded
    return jax.tree_util.tree_unflatten(treedef, leaves), loaded, skipped
