"""Optimizer construction: schedules, grad clip, and PARAM_GROUPS.

The PARAM_GROUPS test pins the NMRF recipe to the reference's six-way
AdamW bucketing (/root/reference/stereo/modeling/models/nmrf/
build_optimizer.py:10-70): backbone lr x0.1 + wd 1e-5, backbone
relative_position_bias_table lr x0.1 + wd 0, MSDA sampling_offsets
lr x0.1, relative_position_enc_table wd 0, everything else base lr and
wd 1e-5 (the reference's norm-module group uses the same base lr and
wd 1e-5 as the default, so it needs no explicit rule here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openstereo_tpu.config import Config
from openstereo_tpu.runtime.optim import build_optimizer

BASE_LR = 1e-3
BASE_WD = 1e-5

NMRF_GROUP_RULES = [
    {"MATCH": "image_encoder/backbone/.*relative_position_bias_table",
     "LR_SCALE": 0.1, "WEIGHT_DECAY": 0.0},
    {"MATCH": "image_encoder/backbone", "LR_SCALE": 0.1,
     "WEIGHT_DECAY": 1.0e-05},
    {"MATCH": "sampling_offsets", "LR_SCALE": 0.1},
    {"MATCH": "relative_position_enc_table", "WEIGHT_DECAY": 0.0},
]

# representative tiny NMRF tree: path -> (expected lr_scale, expected wd),
# the bucketing build_optimizer.py:38-65 would produce for the same names
NMRF_TREE_EXPECT = {
    ("image_encoder", "backbone", "layers_0_blocks_0", "attn",
     "relative_position_bias_table"): (0.1, 0.0),
    ("image_encoder", "backbone", "patch_embed_proj", "kernel"): (0.1, BASE_WD),
    ("image_encoder", "backbone", "layers_0_blocks_0", "norm1",
     "scale"): (0.1, BASE_WD),  # backbone rule precedes norm handling
    ("image_encoder", "neck", "extractors_0", "attn", "sampling_offsets",
     "kernel"): (0.1, BASE_WD),
    ("inference", "layers_0_nmp", "attn",
     "relative_position_enc_table"): (1.0, 0.0),
    ("inference", "layers_0_nmp", "norm1", "scale"): (1.0, BASE_WD),
    ("dpn", "label_seed", "proj", "kernel"): (1.0, BASE_WD),
}


def _nested(leaves):
    tree = {}
    for path, leaf in leaves.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return tree


def _opt_cfg():
    return Config.from_dict({
        "OPTIMIZER": {"NAME": "AdamW", "LR": BASE_LR,
                      "WEIGHT_DECAY": BASE_WD, "EPS": 1e-8,
                      "PARAM_GROUPS": NMRF_GROUP_RULES},
        "NUM_EPOCHS": 1,
    })


def test_param_groups_weight_decay_matches_reference():
    """Zero grads isolate the decoupled decay: delta == -lr_g * wd_g * p."""
    tx, _ = build_optimizer(_opt_cfg(), total_steps=10)
    params = _nested({p: jnp.ones((2,)) for p in NMRF_TREE_EXPECT})
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    got = _nested({p: None for p in NMRF_TREE_EXPECT})
    for path, (scale, wd) in NMRF_TREE_EXPECT.items():
        u = updates
        for k in path:
            u = u[k]
        want = -BASE_LR * scale * wd
        np.testing.assert_allclose(np.asarray(u), want, rtol=1e-6, atol=1e-12,
                                   err_msg="/".join(path))


def test_param_groups_lr_scale_matches_reference():
    """Constant unit grads at zero params: |delta| ~= lr_g (AdamW step-1
    normalized update is g/(|g|+eps) ~ 1)."""
    tx, _ = build_optimizer(_opt_cfg(), total_steps=10)
    params = _nested({p: jnp.zeros((2,)) for p in NMRF_TREE_EXPECT})
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    for path, (scale, _wd) in NMRF_TREE_EXPECT.items():
        u = updates
        for k in path:
            u = u[k]
        np.testing.assert_allclose(np.asarray(u), -BASE_LR * scale,
                                   rtol=1e-5, err_msg="/".join(path))


def test_param_groups_first_match_wins():
    """The backbone rpe-bias rule must shadow the plain backbone rule."""
    cfg = _opt_cfg()
    tx, _ = build_optimizer(cfg, total_steps=10)
    tree = _nested({
        ("image_encoder", "backbone", "b0", "attn",
         "relative_position_bias_table"): jnp.ones((3,)),
    })
    grads = jax.tree_util.tree_map(jnp.zeros_like, tree)
    updates, _ = tx.update(grads, tx.init(tree), tree)
    u = updates["image_encoder"]["backbone"]["b0"]["attn"][
        "relative_position_bias_table"]
    # wd 0 -> no decay at all despite backbone rule's wd 1e-5
    np.testing.assert_array_equal(np.asarray(u), 0.0)


def test_param_groups_rejects_wd_override_on_plain_adam():
    cfg = Config.from_dict({
        "OPTIMIZER": {"NAME": "Adam", "LR": BASE_LR,
                      "PARAM_GROUPS": [{"MATCH": "x", "WEIGHT_DECAY": 0.1}]},
        "NUM_EPOCHS": 1,
    })
    with pytest.raises(ValueError, match="decoupled-decay"):
        build_optimizer(cfg, total_steps=10)


def test_no_param_groups_unchanged():
    cfg = Config.from_dict({
        "OPTIMIZER": {"NAME": "AdamW", "LR": BASE_LR,
                      "WEIGHT_DECAY": BASE_WD},
        "NUM_EPOCHS": 1,
    })
    tx, sched = build_optimizer(cfg, total_steps=10)
    params = {"w": jnp.ones((2,))}
    updates, _ = tx.update({"w": jnp.zeros((2,))}, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -BASE_LR * BASE_WD,
                               rtol=1e-6)
    assert float(sched(0)) == BASE_LR


def test_nmrf_cfg_carries_param_groups():
    """The shipped NMRF training cfgs must actually wire the recipe."""
    cfg = Config.from_file("cfgs/nmrf/nmrf_swint_sceneflow.yaml")
    rules = cfg.OPTIMIZATION.OPTIMIZER.PARAM_GROUPS
    assert [r["MATCH"] for r in rules] == [
        r["MATCH"] for r in NMRF_GROUP_RULES]
