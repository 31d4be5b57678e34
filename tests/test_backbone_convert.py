"""Structural test for the timm-MobileNetV2 ImageNet backbone converter.

Builds a state_dict with timm `mobilenetv2_100`'s exact key names and shapes
(synthetic values — timm itself isn't available offline), converts it, and
checks every tensor lands at a matching path+shape in a freshly initialized
`MobileNetV2Features` tree. Numeric conv/BN layout conventions are covered
by tests/test_layer_parity.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openstereo_tpu.models.backbones import MobileNetV2Features
from openstereo_tpu.runtime.pretrained import partial_load
from openstereo_tpu.utils.torch_convert import (
    convert_timm_mobilenetv2, nest_tree)


def _bn(sd, key, c):
    sd[f"{key}.weight"] = np.random.rand(c).astype(np.float32)
    sd[f"{key}.bias"] = np.random.rand(c).astype(np.float32)
    sd[f"{key}.running_mean"] = np.random.rand(c).astype(np.float32)
    sd[f"{key}.running_var"] = np.random.rand(c).astype(np.float32) + 1
    sd[f"{key}.num_batches_tracked"] = np.asarray(0)


def timm_mobilenetv2_sd():
    sd = {}
    sd["conv_stem.weight"] = np.random.randn(32, 3, 3, 3).astype(np.float32)
    _bn(sd, "bn1", 32)
    sd["blocks.0.0.conv_dw.weight"] = np.random.randn(32, 1, 3, 3).astype(np.float32)
    _bn(sd, "blocks.0.0.bn1", 32)
    sd["blocks.0.0.conv_pw.weight"] = np.random.randn(16, 32, 1, 1).astype(np.float32)
    _bn(sd, "blocks.0.0.bn2", 16)
    cin = 16
    for si, (cout, n) in ((1, (24, 2)), (2, (32, 3)), (3, (64, 4)),
                          (4, (96, 3)), (5, (160, 3))):
        for bi in range(n):
            hid = cin * 6
            t = f"blocks.{si}.{bi}"
            sd[f"{t}.conv_pw.weight"] = np.random.randn(hid, cin, 1, 1).astype(np.float32)
            _bn(sd, f"{t}.bn1", hid)
            sd[f"{t}.conv_dw.weight"] = np.random.randn(hid, 1, 3, 3).astype(np.float32)
            _bn(sd, f"{t}.bn2", hid)
            sd[f"{t}.conv_pwl.weight"] = np.random.randn(cout, hid, 1, 1).astype(np.float32)
            _bn(sd, f"{t}.bn3", cout)
            cin = cout
    # past-the-taps keys the converter must tolerate (features_only pruning)
    sd["blocks.6.0.conv_pw.weight"] = np.random.randn(960, 160, 1, 1).astype(np.float32)
    sd["conv_head.weight"] = np.random.randn(1280, 320, 1, 1).astype(np.float32)
    _bn(sd, "bn2", 1280)
    sd["classifier.weight"] = np.random.randn(1000, 1280).astype(np.float32)
    sd["classifier.bias"] = np.random.randn(1000).astype(np.float32)
    return sd


def test_timm_mobilenetv2_covers_trunk_exactly():
    variables = convert_timm_mobilenetv2(timm_mobilenetv2_sd())

    model = MobileNetV2Features()
    init = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)

    n_conv = len(jax.tree.leaves(variables["params"]))
    merged, loaded, skipped = partial_load(init["params"], variables["params"])
    assert skipped == 0, "converted param at a path/shape absent from the model"
    assert loaded == n_conv == len(jax.tree.leaves(init["params"]))

    n_bs = len(jax.tree.leaves(variables["batch_stats"]))
    _, loaded_bs, skipped_bs = partial_load(init["batch_stats"],
                                            variables["batch_stats"])
    assert skipped_bs == 0
    assert loaded_bs == n_bs == len(jax.tree.leaves(init["batch_stats"]))


def test_nest_tree_prefix():
    variables = {"params": {"stem": {"conv": {"kernel": np.zeros((3, 3, 3, 32))}}},
                 "batch_stats": {}}
    nested = nest_tree(variables, "backbone/trunk")
    assert "kernel" in nested["params"]["backbone"]["trunk"]["stem"]["conv"]
    assert nest_tree(variables, "")["params"] is variables["params"]


def test_converter_rejects_leftover_keys():
    sd = timm_mobilenetv2_sd()
    sd["blocks.0.0.se.conv_reduce.weight"] = np.zeros((8, 32, 1, 1), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        convert_timm_mobilenetv2(sd)
