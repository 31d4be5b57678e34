"""Tap-merged 3D convolution vs XLA's native Conv3D (ops/conv3d.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openstereo_tpu.ops.conv3d import conv3d_tap_merged


@pytest.mark.parametrize("case", [
    # (shape, kshape, strides, padding, dilation, groups)
    (((2, 8, 10, 12, 16), (3, 3, 3, 16, 24)), (1, 1, 1), ((1, 1), (1, 1), (1, 1)), (1, 1, 1), 1),
    (((1, 9, 11, 13, 8), (3, 3, 3, 8, 8)), (2, 2, 2), ((1, 1), (1, 1), (1, 1)), (1, 1, 1), 1),
    (((1, 8, 10, 12, 12), (3, 3, 3, 12, 12)), (1, 1, 1), ((2, 2), (2, 2), (2, 2)), (2, 2, 2), 1),
    (((1, 8, 10, 12, 16), (3, 3, 3, 1, 16)), (1, 1, 1), ((1, 1), (1, 1), (1, 1)), (1, 1, 1), 16),
    (((1, 8, 10, 12, 16), (3, 3, 3, 4, 8)), (1, 1, 1), ((1, 1), (1, 1), (1, 1)), (1, 1, 1), 4),
    (((1, 6, 8, 8, 8), (1, 1, 1, 8, 32)), (1, 1, 1), ((0, 0), (0, 0), (0, 0)), (1, 1, 1), 1),
    (((1, 7, 9, 9, 8), (3, 3, 3, 8, 16)), (2, 1, 1), ((1, 1), (1, 1), (1, 1)), (1, 1, 1), 1),
    (((1, 64, 10, 12, 1), (8, 3, 3, 1, 16)), (8, 1, 1), ((0, 0), (1, 1), (1, 1)), (1, 1, 1), 1),
    (((1, 9, 10, 12, 8), (3, 3, 3, 8, 8)), (2, 1, 1), ((0, 1), (1, 1), (1, 1)), (1, 1, 1), 1),
    (((1, 12, 9, 10, 8), (7, 1, 1, 8, 8)), (1, 1, 1), ((3, 3), (0, 0), (0, 0)), (1, 1, 1), 1),
    (((1, 12, 9, 10, 8), (5, 1, 1, 8, 16)), (2, 1, 1), ((2, 2), (0, 0), (0, 0)), (1, 1, 1), 1),
    (((1, 12, 9, 10, 8), (5, 1, 1, 1, 8)), (1, 1, 1), ((2, 2), (0, 0), (0, 0)), (1, 1, 1), 8),
    (((1, 10, 9, 11, 8), (3, 3, 3, 8, 12)), (1, 1, 1), ((1, 1), (1, 1), (1, 1)), (1, 1, 1), 1),
    (((1, 10, 9, 11, 4), (3, 3, 3, 4, 8)), (1, 2, 2), ((2, 0), (1, 1), (1, 1)), (1, 1, 1), 1),
], ids=["basic", "stride2", "dilated", "depthwise", "grouped", "pointwise", "dstride",
        "nonoverlap", "asympad", "depthaxis", "depthaxis_stride", "depthaxis_dw",
        "narrow_inpside", "narrow_inpside_asym"])
def test_matches_native_conv3d(case):
    (xshape, kshape), strides, padding, dilation, groups = case
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*xshape), jnp.float32)
    k = jnp.asarray(rng.randn(*kshape) / 10, jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, k, strides, padding, rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv3d_tap_merged(x, k, strides=strides, padding=padding,
                            dilation=dilation, groups=groups)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_module_param_tree_matches_nn_conv():
    """Conv3DTapMerged must be a drop-in for nn.Conv (checkpoint compat)."""
    from flax import linen as nn

    from openstereo_tpu.ops.conv3d import Conv3DTapMerged

    x = jnp.zeros((1, 4, 6, 6, 8))
    a = nn.Conv(16, (3, 3, 3), strides=(1, 1, 1),
                padding=[(1, 1)] * 3, use_bias=True)
    b = Conv3DTapMerged(16, (3, 3, 3), strides=(1, 1, 1),
                        padding=[(1, 1)] * 3, use_bias=True)
    va = a.init(jax.random.key(0), x)
    vb = b.init(jax.random.key(0), x)
    sa = jax.tree.map(lambda t: (t.shape, t.dtype), va)
    sb = jax.tree.map(lambda t: (t.shape, t.dtype), vb)
    assert sa == sb
    # identical params → identical output
    out_a = a.apply(va, x)
    out_b = b.apply(va, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", [
    ((1, 6, 8, 10, 8), (3, 3, 3, 8, 16), (2, 2, 2), ((1, 2),) * 3),
    ((2, 5, 7, 9, 4), (3, 3, 3, 4, 4), (2, 2, 2), ((1, 2),) * 3),
    ((1, 6, 8, 10, 8), (3, 3, 3, 8, 8), (1, 1, 1), ((1, 1),) * 3),
], ids=["hourglass", "odd", "stride1"])
def test_transpose_matches_native(case):
    from openstereo_tpu.ops.conv3d import conv3d_transpose_tap_merged

    xshape, kshape, strides, padding = case
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*xshape), jnp.float32)
    k = jnp.asarray(rng.randn(*kshape) / 10, jnp.float32)
    ref = jax.lax.conv_transpose(
        x, k, strides, padding, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = conv3d_transpose_tap_merged(x, k, strides=strides, padding=padding)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_transpose_module_param_tree():
    from flax import linen as nn

    from openstereo_tpu.ops.conv3d import ConvTranspose3DTapMerged

    x = jnp.zeros((1, 4, 6, 6, 8))
    pad = ((1, 2), (1, 2), (1, 2))
    a = nn.ConvTranspose(16, (3, 3, 3), strides=(2, 2, 2), padding=pad,
                         use_bias=True)
    b = ConvTranspose3DTapMerged(16, (3, 3, 3), strides=(2, 2, 2),
                                 padding=pad, use_bias=True)
    va = a.init(jax.random.key(0), x)
    vb = b.init(jax.random.key(0), x)
    assert jax.tree.map(lambda t: t.shape, va) == jax.tree.map(lambda t: t.shape, vb)
    np.testing.assert_allclose(np.asarray(a.apply(va, x)),
                               np.asarray(b.apply(va, x)), rtol=1e-5, atol=1e-5)
