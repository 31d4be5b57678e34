"""Layer-level numerical parity vs torch with copied weights.

Validates the layout/weight conventions (HWIO↔OIHW, NHWC↔NCHW) and norm
semantics that accuracy parity with the reference depends on.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from openstereo_tpu.models.layers import ConvBlock, DeconvBlock


def _to_nhwc(x_nchw):
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def test_convblock_bn_relu_matches_torch_eval():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 10, 12).astype(np.float32)  # NCHW
    cin, cout = 8, 16

    tconv = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
    tbn = tnn.BatchNorm2d(cout).eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.from_numpy(rng.randn(cout).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(rng.rand(cout).astype(np.float32) + 0.5))
        tbn.weight.copy_(torch.from_numpy(rng.randn(cout).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.randn(cout).astype(np.float32)))
        exp = F.relu(tbn(tconv(torch.from_numpy(x)))).numpy()

    blk = ConvBlock(cout, 3, norm="batch", act=jax.nn.relu)
    variables = blk.init(jax.random.key(0), _to_nhwc(x), train=False)
    # copy weights: torch OIHW → flax HWIO
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    variables = {
        "params": {"conv": {"kernel": jnp.asarray(w)},
                   "bn": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                          "bias": jnp.asarray(tbn.bias.detach().numpy())}},
        "batch_stats": {"bn": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                               "var": jnp.asarray(tbn.running_var.numpy())}},
    }
    got = np.asarray(blk.apply(variables, _to_nhwc(x), train=False))
    np.testing.assert_allclose(got, exp.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_convblock_instancenorm_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 9, 4).astype(np.float32)
    cin, cout = 6, 8

    tconv = tnn.Conv2d(cin, cout, 3, padding=1, bias=False)
    tin = tnn.InstanceNorm2d(cout)  # non-affine, matches reference default
    with torch.no_grad():
        exp = tin(tconv(torch.from_numpy(x))).numpy()

    blk = ConvBlock(cout, 3, norm="instance")
    variables = blk.init(jax.random.key(0), _to_nhwc(x), train=False)
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    variables = {"params": {"conv": {"kernel": jnp.asarray(w)}}}
    got = np.asarray(blk.apply(variables, _to_nhwc(x), train=False))
    np.testing.assert_allclose(got, exp.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)


def test_deconv_output_shape_matches_torch():
    """ConvTranspose k4 s2 p1 (reference BasicDeconv2d) must double H,W."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 5, 7).astype(np.float32)
    tdeconv = tnn.ConvTranspose2d(4, 6, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        exp_shape = tdeconv(torch.from_numpy(x)).shape

    blk = DeconvBlock(6, 4, 2)
    variables = blk.init(jax.random.key(0), _to_nhwc(x), train=False)
    got = blk.apply(variables, _to_nhwc(x), train=False)
    assert got.shape == (1, exp_shape[2], exp_shape[3], 6)


def test_depthwise_conv_matches_torch():
    rng = np.random.RandomState(3)
    c = 8
    x = rng.randn(1, c, 6, 10).astype(np.float32)
    tdw = tnn.Conv2d(c, c, 3, padding=1, groups=c, bias=False)
    with torch.no_grad():
        exp = tdw(torch.from_numpy(x)).numpy()

    blk = ConvBlock(c, 3, groups=c)
    variables = blk.init(jax.random.key(0), _to_nhwc(x), train=False)
    # torch dw weight [C,1,3,3] → flax grouped kernel [3,3,1,C]
    w = tdw.weight.detach().numpy().transpose(2, 3, 1, 0)
    got = np.asarray(blk.apply({"params": {"conv": {"kernel": jnp.asarray(w)}}},
                               _to_nhwc(x), train=False))
    np.testing.assert_allclose(got, exp.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)
