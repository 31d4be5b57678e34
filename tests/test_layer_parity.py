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


def test_deconv_k4s2_matches_torch():
    """ConvTranspose k4 s2 p1 (reference BasicDeconv2d) — values, not just
    shape, with the torch_convert weight rule (transpose + spatial mirror)."""
    from openstereo_tpu.utils.torch_convert import deconv_kernel

    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 5, 7).astype(np.float32)
    tdeconv = tnn.ConvTranspose2d(4, 6, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        exp = tdeconv(torch.from_numpy(x)).numpy()

    blk = DeconvBlock(6, 4, 2)
    variables = {"params": {"deconv": {
        "kernel": jnp.asarray(deconv_kernel(tdeconv.weight.detach().numpy()))}}}
    got = np.asarray(blk.apply(variables, _to_nhwc(x), train=False))
    np.testing.assert_allclose(got, exp.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_deconv_k3s2_matches_torch():
    """ConvTranspose k3 s2 p1 op1 (reference hourglass deconvs) — torch's
    pixel alignment needs flax padding ((1,2),(1,2)), not SAME."""
    from openstereo_tpu.utils.torch_convert import deconv_kernel

    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 5, 7).astype(np.float32)
    tdeconv = tnn.ConvTranspose2d(4, 6, 3, stride=2, padding=1,
                                  output_padding=1, bias=False)
    with torch.no_grad():
        exp = tdeconv(torch.from_numpy(x)).numpy()

    blk = DeconvBlock(6, 3, 2)
    variables = {"params": {"deconv": {
        "kernel": jnp.asarray(deconv_kernel(tdeconv.weight.detach().numpy()))}}}
    got = np.asarray(blk.apply(variables, _to_nhwc(x), train=False))
    assert got.shape == (1, 10, 14, 6)
    np.testing.assert_allclose(got, exp.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_deconv3d_k3s2_matches_torch():
    """ConvTranspose3d k3 s2 p1 op1 (reference psmnet_cost_processor.py:101)."""
    from openstereo_tpu.utils.torch_convert import deconv_kernel

    rng = np.random.RandomState(4)
    x = rng.randn(1, 4, 4, 5, 6).astype(np.float32)  # NCDHW
    tdeconv = tnn.ConvTranspose3d(4, 6, 3, stride=2, padding=1,
                                  output_padding=1, bias=False)
    with torch.no_grad():
        exp = tdeconv(torch.from_numpy(x)).numpy()

    blk = DeconvBlock(6, 3, 2, ndim=3)
    variables = {"params": {"deconv": {
        "kernel": jnp.asarray(deconv_kernel(tdeconv.weight.detach().numpy()))}}}
    got = np.asarray(blk.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
                               train=False))
    np.testing.assert_allclose(got, exp.transpose(0, 2, 3, 4, 1),
                               rtol=1e-4, atol=1e-5)


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


def test_convgru_matches_torch():
    """IGEV ConvGRU cell vs a hand-built torch equivalent (update.py:28-44)."""
    from openstereo_tpu.models.igev.update import ConvGRU

    rng = np.random.RandomState(4)
    b, hh, ww, hd, xd = 1, 5, 7, 8, 6
    h0 = rng.randn(b, hh, ww, hd).astype(np.float32)
    xin = rng.randn(b, hh, ww, xd).astype(np.float32)
    cz = rng.randn(b, hh, ww, hd).astype(np.float32)
    cr = rng.randn(b, hh, ww, hd).astype(np.float32)
    cq = rng.randn(b, hh, ww, hd).astype(np.float32)

    cell = ConvGRU(hidden_dim=hd)
    variables = cell.init(jax.random.key(0),
                          jnp.asarray(h0), (jnp.asarray(cz), jnp.asarray(cr),
                                            jnp.asarray(cq)), jnp.asarray(xin))
    p = variables["params"]

    def tconv(name, inp):
        w = np.asarray(p[name]["kernel"]).transpose(3, 2, 0, 1)  # HWIO→OIHW
        bvec = np.asarray(p[name]["bias"])
        return F.conv2d(inp, torch.from_numpy(w.copy()),
                        torch.from_numpy(bvec), padding=1)

    th = torch.from_numpy(h0.transpose(0, 3, 1, 2))
    tx = torch.from_numpy(xin.transpose(0, 3, 1, 2))
    thx = torch.cat([th, tx], 1)
    z = torch.sigmoid(tconv("convz", thx) + torch.from_numpy(cz.transpose(0, 3, 1, 2)))
    r = torch.sigmoid(tconv("convr", thx) + torch.from_numpy(cr.transpose(0, 3, 1, 2)))
    q = torch.tanh(tconv("convq", torch.cat([r * th, tx], 1))
                   + torch.from_numpy(cq.transpose(0, 3, 1, 2)))
    exp = ((1 - z) * th + z * q).detach().numpy().transpose(0, 2, 3, 1)

    got = np.asarray(cell.apply(variables, jnp.asarray(h0),
                                (jnp.asarray(cz), jnp.asarray(cr), jnp.asarray(cq)),
                                jnp.asarray(xin)))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_split_pointwise_matches_concat_conv():
    """SplitPointwise (blockwise 1x1 contraction over 5D lookup blocks)
    must match concat -> reshape -> nn.Conv 1x1 with the SAME param tree."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from openstereo_tpu.models.igev.update import SplitPointwise

    rng = np.random.RandomState(0)
    blocks = [jnp.asarray(rng.randn(2, 5, 7, c, t), jnp.float32)
              for c, t in [(24, 9), (1, 9), (24, 9), (1, 9)]]
    cin = sum(b.shape[-2] * b.shape[-1] for b in blocks)

    sp = SplitPointwise(64)
    v = sp.init(jax.random.key(0), blocks)
    assert set(v["params"].keys()) == {"kernel", "bias"}
    assert v["params"]["kernel"].shape == (1, 1, cin, 64)

    got = sp.apply(v, blocks)
    flat = jnp.concatenate(
        [b.reshape(*b.shape[:3], -1) for b in blocks], axis=-1)
    conv = nn.Conv(64, (1, 1), padding="SAME")
    exp = conv.apply({"params": v["params"]}, flat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                               atol=1e-5, rtol=1e-5)
