"""Tiny-shape model-forward smoke for the quick tier.

One fast 2D-aggregation representative (LightStereo) and one 3D-conv
representative (MSNet2D's interlaced compressor) — enough to catch
layer/volume/loss regressions in `pytest -m quick` without the multi-minute
compiles of the full zoo (tests/test_models_forward.py covers every family).
"""

import numpy as np

import jax
import jax.numpy as jnp


def _data(b=1, h=32, w=64):
    rng = np.random.RandomState(0)
    return {
        "left": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "right": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "disp": jnp.asarray(rng.rand(b, h, w) * 12 + 1, jnp.float32),
    }


def _smoke(model, data):
    variables = jax.jit(
        lambda b: model.init(jax.random.key(0), b, train=True))(data)
    out, _ = model.apply(variables, data, train=True, mutable=["batch_stats"])
    b, h, w = data["disp"].shape
    assert out["disp_pred"].shape == (b, h, w)
    loss, _ = model.get_loss(out, data)
    assert np.isfinite(float(loss))


def test_lightstereo_quick():
    from openstereo_tpu.models.lightstereo import LightStereo

    _smoke(LightStereo(max_disp=16, aggregation_blocks=(1, 1, 1),
                       expanse_ratio=2), _data())


def test_msnet2d_quick():
    from openstereo_tpu.models.msnet import MSNet2D

    _smoke(MSNet2D(max_disp=16), _data())
