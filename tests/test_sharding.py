"""Disparity-dimension tensor parallelism over the mesh 'model' axis."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from openstereo_tpu.parallel import make_mesh, shard_disparity


def test_shard_disparity_noop_without_mesh():
    v = jnp.ones((2, 8, 4, 6, 16))
    out = shard_disparity(v)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(v))


def test_shard_disparity_splits_d_axis():
    mesh = make_mesh(data=4, model=2)

    @jax.jit
    def f(v):
        return shard_disparity(v) * 2.0

    v = jnp.ones((4, 8, 4, 6, 16))
    with jax.set_mesh(mesh):
        out = f(v)
    # the constraint must produce a D-axis (axis 1) sharding over 'model'
    spec = out.sharding.spec
    assert spec[1] == "model", spec
    np.testing.assert_array_equal(np.asarray(out), 2.0)


def test_gwcnet_volume_sharded_end_to_end():
    """GwcNet forward under a ('data','model') mesh compiles and runs with the
    in-model D constraint active."""
    from openstereo_tpu.models.gwcnet import GwcNet

    mesh = make_mesh(data=4, model=2)
    model = GwcNet(max_disp=32, num_groups=8, use_concat_volume=False)
    rng = np.random.RandomState(0)
    data = {
        "left": jnp.asarray(rng.rand(4, 32, 64, 3), jnp.float32),
        "right": jnp.asarray(rng.rand(4, 32, 64, 3), jnp.float32),
    }
    with jax.set_mesh(mesh):
        data = {k: jax.device_put(v, jax.NamedSharding(mesh, P("data")))
                for k, v in data.items()}
        variables = jax.jit(
            lambda b: model.init(jax.random.key(0), b, train=False))(data)
        out = jax.jit(lambda b: model.apply(variables, b, train=False))(data)
        disp = jax.device_get(out["disp_pred"])
    assert disp.shape == (4, 32, 64)
    assert np.isfinite(disp).all()
