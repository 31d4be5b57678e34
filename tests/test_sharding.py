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


def _eval_under_mesh(model, h=32, w=64, b=4):
    """Jit an eval forward under a ('data','model') mesh: DP×TP eval path."""
    mesh = make_mesh(data=4, model=2)
    rng = np.random.RandomState(0)
    data = {
        "left": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "right": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
    }
    with jax.set_mesh(mesh):
        data = {k: jax.device_put(v, jax.NamedSharding(mesh, P("data")))
                for k, v in data.items()}
        variables = jax.jit(
            lambda bt: model.init(jax.random.key(0), bt, train=False))(data)
        out = jax.jit(lambda bt: model.apply(variables, bt, train=False))(data)
        disp = jax.device_get(out["disp_pred"])
    assert disp.shape == (b, h, w)
    assert np.isfinite(disp).all()


def test_gwcnet_volume_sharded_end_to_end():
    """GwcNet forward under a ('data','model') mesh compiles and runs with the
    in-model D constraint active."""
    from openstereo_tpu.models.gwcnet import GwcNet

    _eval_under_mesh(GwcNet(max_disp=32, num_groups=8, use_concat_volume=False))


def test_msnet3d_volume_sharded_end_to_end():
    from openstereo_tpu.models.msnet import MSNet3D

    _eval_under_mesh(MSNet3D(max_disp=32))


def test_coex_volume_sharded_end_to_end():
    from openstereo_tpu.models.coex import CoExNet

    _eval_under_mesh(CoExNet(max_disp=32))


def test_igev_scan_sharded_end_to_end():
    """IGEV: the D-sharded volume feeds the scanned GRU loop's lookups —
    the likeliest shape to break under sharding (resharding at the
    transpose into [B,H,W,C,D] lookup layout must compile cleanly)."""
    from openstereo_tpu.models.igev import IGEV

    _eval_under_mesh(IGEV(max_disp=32, train_iters=2, valid_iters=2),
                     h=64, w=64)


def test_stereobase_sharded_end_to_end():
    from openstereo_tpu.models.stereobase import StereoBase

    _eval_under_mesh(StereoBase(max_disp=32, use_concat_volume=True,
                                concat_channels=8, train_iters=2,
                                eval_iters=2), h=64, w=64)


def test_monster_sharded_end_to_end():
    """MonSter under a ('data','model') mesh: the frozen-DAv2 mono branch's
    DP interaction plus the stereo branch's D-sharded volume — the
    parallelism shape VERDICT flagged as untested. H,W /32-divisible with
    H/16 integral (the 14/16 ViT resize)."""
    from openstereo_tpu.models.monster import MonSter

    _eval_under_mesh(MonSter(max_disp=32, encoder="vits", train_iters=1,
                             valid_iters=1, mix_iters=1), h=64, w=96)


def test_foundationstereo_sharded_end_to_end():
    """FoundationStereo under the DPxTP mesh: AHCF volume D-sharding with
    its (kd,1,1) disparity-conv halo exchanges + frozen-ViT features."""
    from openstereo_tpu.models.foundationstereo import FoundationStereo

    _eval_under_mesh(FoundationStereo(max_disp=32, vit_size="vits",
                                      train_iters=1, valid_iters=1),
                     h=64, w=96)
