import time
import numpy as np
import jax, jax.numpy as jnp
from functools import partial
from openstereo_tpu.ops.conv3d import conv3d_tap_merged

def timeit(fn, *args, reps=30):
    out = None
    for _ in range(5):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps * 1e3

rng = np.random.RandomState(0)
shapes = [
    ("hg_conv1", (1, 48, 136, 240, 32), 64),
    ("hg_conv3", (1, 24, 68, 120, 64), 64),
]
for name, xs, cout in shapes:
    x = jnp.asarray(rng.randn(*xs), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 3, xs[-1], cout), jnp.bfloat16)
    s, p = (2, 2, 2), ((1, 1), (1, 1), (1, 1))
    native = jax.jit(partial(
        jax.lax.conv_general_dilated, window_strides=s, padding=p,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
    poly = jax.jit(partial(conv3d_tap_merged, strides=s, padding=p))
    tn = timeit(native, x, k)
    tp = timeit(poly, x, k)
    err = float(jnp.max(jnp.abs(native(x, k).astype(jnp.float32) -
                                poly(x, k).astype(jnp.float32))))
    print(f"{name}: native {tn:.3f} ms  poly {tp:.3f} ms  ({tn/tp:.2f}x)  err {err:.2e}")
