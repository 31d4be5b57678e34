"""Force tests onto CPU with 8 virtual devices.

This is the fake-backend capability the reference lacks (SURVEY.md §4):
multi-device sharding tests run on a virtual CPU mesh.

Note: the environment may import jax at interpreter start (sitecustomize), so
setting JAX_PLATFORMS via os.environ here is too late — we must go through
jax.config before any backend is initialised.
"""

import os

# Backend init is lazy, so XLA_FLAGS set here is still honoured.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# XLA:CPU compiles can be slow on small hosts — persist them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------------------------------------
# Test tiering: `pytest -m quick` runs the sub-10-minute subset (op goldens,
# transforms/loaders, layer parity, tiny-shape model smoke) — the practical
# green-bar check on small CPU boxes. Everything else (full model forwards,
# f64 reference-oracle parity, sharding suites, e2e training) stays in the
# default full run. Modules listed here are auto-marked; individual tests
# elsewhere can opt in with @pytest.mark.quick.
# ---------------------------------------------------------------------------

QUICK_MODULES = {
    "test_cost_volume",
    "test_conv3d",
    "test_ops_misc",
    "test_losses_metrics",
    "test_layer_parity",
    "test_data_pipeline",
    "test_make_splits",
    "test_configs",
    "test_native",
    "test_nmrf_ops",
    "test_optim",
    "test_quick_forward",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
