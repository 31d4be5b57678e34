"""Force tests onto CPU with 8 virtual devices (before jax is imported).

This is the fake-backend capability the reference lacks (SURVEY.md §4):
multi-device sharding tests run on a virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
