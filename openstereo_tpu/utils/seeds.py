"""Seeding (reference: stereo/utils/common_utils.py:24-30).

JAX PRNG is deterministic by construction; we only need to seed the host-side
numpy/python RNGs used by the data pipeline and return a root `jax.random.key`
for parameter init / any device-side randomness.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.key(seed)
