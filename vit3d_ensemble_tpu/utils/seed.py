"""Seeding / reproducibility (`tools.py:12-16` equivalent).

The reference seeds python/numpy/torch globals; in JAX randomness is
explicit (jax.random keys threaded through the trainers), so this helper
seeds the HOST-side sources the framework actually uses: python `random`,
numpy's legacy global RNG, and returns the root jax key.  All batch
shuffles use `np.random.default_rng(seed)` instances and all device RNG
uses jax keys, both derived from the same --seed flag.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 42):
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.key(seed)
