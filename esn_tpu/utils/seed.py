"""Determinism helper (reference ``utils/utils.py :: setup_seed`` [R]).

The reference seeds torch/numpy/random and sets cudnn.deterministic. The JAX
analogue is simpler: device RNG is a threaded PRNG key (deterministic by
construction, no global state), so only the host-side generators used by the
data pipeline (shuffling, synthetic data) need seeding.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def setup_seed(seed: int) -> jax.Array:
    """Seed host RNGs; returns the root jax.random key for device streams."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
