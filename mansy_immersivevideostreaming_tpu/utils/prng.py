"""Seeding helpers (reference seeds numpy/torch/cuda/random at every entry
point, e.g. ``run_models.py:113-117``; here one seed fans into numpy +
a JAX PRNG key)."""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
