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


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (first compile of the big unrolled
    decode graph is minutes on a tunnel; subsequent runs hit the cache)."""
    import jax
    import os as _os
    cache = path or _os.environ.get(
        "MANSY_JAX_CACHE", _os.path.join(_os.path.expanduser("~"), ".mansy_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
