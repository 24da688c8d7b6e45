"""Shared RL data types."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax.numpy as jnp


class Transition(NamedTuple):
    """One step of every env lane; stacked [T, N, ...] by the collector."""
    obs: Dict[str, jnp.ndarray]
    action: jnp.ndarray   # i32 [T, N]
    log_prob: jnp.ndarray  # f32 [T, N]
    value: jnp.ndarray     # f32 [T, N]
    reward: jnp.ndarray    # f32 [T, N]
    done: jnp.ndarray      # bool [T, N]


class RunningStat(NamedTuple):
    """Running mean/var for return normalization (tianshou's ``RunningMeanStd``
    used when ``reward_normalization=True``, reference ``run_mansy.py:241``)."""
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def init() -> "RunningStat":
        return RunningStat(mean=jnp.float32(0.0), var=jnp.float32(1.0),
                           count=jnp.float32(1e-4))

    def update(self, x: jnp.ndarray) -> "RunningStat":
        bmean = jnp.mean(x)
        bvar = jnp.var(x)
        bcount = jnp.float32(x.size)
        delta = bmean - self.mean
        tot = self.count + bcount
        new_mean = self.mean + delta * bcount / tot
        m_a = self.var * self.count
        m_b = bvar * bcount
        m2 = m_a + m_b + delta * delta * self.count * bcount / tot
        return RunningStat(mean=new_mean, var=m2 / tot, count=tot)
