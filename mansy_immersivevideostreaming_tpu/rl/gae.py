"""Generalized Advantage Estimation as a reverse scan.

Matches tianshou's ``compute_episodic_return`` semantics used by the
reference's PPO/A2C (``mansy_ppo.py`` inherits tianshou ``PPOPolicy``):
with auto-resetting envs a ``done`` step neither bootstraps nor propagates
advantage across the episode boundary.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_gae(rewards: jnp.ndarray, dones: jnp.ndarray, values: jnp.ndarray,
                last_values: jnp.ndarray, gamma: float, lam: float
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rewards/dones/values [T, N]; last_values [N] = V(s_T).

    Returns (advantages [T, N], returns [T, N] = adv + values).
    """
    not_done = 1.0 - dones.astype(jnp.float32)
    next_values = jnp.concatenate([values[1:], last_values[None]], axis=0)

    def body(adv_next, inputs):
        r, nd, v, v_next = inputs
        delta = r + gamma * v_next * nd - v
        adv = delta + gamma * lam * nd * adv_next
        return adv, adv

    _, advs = jax.lax.scan(
        body, jnp.zeros_like(last_values),
        (rewards, not_done, values, next_values), reverse=True)
    return advs, advs + values
