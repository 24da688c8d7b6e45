"""Vectorized on-policy rollout collection.

One jitted ``lax.scan`` of (policy forward + vmapped env step) over N lanes x
T steps replaces the reference's tianshou ``Collector`` over
``DummyVectorEnv``/``SubprocVectorEnv`` (reference ``run_mansy.py:107-117``,
``run_simple_rl.py:38-46``) — no process fan-out, no per-step host/device
ping-pong; the policy forward batches all lanes on the MXU.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.rl.types import Transition
from mansy_immersivevideostreaming_tpu.sim.env import (
    EnvState, LogRecord, reset_env, step_env,
)
from mansy_immersivevideostreaming_tpu.sim.tables import SimTables


def init_lanes(tables: SimTables, samples: jnp.ndarray, n_lanes: int,
               seed: int = 0) -> EnvState:
    """N independent lanes with worker-strided sample pointers (reference
    seeds workers at ``seed % worker_num`` and strides by worker count,
    ``mansy_env.py:56,100-101``)."""
    starts = (seed + jnp.arange(n_lanes)) % samples.shape[0]
    return jax.jit(
        jax.vmap(lambda s: reset_env(tables, samples, s, n_lanes)))(starts)


def make_collector(apply_fn: Callable, observe_fn: Callable,
                   tables: SimTables, samples: jnp.ndarray,
                   n_lanes: int, n_steps: int, train: bool = True):
    """Build a jitted collector.

    ``apply_fn(params, obs) -> (logits, value)`` over batched obs.
    Returns ``collect(params, states, key) ->
    (new_states, Transition [T,N,...], LogRecord [T,N], last_values [N])``.
    """

    @jax.jit
    def collect(params: Any, states: EnvState, key: jax.Array):
        def body(carry, _):
            states, key = carry
            key, k_act = jax.random.split(key)
            obs = jax.vmap(lambda s: observe_fn(tables, s))(states)
            logits, value = apply_fn(params, obs)
            action = jax.random.categorical(k_act, logits)
            log_prob = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[:, None], axis=-1)[:, 0]
            new_states, reward, done, log = jax.vmap(
                lambda s, a: step_env(tables, samples, s, a, n_lanes, train)
            )(states, action)
            tr = Transition(obs=obs, action=action, log_prob=log_prob,
                            value=value, reward=reward, done=done)
            return (new_states, key), (tr, log)

        (final_states, _), (traj, logs) = jax.lax.scan(
            body, (states, key), None, length=n_steps)
        final_obs = jax.vmap(lambda s: observe_fn(tables, s))(final_states)
        _, last_values = apply_fn(params, final_obs)
        return final_states, traj, logs, last_values

    return collect


def flatten_time(tree):
    """[T, N, ...] -> [T*N, ...] over a pytree."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), tree)
