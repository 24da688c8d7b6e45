"""Behavior-cloning initialization from MPC expert demonstrations.

Rebuild of reference ``utils/mansy_utils.py:52-94``
(``behavior_cloning_pretraining``): per step pick one random demo episode,
cross-entropy toward the expert actions minus a 0.1 entropy bonus, Adam step;
periodic validation over the held-out demos with best-checkpoint tracking;
identifier co-trained on the same demos for the first
``identifier_max_steps`` steps.  (The reference notes BC gave no noticeable
benefit — ``README.md:191`` — but the capability is preserved.)
"""

from __future__ import annotations

import functools
import random
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mansy_immersivevideostreaming_tpu.rl.identifier import train_identifier_on_buffer


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def bc_step(apply_fn: Callable, optimizer: optax.GradientTransformation,
            params: Any, opt_state: Any, obs: Dict[str, jnp.ndarray],
            actions: jnp.ndarray):
    """One CE + entropy-bonus step (reference ``mansy_utils.py:67-72``)."""
    def loss_fn(p):
        logits, _ = apply_fn(p, obs)
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.mean(jnp.take_along_axis(logp, actions[:, None], axis=-1))
        probs = jax.nn.softmax(logits)
        entropy = -jnp.sum(probs * logp, axis=-1).mean()
        return ce - 0.1 * entropy

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnums=(0,))
def bc_valid_loss(apply_fn: Callable, params: Any, obs: Dict[str, jnp.ndarray],
                  actions: jnp.ndarray) -> jnp.ndarray:
    logits, _ = apply_fn(params, obs)
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, actions[:, None], axis=-1))


def behavior_cloning_pretraining(
        apply_fn: Callable, optimizer: optax.GradientTransformation,
        params: Any, opt_state: Any,
        id_apply: Callable, id_optimizer: optax.GradientTransformation,
        id_params: Any, id_opt_state: Any,
        train_demos: List[Dict[str, Any]], valid_demos: List[Dict[str, Any]],
        max_steps: int, valid_per_step: int, identifier_max_steps: int,
        identifier_update_round: int, seed: int = 0,
        save_policy: Callable[[Any], None] = lambda p: None,
        save_identifier: Callable[[Any], None] = lambda p: None):
    """Returns (params, opt_state, id_params, id_opt_state, best_loss)."""
    rng = random.Random(seed)
    key = jax.random.PRNGKey(seed)
    best_loss, best_step = float("inf"), 0
    for i in range(max_steps):
        demo = rng.choice(train_demos)
        obs = jax.tree_util.tree_map(jnp.asarray, demo["obs"])
        actions = jnp.asarray(demo["act"], jnp.int32)
        params, opt_state, loss = bc_step(apply_fn, optimizer, params,
                                          opt_state, obs, actions)
        print(f"BC (Training): loss={float(loss)} ({i + 1}/{max_steps})")

        if i % valid_per_step == 0:
            vloss = float(np.mean([
                float(bc_valid_loss(apply_fn, params,
                                    jax.tree_util.tree_map(jnp.asarray, d["obs"]),
                                    jnp.asarray(d["act"], jnp.int32)))
                for d in valid_demos]))
            if vloss < best_loss:
                best_loss, best_step = vloss, i
                save_policy(params)
            print(f"BC (Validation): valid loss={vloss} - best loss={best_loss} "
                  f"at step {best_step}")

        if i < identifier_max_steps:
            key, k = jax.random.split(key)
            id_params, id_opt_state, _, _ = train_identifier_on_buffer(
                id_apply, id_optimizer, id_params, id_opt_state,
                jax.tree_util.tree_map(jnp.asarray, demo["obs"]), k,
                identifier_update_round)
            save_identifier(id_params)
    return params, opt_state, id_params, id_opt_state, best_loss
