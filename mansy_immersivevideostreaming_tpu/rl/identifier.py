"""QoE-preference identifier: training + reward shaping.

MANSY's representation-learning signal (reference
``utils/mansy_utils.py:9-49`` and ``models/mansy_ppo.py:36-59``): the
identifier predicts the normalized QoE preference from (obs, action one-hot);
the policy's reward is shaped toward behavior that *reveals* its assigned
preference.  The reference recomputes the identifier reward with a separate
batch-of-1 forward per transition (``mansy_ppo.py:43-48``); here the whole
buffer is one batched forward.

As in the reference, the action fed to the identifier is the one-hot stored
*inside* the observation, i.e. the previous step's action
(``mansy_ppo.py:44-45`` reads ``obs.action_one_hot``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


@functools.partial(jax.jit, static_argnums=(0,))
def identifier_rewards(apply_fn: Callable, params: Any,
                       obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """1 - MSE(identifier(obs), qoe_weight) per transition
    (reference ``mansy_utils.py:42-49``).  obs leaves are [B, ...]."""
    pred = apply_fn(params, obs)
    mse = jnp.mean((pred - obs["qoe_weight"]) ** 2, axis=-1)
    return 1.0 - mse


def shape_rewards(qoe_rewards: jnp.ndarray, id_rewards: jnp.ndarray,
                  lamb: float) -> jnp.ndarray:
    """reward <- (1-λ)·qoe + λ·identifier (reference ``mansy_ppo.py:48``)."""
    return (1.0 - lamb) * qoe_rewards + lamb * id_rewards


@jax.jit
def center_rewards_by_preference(id_rewards: jnp.ndarray,
                                 qoe_weight: jnp.ndarray,
                                 prefs: jnp.ndarray) -> jnp.ndarray:
    """Subtract the per-preference batch mean from the identifier reward.

    Extension beyond the reference (opt-in ``--id-reward-center``),
    motivated by its documented failure mode: once the identifier fits,
    ``1 - MSE`` is a near-constant bonus per preference, which at the
    reference's λ=0.5 drowns the QoE gradient and collapses training to a
    preference-uniform policy (BASELINE.md).  Centering within each
    preference group removes the constant offset so GAE only sees the
    *variation* — the "does this behavior reveal my preference" signal the
    MANSY paper intends — while leaving cross-group QoE scales untouched.

    ``id_rewards`` may be any shape whose elements align with
    ``qoe_weight``'s leading axes; ``qoe_weight`` is [..., 3] normalized
    preferences; ``prefs`` is [K, 3], the normalized training preference set.
    """
    flat_r = id_rewards.reshape(-1)
    flat_w = qoe_weight.reshape(-1, qoe_weight.shape[-1])
    # one-hot membership of every transition in its preference group
    dist = jnp.sum((flat_w[:, None, :] - prefs[None, :, :]) ** 2, axis=-1)
    onehot = jax.nn.one_hot(jnp.argmin(dist, axis=-1), prefs.shape[0])
    group_sum = onehot.T @ flat_r
    group_cnt = jnp.maximum(onehot.sum(axis=0), 1.0)
    centered = flat_r - onehot @ (group_sum / group_cnt)
    return centered.reshape(id_rewards.shape)


@functools.partial(jax.jit, static_argnums=(0, 1, 4), donate_argnums=(2, 3))
def _identifier_rounds(apply_fn: Callable, optimizer: optax.GradientTransformation,
                       params: Any, opt_state: Any, rounds: int,
                       obs: Dict[str, jnp.ndarray]):
    """``rounds`` full-batch MSE steps (reference ``mansy_utils.py:24-31``)."""
    def step(carry, _):
        params, opt_state = carry

        def loss_fn(p):
            pred = apply_fn(p, obs)
            return jnp.mean((pred - obs["qoe_weight"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                               None, length=rounds)
    return params, opt_state, losses


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def _identifier_minibatch_step(apply_fn, optimizer, params, opt_state, obs):
    def loss_fn(p):
        pred = apply_fn(p, obs)
        return jnp.mean((pred - obs["qoe_weight"]) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def pretrain_identifier_on_demos(apply_fn: Callable,
                                 optimizer: optax.GradientTransformation,
                                 params: Any, opt_state: Any,
                                 obs: Dict[str, jnp.ndarray],
                                 steps: int, batch_size: int,
                                 key: jax.Array, valid_ratio: float = 0.1):
    """Minibatch-MSE pretraining of the identifier on an expert-demo aggregate
    BEFORE PPO starts (VERDICT r2 item 2; reference analogue trains the
    identifier on demos only under ``--bc``, ``utils/mansy_utils.py:74-87``).

    With a pre-trained identifier the shaping reward is informative from PPO
    step 0 instead of near-random.  Returns (params, opt_state, train_losses,
    valid_loss)."""
    n = obs["qoe_weight"].shape[0]
    key, k_split = jax.random.split(key)
    perm = jax.random.permutation(k_split, n)
    n_valid = max(int(n * valid_ratio), 1)
    train_idx, valid_idx = perm[n_valid:], perm[:n_valid]
    obs_d = jax.tree_util.tree_map(jnp.asarray, obs)
    train_obs = jax.tree_util.tree_map(lambda x: x[train_idx], obs_d)
    valid_obs = jax.tree_util.tree_map(lambda x: x[valid_idx], obs_d)
    n_train = int(train_idx.shape[0])
    losses = []
    for _ in range(steps):
        key, k = jax.random.split(key)
        idx = jax.random.randint(k, (min(batch_size, n_train),), 0, n_train)
        mb = jax.tree_util.tree_map(lambda x: x[idx], train_obs)
        params, opt_state, loss = _identifier_minibatch_step(
            apply_fn, optimizer, params, opt_state, mb)
        losses.append(float(loss))
    pred = apply_fn(params, valid_obs)
    valid_loss = float(jnp.mean((pred - valid_obs["qoe_weight"]) ** 2))
    return params, opt_state, losses, valid_loss


def train_identifier_on_buffer(apply_fn: Callable,
                               optimizer: optax.GradientTransformation,
                               params: Any, opt_state: Any,
                               obs: Dict[str, jnp.ndarray],
                               key: jax.Array, update_round: int = 2,
                               train_ratio: float = 0.8):
    """80/20-shuffled identifier training over the fresh trajectory buffer
    (reference ``mansy_utils.py:9-39``).  Returns
    (params, opt_state, train_losses, valid_loss)."""
    n = obs["qoe_weight"].shape[0]
    perm = jax.random.permutation(key, n)
    n_train = int(n * train_ratio)
    train_obs = jax.tree_util.tree_map(lambda x: x[perm[:n_train]], obs)
    valid_obs = jax.tree_util.tree_map(lambda x: x[perm[n_train:]], obs)
    params, opt_state, losses = _identifier_rounds(
        apply_fn, optimizer, params, opt_state, update_round, train_obs)
    pred = apply_fn(params, valid_obs)
    valid_loss = jnp.mean((pred - valid_obs["qoe_weight"]) ** 2)
    return params, opt_state, losses, valid_loss
