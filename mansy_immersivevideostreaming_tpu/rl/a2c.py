"""A2C update (the simple_rl baseline's algorithm).

Matches the reference's tianshou ``A2CPolicy`` configuration
(reference ``run_simple_rl.py:194-208``): RMSprop, GAE, vf_coef, ent_coef,
grad-norm clip, optional return normalization.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from mansy_immersivevideostreaming_tpu.rl.gae import compute_gae
from mansy_immersivevideostreaming_tpu.rl.types import RunningStat, Transition


@dataclasses.dataclass(frozen=True)
class A2CConfig:
    gamma: float = 0.99
    gae_lambda: float = 0.95
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 1.0
    rew_norm: bool = True
    minibatch: int = 512
    repeat: int = 1  # repeat_per_collect


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """torch RMSprop defaults (alpha 0.99, eps 1e-8; reference
    ``run_simple_rl.py:189``)."""
    return optax.rmsprop(lr, decay=0.99, eps=1e-8)


@functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3, 4))
def a2c_update(apply_fn: Callable, optimizer: optax.GradientTransformation,
               cfg: A2CConfig, params: Any, opt_state: Any,
               traj: Transition, last_values: jnp.ndarray,
               ret_rms: RunningStat, key: jax.Array):
    """tianshou-0.4.8 A2C semantics: with ``rew_norm`` the value targets
    (returns) are divided by the running return std, while advantages stay
    unnormalized (tianshou ``A2CPolicy._compute_returns``); the collected
    batch is split into ``minibatch``-sized slices and swept ``repeat``
    times."""
    T, N = traj.reward.shape
    adv, ret = compute_gae(traj.reward, traj.done.astype(jnp.float32),
                           traj.value, last_values, cfg.gamma, cfg.gae_lambda)
    if cfg.rew_norm:
        ret_n = ret / jnp.sqrt(ret_rms.var + 1e-8)
        ret_rms = ret_rms.update(ret)
    else:
        ret_n = ret

    flat = {
        "obs": jax.tree_util.tree_map(
            lambda x: x.reshape((T * N,) + x.shape[2:]), traj.obs),
        "action": traj.action.reshape(-1),
        "adv": adv.reshape(-1),
        "ret": ret_n.reshape(-1),
    }
    total = T * N
    mb_size = min(cfg.minibatch, total)
    n_mb = total // mb_size
    usable = n_mb * mb_size

    def loss_fn(params, mb):
        logits, value = apply_fn(params, mb["obs"])
        log_probs = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(log_probs, mb["action"][:, None], axis=-1)[:, 0]
        actor_loss = -(logp * mb["adv"]).mean()
        vf_loss = ((mb["ret"] - value) ** 2).mean()
        probs = jax.nn.softmax(logits)
        entropy = -jnp.sum(probs * log_probs, axis=-1).mean()
        return actor_loss + cfg.vf_coef * vf_loss - cfg.ent_coef * entropy, (
            actor_loss, vf_loss, entropy)

    def epoch(carry, k):
        params, opt_state = carry
        perm = jax.random.permutation(k, total)[:usable].reshape(n_mb, mb_size)

        def mb_step(carry, idx):
            params, opt_state = carry
            mb = jax.tree_util.tree_map(lambda x: x[idx], flat)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-8))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss,) + aux

        (params, opt_state), metrics = jax.lax.scan(mb_step, (params, opt_state), perm)
        return (params, opt_state), metrics

    keys = jax.random.split(key, cfg.repeat)
    (params, opt_state), metrics = jax.lax.scan(epoch, (params, opt_state), keys)
    loss, a_l, v_l, ent = (m.mean() for m in metrics)
    return params, opt_state, ret_rms, {
        "loss": loss, "loss/actor": a_l, "loss/vf": v_l, "loss/ent": ent}
