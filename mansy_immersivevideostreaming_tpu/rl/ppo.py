"""PPO update as a single jitted function.

Hyperparameter semantics follow the reference's tianshou configuration
(reference ``run_mansy.py:231-251``): clip 0.2, value clip, per-minibatch
advantage normalization, entropy coef, vf coef 0.5, grad-norm clip 1,
optional return normalization by running std (``rew_norm=1``), gamma 0.95,
gae-lambda 0.95, repeat_per_collect epochs over shuffled minibatches.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mansy_immersivevideostreaming_tpu.rl.gae import compute_gae
from mansy_immersivevideostreaming_tpu.rl.types import RunningStat, Transition


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    gamma: float = 0.95
    gae_lambda: float = 0.95
    eps_clip: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.02
    max_grad_norm: float = 1.0
    value_clip: bool = True
    norm_adv: bool = True
    rew_norm: bool = True
    repeat: int = 2          # repeat_per_collect
    minibatch: int = 512
    # extension (VERDICT r2 item 2): normalize advantages within each QoE
    # preference group instead of over the whole minibatch, so one
    # preference's larger reward scale can't dominate the gradient
    norm_adv_per_pref: bool = False
    n_prefs: int = 4


def make_optimizer(lr: float, weight_decay: float = 1e-2) -> optax.GradientTransformation:
    """torch Adam with coupled L2 weight decay (reference ``run_mansy.py:216``:
    ``torch.optim.Adam(..., weight_decay=1e-2)`` adds wd*p to the gradient
    before the Adam moments)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


def _ppo_loss(apply_fn, params, cfg: PPOConfig, batch, ent_coef, kl_coef):
    logits, value = apply_fn(params, batch["obs"])
    log_probs = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(log_probs, batch["action"][:, None], axis=-1)[:, 0]
    ratio = jnp.exp(logp - batch["log_prob"])
    adv = batch["adv"]
    if cfg.norm_adv_per_pref and "pref_id" in batch:
        # per-preference-group mean/std over the minibatch
        onehot = jax.nn.one_hot(batch["pref_id"], cfg.n_prefs)  # [B, K]
        cnt = jnp.maximum(onehot.sum(axis=0), 1.0)
        mean_k = (onehot.T @ adv) / cnt
        var_k = (onehot.T @ (adv ** 2)) / cnt - mean_k ** 2
        std = onehot @ jnp.sqrt(jnp.maximum(var_k, 0.0))
        adv = (adv - onehot @ mean_k) / (std + 1e-8)
    elif cfg.norm_adv:
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    clip_loss = -jnp.minimum(
        ratio * adv,
        jnp.clip(ratio, 1 - cfg.eps_clip, 1 + cfg.eps_clip) * adv).mean()
    if cfg.value_clip:
        v_clip = batch["value"] + jnp.clip(value - batch["value"],
                                           -cfg.eps_clip, cfg.eps_clip)
        vf1 = (batch["ret"] - value) ** 2
        vf2 = (batch["ret"] - v_clip) ** 2
        vf_loss = jnp.maximum(vf1, vf2).mean()
    else:
        vf_loss = ((batch["ret"] - value) ** 2).mean()
    probs = jax.nn.softmax(logits)
    entropy = -jnp.sum(probs * log_probs, axis=-1).mean()
    loss = clip_loss + cfg.vf_coef * vf_loss - ent_coef * entropy
    if "anchor_logits" in batch:
        # conditioning-preserving fine-tune: KL(anchor || pi) toward a frozen
        # (e.g. behavior-cloned) policy — keeps preference-conditioned modes
        # from collapsing into the uniform attractor during PPO.  kl_coef may
        # be a [n_prefs] vector (round-4 extension): a per-preference anchor
        # strength, e.g. tight on preferences whose anchor mode is a sharp
        # constant and loose on the dynamic cells PPO should keep exploring
        a_logp = jax.nn.log_softmax(batch["anchor_logits"])
        a_p = jnp.exp(a_logp)
        kl_i = jnp.sum(a_p * (a_logp - log_probs), axis=-1)
        if kl_coef.ndim == 1 and "pref_id" in batch:
            loss = loss + (kl_coef[batch["pref_id"]] * kl_i).mean()
        else:
            loss = loss + kl_coef * kl_i.mean()
    return loss, (clip_loss, vf_loss, entropy)


@functools.partial(jax.jit, static_argnums=(0, 1, 2),
                   donate_argnums=(3, 4))
def ppo_update(apply_fn: Callable, optimizer: optax.GradientTransformation,
               cfg: PPOConfig, params: Any, opt_state: Any,
               traj: Transition, rewards: jnp.ndarray,
               last_values: jnp.ndarray, ret_rms: RunningStat,
               key: jax.Array, ent_coef: jnp.ndarray | float | None = None,
               anchor_logits: jnp.ndarray | None = None,
               kl_coef: jnp.ndarray | float = 0.0,
               pref_ids: jnp.ndarray | None = None):
    """Full PPO update on a [T, N] trajectory with (possibly recomputed)
    ``rewards``.  Returns (params, opt_state, ret_rms, metrics).

    ``ent_coef`` optionally overrides ``cfg.ent_coef`` as a *traced* scalar so
    entropy-annealing schedules don't trigger recompiles.  ``anchor_logits``
    [T, N, A] (with ``kl_coef``) adds a KL penalty toward a frozen anchor
    policy (see _ppo_loss).  ``pref_ids`` [T, N] i32 enables
    ``cfg.norm_adv_per_pref`` group-wise advantage normalization."""
    if ent_coef is None:
        ent_coef = cfg.ent_coef
    ent_coef = jnp.asarray(ent_coef, jnp.float32)
    kl_coef = jnp.asarray(kl_coef, jnp.float32)
    T, N = rewards.shape
    adv, ret = compute_gae(rewards, traj.done.astype(jnp.float32), traj.value,
                           last_values, cfg.gamma, cfg.gae_lambda)
    if cfg.rew_norm:
        # tianshou-0.4.8 semantics: only the returns (value targets) are
        # divided by the running return std; advantages stay unnormalized
        # here and are normalized per minibatch when cfg.norm_adv
        ret_n = ret / jnp.sqrt(ret_rms.var + 1e-8)
        ret_rms = ret_rms.update(ret)
        adv_n = adv
    else:
        ret_n, adv_n = ret, adv

    flat = {
        "obs": jax.tree_util.tree_map(
            lambda x: x.reshape((T * N,) + x.shape[2:]), traj.obs),
        "action": traj.action.reshape(-1),
        "log_prob": traj.log_prob.reshape(-1),
        "value": traj.value.reshape(-1),
        "adv": adv_n.reshape(-1),
        "ret": ret_n.reshape(-1),
    }
    if anchor_logits is not None:
        flat["anchor_logits"] = anchor_logits.reshape(
            (T * N,) + anchor_logits.shape[2:])
    if pref_ids is not None:
        flat["pref_id"] = pref_ids.reshape(-1)
    total = T * N
    mb_size = min(cfg.minibatch, total)
    n_mb = total // mb_size
    usable = n_mb * mb_size

    def epoch(carry, k):
        params, opt_state = carry
        perm = jax.random.permutation(k, total)[:usable].reshape(n_mb, mb_size)

        def mb_step(carry, idx):
            params, opt_state = carry
            mb = jax.tree_util.tree_map(lambda x: x[idx], flat)
            (loss, aux), grads = jax.value_and_grad(
                lambda p: _ppo_loss(apply_fn, p, cfg, mb, ent_coef, kl_coef),
                has_aux=True)(params)
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
    loss, clip_l, vf_l, ent = (m.mean() for m in metrics)
    return params, opt_state, ret_rms, {
        "loss": loss, "loss/clip": clip_l, "loss/vf": vf_l, "loss/ent": ent}
