"""Actor/critic/identifier networks for bitrate selection (Flax).

Rebuilds of the reference torch nets:

* MANSY ``FeatureNet``/``Actor``/``Critic``/``QoEIdentifier`` — reference
  ``bitrate_selection/models/mansy.py``.
* simple_rl ``FeatureNet``/``Actor``/``Critic`` — reference
  ``bitrate_selection/models/simple_rl.py``.

The reference's full-width ``Conv1d(c_in, hidden, L)`` branches (kernel spans
the whole sequence, producing length-1 output) are mathematically plain dense
layers over the flattened input; they are implemented as ``nn.Dense`` here,
which maps straight onto the MXU.  Orthogonal(sqrt(2)) init with zero bias
matches reference ``run_mansy.py:211-215``.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ORTHO = nn.initializers.orthogonal(scale=math.sqrt(2.0))


def causal_action_values(obs: Dict[str, jnp.ndarray],
                         size_over_throughput: float = 0.1,
                         buffer_scale: float = 5.0) -> jnp.ndarray:
    """[..., A+1] derived causal-MPC features from the 13 reference obs fields.

    Extension (no reference analogue; motivation in BASELINE.md round-4): the
    causal MPC teacher's decision variables are one-step QoE estimates per
    action under the harmonic-mean bandwidth predictor.  Every input below is
    already inside the reference's own observation (``mansy_env.py:136-150``),
    so this adds NO information — it is feature engineering that hands the
    policy the reciprocal/allocation arithmetic an MLP fits poorly:

    * ``bw_hat``: harmonic mean of the non-zero past-throughput history
      (FastMPC predictor, same as ``sim.expert.causal_bw_estimate``),
      0.5 prior while empty;
    * per action a: pyramid-allocate the *predicted* viewport
      (``ops.allocation.allocate_tile_rates``), estimate download time
      ``dt = size / bw_hat`` (``size_over_throughput`` = max_size /
      max_throughput = 5e5/5e6, config.yml:152-157), rebuffer
      ``max(0, dt - buffer)``, and viewport quality/variance evaluated on the
      predicted viewport (the expert's tables evaluate on the ground-truth
      viewport, ``expert_env.py:160-172`` — unknowable at decision time, so
      the deployable feature uses pred);
    * combined with the obs' normalized preference weights into one-step QoE
      estimates (ordering-equivalent to the expert's raw-weight scoring).

    Returns ``concat([qoe_est per action [A], bw_hat [1]])``.
    """
    from mansy_immersivevideostreaming_tpu.ops.allocation import (
        ACTION_TO_RATES, allocate_tile_rates,
    )

    thpt = obs["throughput"]                      # [..., K], /max_throughput
    nz = thpt > 0
    n = jnp.sum(nz, axis=-1).astype(jnp.float32)
    inv = jnp.sum(jnp.where(nz, 1.0 / jnp.maximum(thpt, 1e-12), 0.0), axis=-1)
    bw_hat = jnp.where(n > 0, n / jnp.maximum(inv, 1e-12),
                       jnp.float32(0.5))          # normalized units
    sizes = obs["next_chunk_size"]                # [..., R, T], /max_size
    quals = obs["next_chunk_quality"]             # [..., R, T], /max_rate
    vp = obs["pred_viewport"].astype(jnp.float32)  # [..., T]
    buf = obs["buffer"][..., 0] * buffer_scale    # seconds
    prev_q = obs["past_viewport_qualities"][..., 0]
    has_prev = jnp.sum(obs["action_one_hot"], axis=-1) > 0
    w = obs["qoe_weight"]                         # [..., 3] normalized
    vp_sum = jnp.maximum(jnp.sum(vp, axis=-1), 1e-6)
    n_rates = sizes.shape[-2]

    def per_action(a):
        ri, ro = int(ACTION_TO_RATES[a, 0]), int(ACTION_TO_RATES[a, 1])
        versions, _ = allocate_tile_rates(jnp.int32(ri), jnp.int32(ro), vp)
        onehot = jax.nn.one_hot(versions, n_rates, axis=-2, dtype=jnp.float32)
        size = jnp.sum(sizes * onehot, axis=(-2, -1))
        q_tile = jnp.sum(quals * onehot, axis=-2)  # [..., T]
        qual = jnp.sum(vp * q_tile, axis=-1) / vp_sum
        intra = jnp.sum(vp * jnp.abs(q_tile - qual[..., None]), axis=-1) / vp_sum
        dt = size_over_throughput * size / jnp.maximum(bw_hat, 1e-6)
        rebuf = jnp.maximum(dt - buf, 0.0)
        inter = jnp.where(has_prev, jnp.abs(qual - prev_q), 0.0)
        return w[..., 0] * qual - w[..., 1] * rebuf - w[..., 2] * (intra + inter)

    av = jnp.stack([per_action(a) for a in range(ACTION_TO_RATES.shape[0])],
                   axis=-1)
    return jnp.concatenate([av, bw_hat[..., None]], axis=-1)


def _action_value_features(obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """[..., A+1] action-value features: the env-computed exact field when
    present (``sim.env.exact_action_values``, enabled by
    ``--exact-action-values``), else the derived reconstruction above.  Both
    have the same width, so checkpoints are interchangeable."""
    if "action_values" in obs:
        return obs["action_values"]
    return causal_action_values(obs)


def _branch(x: jnp.ndarray, hidden: int, name: str) -> jnp.ndarray:
    h = nn.Dense(hidden, kernel_init=ORTHO, bias_init=nn.initializers.zeros,
                 name=name)(x.reshape(x.shape[0], -1))
    return nn.leaky_relu(h)  # torch LeakyReLU default slope 0.01


class MansyFeatureNet(nn.Module):
    """10-branch feature extractor; reference ``mansy.py:5-51``.

    The ``cond_key`` branch ('qoe_weight' for actor/critic, 'action_one_hot'
    for the identifier, reference ``mansy.py:83-140``) is returned separately
    for the residual connection.
    """
    hidden_dim: int = 128
    cond_key: str = "qoe_weight"
    use_action_values: bool = False

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cond = _branch(obs[self.cond_key], self.hidden_dim, "cond")
        parts = [
            _branch(obs["throughput"], self.hidden_dim, "throughput"),
            _branch(obs["next_chunk_size"], self.hidden_dim, "next_size"),
            _branch(obs["next_chunk_quality"], self.hidden_dim, "next_quality"),
            _branch(obs["pred_viewport"], self.hidden_dim, "pred_viewport"),
            _branch(obs["viewport_acc"], self.hidden_dim, "viewport_acc"),
            _branch(obs["past_viewport_qualities"], self.hidden_dim, "past_vq"),
            _branch(obs["past_quality_variances"], self.hidden_dim, "past_var"),
            _branch(obs["past_rebuffering"], self.hidden_dim, "past_rebuf"),
            _branch(obs["buffer"], self.hidden_dim, "buffer"),
            cond,
        ]
        if self.use_action_values:
            # causal-MPC action-value features (extension; exact env field
            # when present, else the derived reconstruction)
            parts.append(_branch(_action_value_features(obs), self.hidden_dim,
                                 "action_values"))
        feats = jnp.concatenate(parts, axis=-1)
        return feats, cond


class MansyActorCritic(nn.Module):
    """Shared FeatureNet + actor/critic heads with the conditional-feature
    residual (reference ``mansy.py:54-80``, residual at ``:65``/``:79``).

    ``av_logit_prior`` (extension, no reference analogue): add
    ``beta * standardize(causal_action_values(obs)[:A])`` to the actor
    logits.  At init the policy is then approximately the causal-h1 MPC
    controller (BASELINE.md round-4 "causal-h1 teacher" section: seen
    +0.1356, 92% of the privileged oracle) and learning only has to supply
    residual corrections — e.g. the [1,7,1] constant-action pin — instead
    of reconstructing the allocation/QoE arithmetic from raw features.
    Standardizing per state keeps the argmax and makes beta the prior's
    softmax sharpness.
    """
    hidden_dim: int = 128
    action_space: int = 15
    use_action_values: bool = False
    av_logit_prior: float = 0.0

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats, cond = MansyFeatureNet(self.hidden_dim, "qoe_weight",
                                      self.use_action_values,
                                      name="feature_net")(obs)
        a = nn.leaky_relu(nn.Dense(self.hidden_dim, kernel_init=ORTHO,
                                   bias_init=nn.initializers.zeros,
                                   name="actor_fc")(feats))
        logits = nn.Dense(self.action_space, kernel_init=ORTHO,
                          bias_init=nn.initializers.zeros,
                          name="actor_out")(a + cond)
        if self.av_logit_prior:
            av = _action_value_features(obs)[..., :self.action_space]
            av = (av - jnp.mean(av, axis=-1, keepdims=True)) / (
                jnp.std(av, axis=-1, keepdims=True) + 1e-6)
            logits = logits + jnp.float32(self.av_logit_prior) * av
        c = nn.leaky_relu(nn.Dense(self.hidden_dim, kernel_init=ORTHO,
                                   bias_init=nn.initializers.zeros,
                                   name="critic_fc")(feats))
        value = nn.Dense(1, kernel_init=ORTHO, bias_init=nn.initializers.zeros,
                         name="critic_out")(c + cond)
        return logits, value[..., 0]


class QoEIdentifier(nn.Module):
    """Predicts the (normalized) QoE preference from (obs, action);
    reference ``mansy.py:143-155``."""
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        feats, cond = MansyFeatureNet(self.hidden_dim, "action_one_hot",
                                      name="feature_net")(obs)
        h = nn.leaky_relu(nn.Dense(self.hidden_dim, kernel_init=ORTHO,
                                   bias_init=nn.initializers.zeros,
                                   name="fc")(feats))
        out = nn.Dense(3, kernel_init=ORTHO, bias_init=nn.initializers.zeros,
                       name="out")(h + cond)
        return nn.sigmoid(out)


class SimpleActorCritic(nn.Module):
    """A2C baseline nets; reference ``simple_rl.py:9-63`` (5 branches x 128)."""
    hidden_dim: int = 128
    action_space: int = 15

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats = jnp.concatenate([
            _branch(obs["throughput"], self.hidden_dim, "throughput"),
            _branch(obs["chunk_sizes"], self.hidden_dim, "chunk_sizes"),
            _branch(obs["rebuffer"], self.hidden_dim, "rebuffer"),
            _branch(obs["last_bitrates"], self.hidden_dim, "last_bitrates"),
            _branch(obs["pred_viewport"], self.hidden_dim, "pred_viewport"),
        ], axis=-1)
        a = nn.leaky_relu(nn.Dense(self.hidden_dim, kernel_init=ORTHO,
                                   bias_init=nn.initializers.zeros,
                                   name="actor_fc")(feats))
        logits = nn.Dense(self.action_space, kernel_init=ORTHO,
                          bias_init=nn.initializers.zeros,
                          name="actor_out")(a)
        c = nn.leaky_relu(nn.Dense(self.hidden_dim, kernel_init=ORTHO,
                                   bias_init=nn.initializers.zeros,
                                   name="critic_fc")(feats))
        value = nn.Dense(1, kernel_init=ORTHO, bias_init=nn.initializers.zeros,
                         name="critic_out")(c)
        return logits, value[..., 0]
