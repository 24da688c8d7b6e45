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

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cond = _branch(obs[self.cond_key], self.hidden_dim, "cond")
        feats = jnp.concatenate([
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
        ], axis=-1)
        return feats, cond


class MansyActorCritic(nn.Module):
    """Shared FeatureNet + actor/critic heads with the conditional-feature
    residual (reference ``mansy.py:54-80``, residual at ``:65``/``:79``)."""
    hidden_dim: int = 128
    action_space: int = 15

    @nn.compact
    def __call__(self, obs: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats, cond = MansyFeatureNet(self.hidden_dim, "qoe_weight",
                                      name="feature_net")(obs)
        a = nn.leaky_relu(nn.Dense(self.hidden_dim, kernel_init=ORTHO,
                                   bias_init=nn.initializers.zeros,
                                   name="actor_fc")(feats))
        logits = nn.Dense(self.action_space, kernel_init=ORTHO,
                          bias_init=nn.initializers.zeros,
                          name="actor_out")(a + cond)
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
