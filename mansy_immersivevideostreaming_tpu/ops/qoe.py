"""QoE model as pure functions over explicit state.

Reference: ``bitrate_selection/utils/qoe.py:10-60``.  QoE of a downloaded chunk
is ``w1*quality - w2*rebuffer - w3*variance`` where

* quality = viewport-weighted mean tile quality / max rate,
* variance = intra (viewport-weighted mean abs deviation, normalized)
             + inter (|quality_t - quality_{t-1}|),
* rebuffer = rebuffering seconds of this chunk.

The reference keeps ``prev_viewport_quality`` as object state; here it is an
explicit (prev_quality, has_prev) pair threaded through scans.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp

# Scale constants; reference ``qoe.py:5-7``.
SCALE_QUALITY = 1.0
SCALE_VARIANCE = 1.0
SCALE_REBUFFER = 1.0


class QoEState(NamedTuple):
    """Carry state of the sequential QoE model (reference ``qoe.py:19-28``)."""
    prev_quality: jnp.ndarray  # f32 scalar (normalized viewport quality)
    has_prev: jnp.ndarray     # bool scalar


def init_qoe_state(batch_shape: Tuple[int, ...] = ()) -> QoEState:
    return QoEState(prev_quality=jnp.zeros(batch_shape, jnp.float32),
                    has_prev=jnp.zeros(batch_shape, bool))


def qoe_step(state: QoEState, weights: jnp.ndarray, actual_viewport: jnp.ndarray,
             tile_quality: jnp.ndarray, rebuffer_time: jnp.ndarray,
             max_rate: float = 35.0):
    """One chunk's QoE.  Matches reference ``QoEModel.calculate_qoe``
    (``qoe.py:22-34``).

    weights: [..., 3]; actual_viewport/tile_quality: [..., T];
    rebuffer_time: [...].  Returns (new_state, qoe, qoe1, qoe2, qoe3).
    """
    vp = actual_viewport.astype(jnp.float32)
    vp_sum = jnp.sum(vp, axis=-1)
    quality_raw = jnp.sum(vp * tile_quality, axis=-1) / vp_sum
    intra_raw = jnp.sum(vp * jnp.abs(tile_quality - quality_raw[..., None]), axis=-1) / vp_sum
    intra = intra_raw / max_rate
    quality = quality_raw / max_rate
    inter = jnp.where(state.has_prev, jnp.abs(quality - state.prev_quality), 0.0)
    qoe1 = quality * SCALE_QUALITY
    qoe2 = rebuffer_time * SCALE_REBUFFER
    qoe3 = (intra + inter) * SCALE_VARIANCE
    qoe = weights[..., 0] * qoe1 - weights[..., 1] * qoe2 - weights[..., 2] * qoe3
    new_state = QoEState(prev_quality=quality, has_prev=jnp.ones_like(state.has_prev))
    return new_state, qoe, qoe1, qoe2, qoe3


def qoe_step_with_given_quality(weights: jnp.ndarray, viewport_quality: jnp.ndarray,
                                prev_quality: jnp.ndarray, has_prev: jnp.ndarray,
                                intra_variance: jnp.ndarray, rebuffer_time: jnp.ndarray,
                                max_rate: float = 35.0):
    """Stateless QoE used by the MPC expert; matches reference
    ``QoEModelExpert.calculate_qoe_with_given_quality`` (``qoe.py:50-60``).

    ``viewport_quality``/``intra_variance`` are *unnormalized* (raw bitrate
    units) as in the reference.  Returns (qoe, qoe1, qoe2, qoe3, new_prev).
    """
    quality = viewport_quality / max_rate
    intra = intra_variance / max_rate
    inter = jnp.where(has_prev, jnp.abs(quality - prev_quality), 0.0)
    qoe1 = quality * SCALE_QUALITY
    qoe2 = rebuffer_time * SCALE_REBUFFER
    qoe3 = (intra + inter) * SCALE_VARIANCE
    qoe = weights[..., 0] * qoe1 - weights[..., 1] * qoe2 - weights[..., 2] * qoe3
    return qoe, qoe1, qoe2, qoe3, quality


def normalize_quality(quality: jnp.ndarray, max_rate: float = 35.0) -> jnp.ndarray:
    """Reference ``common.py:40-42``."""
    return quality / max_rate


def normalize_size(size: jnp.ndarray, max_size: float = 500000.0) -> jnp.ndarray:
    """Reference ``common.py:45-47``."""
    return size / max_size


def normalize_throughput(throughput: jnp.ndarray, max_throughput: float = 5000000.0) -> jnp.ndarray:
    """Reference ``common.py:50-52``."""
    return throughput / max_throughput


def normalize_qoe_weight(weight: jnp.ndarray) -> jnp.ndarray:
    """Reference ``common.py:55-57``."""
    return weight / jnp.sum(weight, axis=-1, keepdims=True)
