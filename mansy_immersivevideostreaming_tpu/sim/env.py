"""ABR environments as pure reset/step functions over device tables.

Functional equivalents of the reference gym envs:

* ``MANSYEnv`` — reference ``bitrate_selection/envs/mansy_env.py:16-290``
* ``SimpleRLEnv`` — reference ``bitrate_selection/envs/simple_rl_env.py:12-203``

Design: one :class:`EnvState` pytree per lane; ``vmap(step_env)`` runs
thousands of concurrent episodes; ``lax.scan`` over steps replaces the
tianshou Collector / SubprocVectorEnv process fan-out
(reference ``run_simple_rl.py:38-42``).  Episodes auto-reset on completion,
emitting a per-episode log record for host-side CSV writing.
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mansy_immersivevideostreaming_tpu.ops.allocation import (
    action_to_rates, allocate_tile_rates,
)
from mansy_immersivevideostreaming_tpu.ops.qoe import (
    QoEState, init_qoe_state, qoe_step,
)
from mansy_immersivevideostreaming_tpu.sim.simulator import (
    NetState, init_buffer, init_net_state, push_chunk, simulate_download_prefix,
)
from mansy_immersivevideostreaming_tpu.sim.tables import SimTables


# ---------------------------------------------------------------------------
# Environment sample schedules (host-side, tiny)
# ---------------------------------------------------------------------------

def generate_environment_samples(num_videos: int, num_users: int,
                                 num_traces: int, num_qoe: int,
                                 seed: int = 0) -> np.ndarray:
    """Round-robin train/valid schedule; each id appears at least once.

    Exact port of reference ``utils/common.py:60-84`` (the reference's
    ``seed`` argument is unused there too — the schedule is deterministic).
    Returns i32 [S, 4] of (video_idx, user_idx, trace_idx, qoe_idx).
    """
    max_len = max(num_videos, num_users, num_traces, num_qoe)
    total_len = max(max_len, num_videos * num_qoe *
                    math.ceil(max_len / (num_videos * num_qoe)))
    idx = np.arange(total_len)
    return np.stack([idx % num_videos, idx % num_users,
                     idx % num_traces, idx % num_qoe], axis=1).astype(np.int32)


def generate_demo_samples(num_videos: int, num_users: int, num_traces: int,
                          num_qoe: int, total: int, seed: int = 0,
                          qoe_probs: Sequence[float] | None = None) -> np.ndarray:
    """Stratified random (video, user, trace, qoe) schedule of ``total`` rows.

    Extension beyond the reference (whose round-robin schedule,
    ``utils/common.py:60-84``, caps expert-demo coverage at ~|video|·|qoe|
    episodes): each column is a concatenation of independent permutations, so
    every id appears equally often (±1) while the cross-combinations are
    randomized — Latin-hypercube-style coverage for large demo grids.

    ``qoe_probs`` (optional, len ``num_qoe``) replaces the uniform qoe column
    with a weighted draw — used to focus DAgger relabeling on the weak
    preference cells.
    """
    rng = np.random.default_rng(seed)
    cols = []
    for n in (num_videos, num_users, num_traces, num_qoe):
        reps = math.ceil(total / n)
        col = np.concatenate([rng.permutation(n) for _ in range(reps)])[:total]
        cols.append(col)
    if qoe_probs is not None:
        p = np.asarray(qoe_probs, np.float64)
        assert p.shape == (num_qoe,)
        cols[3] = rng.choice(num_qoe, size=total, p=p / p.sum())
    return np.stack(cols, axis=1).astype(np.int32)


def generate_environment_test_samples(num_videos: int, num_users: int,
                                      num_traces: int, num_qoe: int) -> np.ndarray:
    """Full cartesian product; reference ``utils/common.py:87-98``."""
    grid = np.stack(np.meshgrid(np.arange(num_videos), np.arange(num_users),
                                np.arange(num_traces), np.arange(num_qoe),
                                indexing="ij"), axis=-1)
    return grid.reshape(-1, 4).astype(np.int32)


# ---------------------------------------------------------------------------
# Environment state
# ---------------------------------------------------------------------------

class EnvState(NamedTuple):
    """One ABR episode's full simulator + observation state (one lane)."""
    # identity of the current episode (indices into the split's tables)
    video: jnp.ndarray    # i32
    user: jnp.ndarray     # i32
    trace: jnp.ndarray    # i32
    qoe_id: jnp.ndarray   # i32
    # sample scheduling
    next_sample: jnp.ndarray  # i32 pointer into the sample table for the NEXT reset
    # simulator state
    next_chunk: jnp.ndarray   # i32
    buf: jnp.ndarray          # f32 seconds
    net: NetState
    qoe: QoEState
    # observation histories, newest first (np.roll(,1) semantics,
    # reference mansy_env.py:192-206)
    past_throughput: jnp.ndarray  # f32 [K] normalized
    past_acc: jnp.ndarray         # f32 [K]
    past_rate_in: jnp.ndarray     # f32 [K] normalized
    past_rate_out: jnp.ndarray    # f32 [K] normalized
    past_vq: jnp.ndarray          # f32 [K] qoe1 history
    past_var: jnp.ndarray         # f32 [K] qoe3 history
    past_rebuf: jnp.ndarray       # f32 [K] qoe2 / startup_download history
    last_rebuffer: jnp.ndarray    # f32 (raw qoe2, for SimpleRL obs)
    last_acc: jnp.ndarray         # f32 accuracy of the chunk in the current obs
    last_action_one_hot: jnp.ndarray  # f32 [A]
    # per-episode QoE accumulators (for episode logs,
    # reference mansy_env.py:271-290)
    ep_qoe: jnp.ndarray
    ep_qoe1: jnp.ndarray
    ep_qoe2: jnp.ndarray
    ep_qoe3: jnp.ndarray
    ep_steps: jnp.ndarray  # i32


class LogRecord(NamedTuple):
    """Per-episode summary emitted at episode end (means as in reference
    ``mansy_env.py:277-284``: qoe normalized by the preference weight sum)."""
    done: jnp.ndarray
    video: jnp.ndarray
    user: jnp.ndarray
    trace: jnp.ndarray
    qoe_id: jnp.ndarray
    qoe: jnp.ndarray
    qoe1: jnp.ndarray
    qoe2: jnp.ndarray
    qoe3: jnp.ndarray
    ret: jnp.ndarray    # episode return: sum of raw per-chunk qoe
    steps: jnp.ndarray  # episode length in chunks


def reset_env(tables: SimTables, samples: jnp.ndarray,
              sample_ptr: jnp.ndarray, stride: int) -> EnvState:
    """Start the episode at ``samples[sample_ptr]``.

    Mirrors reference ``MANSYEnv.reset`` (``mansy_env.py:99-152``): fresh
    simulator (next_chunk = startup_download + 1, reference
    ``simulator.py:45`` — note the reference's own ``Simulator.reset`` uses
    ``startup_download`` instead, a dead code path since envs always build a
    fresh Simulator per episode), fresh QoE model, zeroed histories.
    ``stride`` advances the pointer for worker-strided sampling
    (reference ``mansy_env.py:100-101``).
    """
    sample = samples[sample_ptr % samples.shape[0]]
    video, user, trace, qoe_id = sample[0], sample[1], sample[2], sample[3]
    K = tables.past_k
    zeros_k = jnp.zeros(K, jnp.float32)
    next_chunk = jnp.int32(tables.startup_download + 1)
    return EnvState(
        video=video, user=user, trace=trace, qoe_id=qoe_id,
        next_sample=(sample_ptr + stride) % samples.shape[0],
        next_chunk=next_chunk,
        buf=init_buffer(tables.chunk_length),
        net=init_net_state(),
        qoe=init_qoe_state(),
        past_throughput=zeros_k, past_acc=zeros_k,
        past_rate_in=zeros_k, past_rate_out=zeros_k,
        past_vq=zeros_k, past_var=zeros_k, past_rebuf=zeros_k,
        last_rebuffer=jnp.float32(0.0),
        last_acc=tables.vp_acc[video, user, next_chunk],
        last_action_one_hot=jnp.zeros(tables.action_space, jnp.float32),
        ep_qoe=jnp.float32(0.0), ep_qoe1=jnp.float32(0.0),
        ep_qoe2=jnp.float32(0.0), ep_qoe3=jnp.float32(0.0),
        ep_steps=jnp.int32(0),
    )


def _roll(hist: jnp.ndarray, new: jnp.ndarray) -> jnp.ndarray:
    """np.roll(hist, 1); hist[0] = new (reference ``mansy_env.py:192-193``)."""
    return jnp.concatenate([new[None].astype(hist.dtype), hist[:-1]])


def harmonic_bw_estimate(past_throughput: jnp.ndarray) -> jnp.ndarray:
    """Harmonic mean of the non-zero (normalized) throughput history — the
    classic FastMPC bandwidth predictor (Yin et al. SIGCOMM'15); 0.5 prior
    while the history is empty.  Shared by the causal MPC expert
    (``sim.expert.causal_bw_estimate``) and the exact action-value feature."""
    nz = past_throughput > 0
    n = jnp.sum(nz.astype(jnp.float32))
    inv = jnp.sum(jnp.where(nz, 1.0 / jnp.maximum(past_throughput, 1e-12), 0.0))
    return jnp.where(n > 0, n / jnp.maximum(inv, 1e-12), jnp.float32(0.5))


def viewport_acc_estimate(past_acc: jnp.ndarray) -> jnp.ndarray:
    """Causal estimate of the next chunk's prediction RECALL (the fraction of
    the ground-truth viewport covered by the prediction) from the lane's own
    observed accuracy history, used by the accuracy-corrected deployable
    scoring (``sim.expert.corrected_scores``).

    The observed per-chunk accuracy is tile-IoU (``ops.iou_accuracy``,
    reference ``results.py:21``); with the predicted and true viewports of
    near-equal tile count (both are FoV occupancy maps), recall ≈
    ``2 * iou / (1 + iou)``.  Mean over the filled (non-zero) history
    entries; IoU prior 0.8 while the history is empty (≈ the dataset-wide
    mean chunk accuracy, BASELINE.md: shipped export 0.8042)."""
    nz = past_acc > 0
    n = jnp.sum(nz.astype(jnp.float32))
    s = jnp.sum(jnp.where(nz, past_acc, 0.0))
    iou = jnp.where(n > 0, s / jnp.maximum(n, 1.0), jnp.float32(0.8))
    return 2.0 * iou / (1.0 + iou)


def exact_action_values(tables: SimTables, state: EnvState) -> jnp.ndarray:
    """[A+1] exact one-step causal action values + bw_hat (extension).

    The causal-h1 MPC controller's decision variable, computed by the
    environment from quantities causally available at decision time:
    per-action quality/variance/size from the deployable profiling tables
    (``tables.av_*``: pyramid allocation AND evaluation on the PREDICTED
    viewport — the deployed predictor's output; the expert's own tables
    evaluate on the ground-truth viewport, reference ``expert_env.py:160-172``,
    which no real player can do), download time from the harmonic-mean
    bandwidth estimate, and rebuffering from the simulator's own
    ``push_chunk`` buffer dynamics.  Unlike the *derived*
    ``models.abr_nets.causal_action_values`` reconstruction (which
    approximates the dynamics from the normalized obs and scores +0.0636 as
    a controller vs the true h1 expert's +0.1356 — BASELINE.md round-4), this
    is bit-exactly the h1 search objective of
    ``sim.expert.choose_action(..., bw_hat=...)`` on deployable tables.
    """
    v, u, c = state.video, state.user, state.next_chunk
    bw_hat = harmonic_bw_estimate(state.past_throughput)  # normalized
    quality = tables.av_quality[v, u, c]                      # [A]
    intra = tables.av_intra[v, u, c]                          # [A]
    if tables.av_out_quality is not None:
        # accuracy-corrected estimate of the REALIZED quality/variance
        # (sim.expert.corrected_scores), still fully causal
        from mansy_immersivevideostreaming_tpu.sim.expert import corrected_scores
        acc_hat = viewport_acc_estimate(state.past_acc)
        quality, intra = corrected_scores(
            quality, intra, tables.av_out_quality[v, u, c],
            tables.av_out_intra[v, u, c], acc_hat)
    q_n = quality / tables.max_rate                           # [A]
    intra_n = intra / tables.max_rate                         # [A]
    dt = tables.av_size[v, u, c] / (bw_hat * tables.max_throughput)
    _, rebuf = push_chunk(state.buf, tables.chunk_length, dt)
    w = tables.qoe_weights[state.qoe_id]
    w = w / jnp.sum(w)
    inter = jnp.where(state.qoe.has_prev,
                      jnp.abs(q_n - state.qoe.prev_quality), 0.0)
    av = w[0] * q_n - w[1] * rebuf - w[2] * (intra_n + inter)
    return jnp.concatenate([av, bw_hat[None]])


def observe_mansy(tables: SimTables, state: EnvState) -> Dict[str, jnp.ndarray]:
    """13-field MANSY observation (reference ``mansy_env.py:136-150``); when
    deployable action-value tables are attached (``tables.av_quality`` not
    None), a 14th ``action_values`` field carries the exact causal one-step
    QoE per action (see :func:`exact_action_values`)."""
    v, u, c = state.video, state.user, state.next_chunk
    obs = {
        "throughput": state.past_throughput,
        "next_chunk_size": tables.sizes[v, c] / tables.max_size,
        "next_chunk_quality": tables.qualities[v, c] / tables.max_rate,
        "pred_viewport": tables.pred[v, u, c],
        "rates_inside": state.past_rate_in,
        "rates_outside": state.past_rate_out,
        "viewport_acc": state.past_acc,
        "buffer": (state.buf / tables.startup_download)[None],
        "qoe_weight": tables.qoe_weights[state.qoe_id] /
                      jnp.sum(tables.qoe_weights[state.qoe_id]),
        "action_one_hot": state.last_action_one_hot,
        "past_viewport_qualities": state.past_vq,
        "past_quality_variances": state.past_var,
        "past_rebuffering": state.past_rebuf,
    }
    if tables.av_quality is not None:
        obs["action_values"] = exact_action_values(tables, state)
    return obs


def observe_simple(tables: SimTables, state: EnvState) -> Dict[str, jnp.ndarray]:
    """5-field SimpleRL observation (reference ``simple_rl_env.py:103-109``)."""
    v, u, c = state.video, state.user, state.next_chunk
    # past_rate_in/out[0] hold exactly normalize_quality(video_rates[rate]),
    # matching the reference's last_bitrates (simple_rl_env.py:136-137).
    return {
        "throughput": state.past_throughput,
        "chunk_sizes": tables.sizes[v, c] / tables.max_size,
        "rebuffer": state.last_rebuffer[None],
        "last_bitrates": jnp.stack([state.past_rate_in[0], state.past_rate_out[0]]),
        "pred_viewport": tables.pred[v, u, c],
    }


def step_env(tables: SimTables, samples: jnp.ndarray, state: EnvState,
             action: jnp.ndarray, stride: int, train: bool
             ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, LogRecord]:
    """One env transition with auto-reset.

    Mirrors reference ``MANSYEnv.step`` (``mansy_env.py:154-248``):
    action -> pyramid allocation on the predicted viewport -> simulated
    download -> QoE on the ground-truth viewport -> history rolls.
    Returns (new_state, reward, done, log_record); when ``done`` the returned
    state is already reset to the next scheduled sample.

    ``train=True`` normalizes the reward by the preference weight sum
    (reference ``mansy_env.py:177``); the identifier bonus is applied at PPO
    update time (reference ``mansy_ppo.py:41-48``), not here.
    """
    v, u, c = state.video, state.user, state.next_chunk
    rate_in, rate_out = action_to_rates(action)
    pred_vp = tables.pred[v, u, c]
    versions, _ = allocate_tile_rates(rate_in, rate_out, pred_vp)

    # Select each tile's (size, quality) at its allocated rate version as a
    # one-hot contraction over the [R, T] chunk slab instead of a per-element
    # gather — TPU lowers scattered gathers poorly, while this is pure VPU
    # multiply-add.
    onehot = jax.nn.one_hot(versions, tables.sizes.shape[2], axis=0,
                            dtype=jnp.float32)          # [R, T]
    sizes = jnp.sum(tables.sizes[v, c] * onehot, axis=0)      # [T]
    quals = jnp.sum(tables.qualities[v, c] * onehot, axis=0)  # [T]
    chunk_size = jnp.sum(sizes)

    net, download_time = simulate_download_prefix(
        tables.bw[state.trace], tables.bw_prefix[state.trace],
        tables.bw_len[state.trace], state.net, chunk_size)
    buf, rebuffer = push_chunk(state.buf, tables.chunk_length, download_time)

    gt_vp = tables.gt[v, u, c]
    weights = tables.qoe_weights[state.qoe_id]
    qoe_state, qoe, qoe1, qoe2, qoe3 = qoe_step(
        state.qoe, weights, gt_vp, quals, rebuffer, tables.max_rate)

    reward = jnp.where(jnp.bool_(train), qoe / jnp.sum(weights), qoe)

    over = (c + 1) > tables.end_chunk[v, u]
    rates_f = tables.video_rates.astype(jnp.float32)
    one_hot = jax.nn.one_hot(action, tables.action_space, dtype=jnp.float32)

    stepped = EnvState(
        video=v, user=u, trace=state.trace, qoe_id=state.qoe_id,
        next_sample=state.next_sample,
        next_chunk=c + 1,
        buf=buf,
        net=net,
        qoe=qoe_state,
        past_throughput=_roll(state.past_throughput,
                              chunk_size / download_time / tables.max_throughput),
        past_acc=_roll(state.past_acc, state.last_acc),
        past_rate_in=_roll(state.past_rate_in, rates_f[rate_in] / tables.max_rate),
        past_rate_out=_roll(state.past_rate_out, rates_f[rate_out] / tables.max_rate),
        past_vq=_roll(state.past_vq, qoe1),
        past_var=_roll(state.past_var, qoe3),
        past_rebuf=_roll(state.past_rebuf, qoe2 / tables.startup_download),
        last_rebuffer=qoe2,
        last_acc=tables.vp_acc[v, u, jnp.minimum(c + 1, tables.gt.shape[2] - 1)],
        last_action_one_hot=one_hot,
        ep_qoe=state.ep_qoe + qoe, ep_qoe1=state.ep_qoe1 + qoe1,
        ep_qoe2=state.ep_qoe2 + qoe2, ep_qoe3=state.ep_qoe3 + qoe3,
        ep_steps=state.ep_steps + 1,
    )

    n = stepped.ep_steps.astype(jnp.float32)
    log = LogRecord(
        done=over,
        video=v, user=u, trace=state.trace, qoe_id=state.qoe_id,
        qoe=stepped.ep_qoe / n / jnp.sum(weights),
        qoe1=stepped.ep_qoe1 / n, qoe2=stepped.ep_qoe2 / n,
        qoe3=stepped.ep_qoe3 / n,
        ret=stepped.ep_qoe, steps=stepped.ep_steps,
    )

    fresh = reset_env(tables, samples, state.next_sample, stride)
    new_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(over, a, b), fresh, stepped)
    return new_state, reward, over, log
