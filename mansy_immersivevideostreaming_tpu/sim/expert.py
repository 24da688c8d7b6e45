"""MPC expert: per-chunk action profiling tables + vmapped lookahead search.

Rebuild of the reference ``ExpertEnv`` (reference
``bitrate_selection/envs/expert_env.py``):

* ``_profile_viewport_qualities_sizes`` (``expert_env.py:127-182``): for every
  (video, user, chunk, action) precompute viewport quality, intra-viewport
  variance and chunk size under pyramid allocation — for both the gt-allocated
  and pred-allocated variants (both *evaluated* on the gt viewport, exactly as
  the reference does at ``expert_env.py:160-172``).  The reference loops on
  the host and pickles a cache; here it is one vmapped device computation.
* ``choose_action`` (``expert_env.py:358-422``): enumerate all
  ``action_space ** horizon`` action sequences (same digit order as
  ``_proflie_all_possible_bitrates``, ``expert_env.py:113-125``), roll each
  forward virtually with the real network/buffer state, sum QoE, take the
  first argmax.  The reference's 50,625-sequence Python loop becomes a vmap.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mansy_immersivevideostreaming_tpu.ops.allocation import (
    ACTION_TO_RATES, allocate_tile_rates,
)
from mansy_immersivevideostreaming_tpu.sim.env import (
    EnvState, harmonic_bw_estimate,
)
from mansy_immersivevideostreaming_tpu.sim.simulator import (
    NetState, push_chunk, simulate_download_prefix,
)
from mansy_immersivevideostreaming_tpu.sim.tables import SimTables


class ExpertTables(NamedTuple):
    """[V, U, C, A] profiling tables (A = action space).

    ``gt_*``: allocated AND evaluated on the ground-truth viewport;
    ``pred_*``: allocated on the predicted viewport, evaluated on the
    ground-truth one (both exactly as the reference,
    ``expert_env.py:160-172``); ``dep_*`` (extension): allocated AND
    evaluated on the predicted viewport — the fully *deployable* variant a
    real player could compute at decision time (size needs no dep variant:
    it depends only on the allocation, so ``pred_size`` applies);
    ``out_*`` (extension): allocated on the predicted viewport, evaluated
    over its COMPLEMENT — with ``dep_*`` this lets a player form the
    accuracy-corrected realized-quality estimate
    ``acc * dep + (1 - acc) * out`` from its own observed prediction-accuracy
    history (see :func:`corrected_scores`), still fully causal."""
    gt_quality: jnp.ndarray
    gt_intra: jnp.ndarray
    gt_size: jnp.ndarray
    pred_quality: jnp.ndarray
    pred_intra: jnp.ndarray
    pred_size: jnp.ndarray
    dep_quality: jnp.ndarray
    dep_intra: jnp.ndarray
    out_quality: jnp.ndarray
    out_intra: jnp.ndarray


def build_expert_tables(tables: SimTables) -> ExpertTables:
    """Vmapped device equivalent of the reference's profiling loop."""
    V, U, C, T = tables.gt.shape
    A = ACTION_TO_RATES.shape[0]
    actions = jnp.asarray(ACTION_TO_RATES)  # [A, 2]
    tile_idx = jnp.arange(T)

    def per_action(alloc_vp, eval_vp, sizes_c, quals_c, act):
        versions, _ = allocate_tile_rates(act[0], act[1], alloc_vp)
        onehot = jax.nn.one_hot(versions, sizes_c.shape[0], axis=0,
                                dtype=jnp.float32)
        sz = jnp.sum(sizes_c * onehot)
        q = jnp.sum(quals_c * onehot, axis=0)
        vp_sum = jnp.maximum(jnp.sum(eval_vp), 1e-6)
        quality = jnp.sum(eval_vp * q) / vp_sum
        intra = jnp.sum(eval_vp * jnp.abs(q - quality)) / vp_sum
        return quality, intra, sz

    def per_chunk(v, u, c):
        gt_vp = tables.gt[v, u, c]
        pred_vp = tables.pred[v, u, c]
        comp_vp = jnp.maximum(1.0 - pred_vp, 0.0)  # complement of prediction
        sizes_c = tables.sizes[v, c]
        quals_c = tables.qualities[v, c]
        gt_q, gt_i, gt_s = jax.vmap(
            lambda a: per_action(gt_vp, gt_vp, sizes_c, quals_c, a))(actions)
        p_q, p_i, p_s = jax.vmap(
            lambda a: per_action(pred_vp, gt_vp, sizes_c, quals_c, a))(actions)
        d_q, d_i, _ = jax.vmap(
            lambda a: per_action(pred_vp, pred_vp, sizes_c, quals_c, a))(actions)
        o_q, o_i, _ = jax.vmap(
            lambda a: per_action(pred_vp, comp_vp, sizes_c, quals_c, a))(actions)
        return gt_q, gt_i, gt_s, p_q, p_i, p_s, d_q, d_i, o_q, o_i

    vs, us, cs = jnp.meshgrid(jnp.arange(V), jnp.arange(U), jnp.arange(C),
                              indexing="ij")
    flat = jax.jit(jax.vmap(per_chunk))(vs.reshape(-1), us.reshape(-1),
                                        cs.reshape(-1))
    shaped = tuple(x.reshape(V, U, C, A) for x in flat)
    return ExpertTables(gt_quality=shaped[0], gt_intra=shaped[1],
                        gt_size=shaped[2], pred_quality=shaped[3],
                        pred_intra=shaped[4], pred_size=shaped[5],
                        dep_quality=shaped[6], dep_intra=shaped[7],
                        out_quality=shaped[8], out_intra=shaped[9])


def deployable_etables(etables: ExpertTables) -> ExpertTables:
    """Swap the search's scoring tables to the fully deployable variant, so
    ``choose_action`` (which reads ``pred_quality``/``pred_intra``/
    ``pred_size``) optimizes exactly what a real player could compute —
    pred-allocated AND pred-evaluated quality/variance."""
    return etables._replace(pred_quality=etables.dep_quality,
                            pred_intra=etables.dep_intra)


def corrected_scores(dep_q, dep_i, out_q, out_i, acc):
    """Accuracy-corrected causal estimate of the REALIZED (gt-evaluated)
    per-action quality/intra-variance (extension, no reference analogue).

    Realized quality averages the pred-allocated tile qualities over the
    ground-truth viewport; splitting that viewport into the predicted region
    (fraction ``acc``, the prediction accuracy) and its complement gives
    ``q ≈ acc * dep_q + (1 - acc) * out_q``.  For the mean absolute deviation,
    mixing the two regions around the combined mean adds the between-region
    spread term ``2 acc (1 - acc) |dep_q - out_q|`` (exact for a two-point
    mixture of the region means).  ``acc`` comes from the lane's own observed
    prediction-accuracy history (``sim.env.viewport_acc_estimate``), so the
    estimate is fully causal and deployable."""
    q = acc * dep_q + (1.0 - acc) * out_q
    i = (acc * dep_i + (1.0 - acc) * out_i
         + 2.0 * acc * (1.0 - acc) * jnp.abs(dep_q - out_q))
    return q, i


def attach_action_values(tables: SimTables, etables: ExpertTables,
                         acc_correct: bool = False) -> SimTables:
    """Attach the deployable per-action profiling tables to the env tables,
    enabling the exact ``action_values`` observation field
    (``sim.env.exact_action_values``).  With ``acc_correct`` the out-of-
    prediction tables are attached too, switching the field to the
    accuracy-corrected estimate (:func:`corrected_scores`)."""
    return tables._replace(av_quality=etables.dep_quality,
                           av_intra=etables.dep_intra,
                           av_size=etables.pred_size,
                           av_out_quality=(etables.out_quality
                                           if acc_correct else None),
                           av_out_intra=(etables.out_intra
                                         if acc_correct else None))


@functools.lru_cache(maxsize=None)
def action_sequences(horizon: int, action_space: int = 15) -> np.ndarray:
    """[A^h, h]; sequence i's step-j action is (i // A^j) % A, matching the
    reference's digit expansion (``expert_env.py:113-125``)."""
    n = action_space ** horizon
    i = np.arange(n)
    return np.stack([(i // action_space ** j) % action_space
                     for j in range(horizon)], axis=1).astype(np.int32)


def causal_bw_estimate(tables: SimTables, state: EnvState) -> jnp.ndarray:
    """Harmonic-mean bandwidth predictor over the lane's OWN past throughput.

    The stock expert rollout walks the true future network trace
    (reference ``expert_env.py:358-422`` passes the env's live
    ``network_trace`` into the virtual download) — privileged information no
    causal policy can observe, so part of the MPC-oracle headroom is
    unreachable by imitation.  This estimator uses exactly what the policy
    itself observes (``mansy_env.py:136-150``: past achieved throughput,
    newest first): the harmonic mean of the non-zero history entries — the
    classic MPC-ABR predictor (FastMPC, Yin et al. SIGCOMM'15) —
    de-normalized by ``max_throughput``.  Falls back to
    ``0.5 * max_throughput`` at episode start while the history is empty.
    """
    return harmonic_bw_estimate(state.past_throughput) * tables.max_throughput


def choose_action(tables: SimTables, etables: ExpertTables, state: EnvState,
                  seqs: jnp.ndarray, bw_hat=None, acc_hat=None,
                  use_corr=None, return_margin: bool = False) -> jnp.ndarray:
    """Best first action by horizon-step virtual rollouts
    (reference ``expert_env.py:358-422``).

    The effective horizon is clamped to the episode end
    (``expert_env.py:362``) by masking steps past ``end_chunk``.
    Per sequence the rollout shares the lane's real buffer/network/QoE state
    and uses the *pred* profiling tables, exactly as the reference.

    ``bw_hat`` (optional scalar, raw trace units): CAUSAL mode — virtual
    downloads run at this constant predicted bandwidth (``dt = size /
    bw_hat``) instead of walking the true future trace, removing the
    privileged-information advantage.  Pair with ``causal_bw_estimate``.
    The reference has no such mode; it is this framework's diagnostic for
    how much of the oracle ceiling is causally reachable.

    ``acc_hat`` (optional scalar in [0, 1]): ACCURACY-CORRECTED deployable
    scoring — quality/intra come from :func:`corrected_scores` over the
    ``dep_*``/``out_*`` tables at this estimated prediction accuracy,
    instead of ``pred_*`` (which evaluate on the ground-truth viewport —
    privileged, ``expert_env.py:160-172``).  Pair with
    ``sim.env.viewport_acc_estimate``.

    ``use_corr`` (optional bool scalar, requires ``acc_hat``): traced
    PER-LANE switch between corrected (True) and ``pred_*`` (False) scoring
    — used by per-preference hybrid teachers (``run_dagger
    --acc-correct-prefs``), where different QoE preferences get differently
    scored labels inside one vmapped collector.

    ``return_margin``: also return the teacher's DECISION MARGIN — the gap
    between the best and second-best *first-action* values (max of sequence
    totals grouped by first action), normalized by the preference's weight
    sum so thresholds are comparable across preferences.  A small margin
    means the label sits on a causally-ambiguous boundary state where the
    teacher's argmax is effectively a coin flip given the observation —
    exactly the labels the five-round clone-gap analysis found unlearnable
    (BASELINE v18/v19: "CE on causally-ambiguous boundary states").
    Requires ``seqs`` to be the full enumeration from
    :func:`action_sequences` (first action varies fastest).
    """
    v, u = state.video, state.user
    weights = tables.qoe_weights[state.qoe_id]
    bw_row = tables.bw[state.trace]
    bw_prefix = tables.bw_prefix[state.trace]
    bw_len = tables.bw_len[state.trace]
    end_chunk = tables.end_chunk[v, u]
    horizon = seqs.shape[1]

    def rollout(seq):
        def body(carry, t):
            net, buf, prev_q, has_prev, total = carry
            chunk = state.next_chunk + t
            valid = chunk <= end_chunk
            a = seq[t]
            size = etables.pred_size[v, u, chunk, a]
            if acc_hat is None:
                quality = etables.pred_quality[v, u, chunk, a]
                intra = etables.pred_intra[v, u, chunk, a]
            else:
                quality, intra = corrected_scores(
                    etables.dep_quality[v, u, chunk, a],
                    etables.dep_intra[v, u, chunk, a],
                    etables.out_quality[v, u, chunk, a],
                    etables.out_intra[v, u, chunk, a], acc_hat)
                if use_corr is not None:
                    quality = jnp.where(use_corr, quality,
                                        etables.pred_quality[v, u, chunk, a])
                    intra = jnp.where(use_corr, intra,
                                      etables.pred_intra[v, u, chunk, a])
            if bw_hat is None:
                new_net, dt = simulate_download_prefix(bw_row, bw_prefix,
                                                       bw_len, net, size)
            else:
                new_net, dt = net, size / bw_hat
            new_buf, rebuf = push_chunk(buf, tables.chunk_length, dt)
            q_n = quality / tables.max_rate
            intra_n = intra / tables.max_rate
            inter = jnp.where(has_prev, jnp.abs(q_n - prev_q), 0.0)
            qoe = (weights[0] * q_n - weights[1] * rebuf
                   - weights[2] * (intra_n + inter))
            carry = (
                jax.tree_util.tree_map(lambda a_, b_: jnp.where(valid, a_, b_),
                                       new_net, net),
                jnp.where(valid, new_buf, buf),
                jnp.where(valid, q_n, prev_q),
                jnp.logical_or(has_prev, valid),
                total + jnp.where(valid, qoe, 0.0),
            )
            return carry, None

        init = (state.net, state.buf, state.qoe.prev_quality,
                state.qoe.has_prev, jnp.float32(0.0))
        (_, _, _, _, total), _ = jax.lax.scan(body, init, jnp.arange(horizon))
        return total

    totals = jax.vmap(rollout)(seqs)
    best = jnp.argmax(totals)
    if not return_margin:
        return seqs[best, 0]
    n_seqs = int(seqs.shape[0])
    n_act = int(round(n_seqs ** (1.0 / horizon)))
    assert n_act ** horizon == n_seqs, (
        "return_margin needs the full action_sequences enumeration")
    # first action = i % n_act (action_sequences digit order), so grouping
    # by first action is a reshape; ties give margin exactly 0
    first_av = totals.reshape(n_seqs // n_act, n_act).max(axis=0)
    top2 = jax.lax.top_k(first_av, 2)[0]
    margin = (top2[0] - top2[1]) / jnp.sum(weights)
    return seqs[best, 0], margin
