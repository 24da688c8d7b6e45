"""Parity tests for the MPC expert vs host brute force over real data."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_data

import mansy_immersivevideostreaming_tpu as mansy
from mansy_immersivevideostreaming_tpu.ops.allocation import ACTION_TO_RATES
from mansy_immersivevideostreaming_tpu.sim import build_sim_tables, reset_env, step_env
from mansy_immersivevideostreaming_tpu.sim.expert import (
    action_sequences, build_expert_tables, choose_action,
)
from _alloc_oracle import oracle_allocate

CFG = mansy.default_config()


@pytest.fixture(scope="module")
def setup():
    tables = build_sim_tables(CFG, "Jin2022", "4G", videos=[1, 9], users=[1],
                              traces=[0], qoe_weights=[[7, 1, 1]])
    etables = build_expert_tables(tables)
    return tables, etables


@requires_data
def test_profile_tables_match_host(setup):
    tables, etables = setup
    t = np.arange(64)
    rng = np.random.default_rng(0)
    for _ in range(20):
        v = int(rng.integers(0, 2))
        c = int(rng.integers(6, 50))
        a = int(rng.integers(0, 15))
        ri, ro = ACTION_TO_RATES[a]
        gt = np.asarray(tables.gt[v, 0, c])
        pred = np.asarray(tables.pred[v, 0, c])
        sizes = np.asarray(tables.sizes[v, c])
        quals = np.asarray(tables.qualities[v, c])
        # pred variant: allocate by pred viewport, evaluate on gt viewport
        # (reference expert_env.py:166-172)
        versions = oracle_allocate(int(ri), int(ro), pred)
        q = quals[versions, t]
        want_quality = float(np.sum(gt * q) / np.sum(gt))
        want_intra = float(np.sum(gt * np.abs(q - want_quality)) / np.sum(gt))
        want_size = float(np.sum(sizes[versions, t]))
        assert float(etables.pred_quality[v, 0, c, a]) == pytest.approx(want_quality, rel=1e-5)
        assert float(etables.pred_intra[v, 0, c, a]) == pytest.approx(want_intra, rel=1e-4)
        assert float(etables.pred_size[v, 0, c, a]) == pytest.approx(want_size, rel=1e-5)


@requires_data
def test_choose_action_matches_bruteforce(setup):
    """Vmapped sequence search == host loop over all sequences (horizon 2)."""
    tables, etables = setup
    horizon = 2
    seqs = jnp.asarray(action_sequences(horizon, 15))
    samples = jnp.asarray(np.array([[0, 0, 0, 0], [1, 0, 0, 0]], np.int32))

    def host_net_download(bw, idx, t, size):
        while size > 0:
            remain = (math.floor(t + 1) - t) * bw[idx]
            if size >= remain:
                idx = (idx + 1) % len(bw)
                t = math.floor(t + 1)
                size -= remain
            else:
                t += size / bw[idx]
                size = 0
        return idx, t

    step = jax.jit(lambda s, a: step_env(tables, samples, s, a, 1, False))
    pick = jax.jit(lambda s: choose_action(tables, etables, s, seqs))

    for si in (0, 1):
        state = reset_env(tables, samples, jnp.int32(si), 1)
        v = int(state.video)
        bw = np.asarray(tables.bw[0][: int(tables.bw_len[0])])
        for _ in range(6):  # several steps into the episode
            got = int(pick(state))
            # host brute force
            end_chunk = int(tables.end_chunk[v, 0])
            h = min(horizon, end_chunk - int(state.next_chunk) + 1)
            best_total, best_i = -float("inf"), 0
            for i in range(15 ** horizon):
                total = 0.0
                idx, t = int(state.net.idx), float(state.net.sec) + float(state.net.frac)
                buf = float(state.buf)
                prev_q = float(state.qoe.prev_quality)
                has_prev = bool(state.qoe.has_prev)
                for j in range(h):
                    a = (i // 15 ** j) % 15
                    chunk = int(state.next_chunk) + j
                    size = float(etables.pred_size[v, 0, chunk, a])
                    quality = float(etables.pred_quality[v, 0, chunk, a])
                    intra = float(etables.pred_intra[v, 0, chunk, a])
                    start = t
                    idx, t = host_net_download(bw, idx, t, size)
                    dt = t - start
                    if dt > buf:
                        rebuf, buf = dt - buf, 1.0
                    else:
                        rebuf, buf = 0.0, buf - dt + 1.0
                    qn, intran = quality / 35.0, intra / 35.0
                    inter = abs(qn - prev_q) if has_prev else 0.0
                    prev_q, has_prev = qn, True
                    total += 7 * qn - 1 * rebuf - 1 * (intran + inter)
                if total > best_total:
                    best_total, best_i = total, i
            want = best_i % 15
            assert got == want, f"state chunk {int(state.next_chunk)}"
            state, _, over, _ = step(state, jnp.int32(got))
            if bool(over):
                break


@requires_data
def test_causal_bw_estimate_fallback_and_harmonic(setup):
    tables, _ = setup
    from mansy_immersivevideostreaming_tpu.sim.expert import causal_bw_estimate
    samples = jnp.asarray(np.array([[0, 0, 0, 0]], np.int32))
    state = reset_env(tables, samples, jnp.int32(0), 1)
    # empty history -> 0.5 * max_throughput prior
    assert float(causal_bw_estimate(tables, state)) == pytest.approx(
        0.5 * float(tables.max_throughput), rel=1e-6)
    # harmonic mean over the NON-ZERO entries only, de-normalized
    hist = np.zeros_like(np.asarray(state.past_throughput))
    hist[0], hist[1], hist[2] = 0.2, 0.4, 0.8
    state = state._replace(past_throughput=jnp.asarray(hist))
    want = 3.0 / (1 / 0.2 + 1 / 0.4 + 1 / 0.8) * float(tables.max_throughput)
    assert float(causal_bw_estimate(tables, state)) == pytest.approx(
        want, rel=1e-5)


@requires_data
def test_choose_action_causal_matches_bruteforce(setup):
    """Causal-mode search (dt = size / bw_hat, no trace walk) == host loop."""
    tables, etables = setup
    from mansy_immersivevideostreaming_tpu.sim.expert import causal_bw_estimate
    horizon = 2
    seqs = jnp.asarray(action_sequences(horizon, 15))
    samples = jnp.asarray(np.array([[0, 0, 0, 0], [1, 0, 0, 0]], np.int32))

    step = jax.jit(lambda s, a: step_env(tables, samples, s, a, 1, False))
    pick = jax.jit(lambda s: choose_action(
        tables, etables, s, seqs, bw_hat=causal_bw_estimate(tables, s)))

    for si in (0, 1):
        state = reset_env(tables, samples, jnp.int32(si), 1)
        v = int(state.video)
        for _ in range(6):
            got = int(pick(state))
            # host mirror of the causal estimator + rollout
            hist = np.asarray(state.past_throughput)
            nz = hist[hist > 0]
            harm = (len(nz) / np.sum(1.0 / nz)) if len(nz) else 0.5
            bw_hat = harm * float(tables.max_throughput)
            end_chunk = int(tables.end_chunk[v, 0])
            h = min(horizon, end_chunk - int(state.next_chunk) + 1)
            best_total, best_i = -float("inf"), 0
            for i in range(15 ** horizon):
                total = 0.0
                buf = float(state.buf)
                prev_q = float(state.qoe.prev_quality)
                has_prev = bool(state.qoe.has_prev)
                for j in range(h):
                    a = (i // 15 ** j) % 15
                    chunk = int(state.next_chunk) + j
                    size = float(etables.pred_size[v, 0, chunk, a])
                    quality = float(etables.pred_quality[v, 0, chunk, a])
                    intra = float(etables.pred_intra[v, 0, chunk, a])
                    dt = size / bw_hat
                    if dt > buf:
                        rebuf, buf = dt - buf, 1.0
                    else:
                        rebuf, buf = 0.0, buf - dt + 1.0
                    qn, intran = quality / 35.0, intra / 35.0
                    inter = abs(qn - prev_q) if has_prev else 0.0
                    prev_q, has_prev = qn, True
                    total += 7 * qn - 1 * rebuf - 1 * (intran + inter)
                if total > best_total:
                    best_total, best_i = total, i
            assert got == best_i % 15, f"state chunk {int(state.next_chunk)}"
            state, _, over, _ = step(state, jnp.int32(got))
            if bool(over):
                break
