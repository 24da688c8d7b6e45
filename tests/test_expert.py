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


@requires_data
def test_out_tables_match_host(setup):
    """out variant: allocate by pred viewport, evaluate on its COMPLEMENT
    (extension — basis of the accuracy-corrected deployable estimate)."""
    tables, etables = setup
    t = np.arange(64)
    rng = np.random.default_rng(1)
    for _ in range(10):
        v = int(rng.integers(0, 2))
        c = int(rng.integers(6, 50))
        a = int(rng.integers(0, 15))
        ri, ro = ACTION_TO_RATES[a]
        pred = np.asarray(tables.pred[v, 0, c])
        comp = np.maximum(1.0 - pred, 0.0)
        quals = np.asarray(tables.qualities[v, c])
        versions = oracle_allocate(int(ri), int(ro), pred)
        q = quals[versions, t]
        want_q = float(np.sum(comp * q) / max(np.sum(comp), 1e-6))
        want_i = float(np.sum(comp * np.abs(q - want_q)) / max(np.sum(comp), 1e-6))
        assert float(etables.out_quality[v, 0, c, a]) == pytest.approx(want_q, rel=1e-5)
        assert float(etables.out_intra[v, 0, c, a]) == pytest.approx(want_i, rel=1e-4)


def test_corrected_scores_endpoints_and_mix():
    from mansy_immersivevideostreaming_tpu.sim.expert import corrected_scores
    dq, di, oq, oi = jnp.float32(30.0), jnp.float32(2.0), jnp.float32(10.0), jnp.float32(1.0)
    # acc=1 -> pure dep; acc=0 -> pure out (spread term vanishes at both ends)
    q1, i1 = corrected_scores(dq, di, oq, oi, jnp.float32(1.0))
    assert float(q1) == pytest.approx(30.0) and float(i1) == pytest.approx(2.0)
    q0, i0 = corrected_scores(dq, di, oq, oi, jnp.float32(0.0))
    assert float(q0) == pytest.approx(10.0) and float(i0) == pytest.approx(1.0)
    # interior: mean mixes linearly; MAD adds the between-region spread
    q, i = corrected_scores(dq, di, oq, oi, jnp.float32(0.75))
    assert float(q) == pytest.approx(0.75 * 30 + 0.25 * 10)
    assert float(i) == pytest.approx(0.75 * 2 + 0.25 * 1 + 2 * 0.75 * 0.25 * 20)


def test_viewport_acc_estimate_prior_and_mean():
    from mansy_immersivevideostreaming_tpu.sim.env import viewport_acc_estimate
    # empty history -> IoU prior 0.8, converted to recall 2a/(1+a)
    f = float(viewport_acc_estimate(jnp.zeros(5)))
    assert f == pytest.approx(2 * 0.8 / 1.8, rel=1e-6)
    # filled entries -> mean IoU of the non-zero ones, then converted
    hist = jnp.asarray(np.array([0.9, 0.6, 0.0, 0.0, 0.0], np.float32))
    f = float(viewport_acc_estimate(hist))
    assert f == pytest.approx(2 * 0.75 / 1.75, rel=1e-6)


@requires_data
def test_choose_action_acc_corrected_matches_bruteforce(setup):
    """Accuracy-corrected causal search == host mirror (horizon 1)."""
    tables, etables = setup
    from mansy_immersivevideostreaming_tpu.sim.expert import (
        causal_bw_estimate, corrected_scores)
    from mansy_immersivevideostreaming_tpu.sim.env import viewport_acc_estimate
    seqs = jnp.asarray(action_sequences(1, 15))
    samples = jnp.asarray(np.array([[0, 0, 0, 0], [1, 0, 0, 0]], np.int32))

    step = jax.jit(lambda s, a: step_env(tables, samples, s, a, 1, False))
    pick = jax.jit(lambda s: choose_action(
        tables, etables, s, seqs, bw_hat=causal_bw_estimate(tables, s),
        acc_hat=viewport_acc_estimate(s.past_acc)))

    for si in (0, 1):
        state = reset_env(tables, samples, jnp.int32(si), 1)
        v = int(state.video)
        for _ in range(5):
            got = int(pick(state))
            hist = np.asarray(state.past_throughput)
            nz = hist[hist > 0]
            harm = (len(nz) / np.sum(1.0 / nz)) if len(nz) else 0.5
            bw_hat = harm * float(tables.max_throughput)
            ahist = np.asarray(state.past_acc)
            anz = ahist[ahist > 0]
            iou = float(np.mean(anz)) if len(anz) else 0.8
            f = 2 * iou / (1 + iou)
            buf = float(state.buf)
            prev_q = float(state.qoe.prev_quality)
            has_prev = bool(state.qoe.has_prev)
            chunk = int(state.next_chunk)
            best_total, best_a = -float("inf"), 0
            for a in range(15):
                size = float(etables.pred_size[v, 0, chunk, a])
                q, i = corrected_scores(
                    etables.dep_quality[v, 0, chunk, a],
                    etables.dep_intra[v, 0, chunk, a],
                    etables.out_quality[v, 0, chunk, a],
                    etables.out_intra[v, 0, chunk, a], jnp.float32(f))
                dt = size / bw_hat
                rebuf = max(dt - buf, 0.0)
                qn, intran = float(q) / 35.0, float(i) / 35.0
                inter = abs(qn - prev_q) if has_prev else 0.0
                total = 7 * qn - 1 * rebuf - 1 * (intran + inter)
                if total > best_total:
                    best_total, best_a = total, a
            assert got == best_a, f"chunk {chunk}"
            state, _, over, _ = step(state, jnp.int32(got))
            if bool(over):
                break


def test_choose_action_use_corr_switch(setup):
    """``use_corr`` is a traced per-lane switch: True reproduces the
    accuracy-corrected pick exactly, False reproduces the gt-evaluated
    ``pred_*`` pick — the invariant behind per-preference hybrid teachers
    (``run_dagger --acc-correct-prefs``)."""
    tables, etables = setup
    from mansy_immersivevideostreaming_tpu.sim.expert import causal_bw_estimate
    from mansy_immersivevideostreaming_tpu.sim.env import viewport_acc_estimate
    seqs = jnp.asarray(action_sequences(2, 15))
    samples = jnp.asarray(np.array([[0, 0, 0, 0], [1, 0, 0, 0]], np.int32))

    def pick(s, acc, corr):
        return choose_action(
            tables, etables, s, seqs, bw_hat=causal_bw_estimate(tables, s),
            acc_hat=(viewport_acc_estimate(s.past_acc) if acc else None),
            use_corr=(jnp.bool_(corr) if acc else None))

    step = jax.jit(lambda s, a: step_env(tables, samples, s, a, 1, False))
    for si in (0, 1):
        state = reset_env(tables, samples, jnp.int32(si), 1)
        for _ in range(4):
            corrected = int(pick(state, True, True))
            plain = int(pick(state, False, False))
            assert int(pick(state, True, False)) == plain
            # sanity: the corrected pick equals the no-switch corrected path
            assert corrected == int(choose_action(
                tables, etables, state, seqs,
                bw_hat=causal_bw_estimate(tables, state),
                acc_hat=viewport_acc_estimate(state.past_acc)))
            state, _, over, _ = step(state, jnp.int32(corrected))
            if bool(over):
                break


@requires_data
def test_choose_action_margin_matches_bruteforce(setup):
    """``return_margin``: (top1 - top2) of per-first-action max totals,
    weight-sum-normalized — host mirror over all 225 causal-h2 sequences."""
    tables, etables = setup
    from mansy_immersivevideostreaming_tpu.sim.expert import causal_bw_estimate
    horizon = 2
    seqs = jnp.asarray(action_sequences(horizon, 15))
    samples = jnp.asarray(np.array([[0, 0, 0, 0], [1, 0, 0, 0]], np.int32))

    step = jax.jit(lambda s, a: step_env(tables, samples, s, a, 1, False))
    pick = jax.jit(lambda s: choose_action(
        tables, etables, s, seqs, bw_hat=causal_bw_estimate(tables, s),
        return_margin=True))

    for si in (0, 1):
        state = reset_env(tables, samples, jnp.int32(si), 1)
        v = int(state.video)
        for _ in range(4):
            got_act, got_margin = pick(state)
            got_act, got_margin = int(got_act), float(got_margin)
            hist = np.asarray(state.past_throughput)
            nz = hist[hist > 0]
            harm = (len(nz) / np.sum(1.0 / nz)) if len(nz) else 0.5
            bw_hat = harm * float(tables.max_throughput)
            end_chunk = int(tables.end_chunk[v, 0])
            h = min(horizon, end_chunk - int(state.next_chunk) + 1)
            av = np.full(15, -np.inf)
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
                av[i % 15] = max(av[i % 15], total)
            order = np.sort(av)
            want_margin = (order[-1] - order[-2]) / 9.0  # sum([7,1,1])
            assert got_act == int(np.argmax(av))
            assert got_margin == pytest.approx(want_margin, rel=1e-4, abs=1e-6)
            state, _, over, _ = step(state, jnp.int32(got_act))
            if bool(over):
                break
