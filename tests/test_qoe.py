"""Tests for the functional QoE model vs a direct host oracle."""

import numpy as np
import pytest

from mansy_immersivevideostreaming_tpu.ops import qoe as Q

MAX_RATE = 35.0


def oracle_qoe_sequence(weights, viewports, qualities, rebuffers):
    """Sequential oracle mirroring reference qoe.py:22-34 semantics."""
    prev = None
    out = []
    for vp, tq, rb in zip(viewports, qualities, rebuffers):
        vq = float(np.sum(vp * tq) / np.sum(vp))
        intra = float(np.sum(vp * np.abs(tq - vq)) / np.sum(vp)) / MAX_RATE
        vq_n = vq / MAX_RATE
        inter = abs(vq_n - prev) if prev is not None else 0.0
        prev = vq_n
        q1, q2, q3 = vq_n, rb, intra + inter
        out.append((weights[0] * q1 - weights[1] * q2 - weights[2] * q3, q1, q2, q3))
    return out


def test_qoe_step_sequence():
    rng = np.random.default_rng(0)
    w = np.array([7.0, 1.0, 1.0], np.float32)
    T = 10
    vps = (rng.random((T, 64)) < 0.3).astype(np.float32)
    vps[:, 0] = 1  # nonempty
    tqs = rng.choice([1, 5, 8, 16, 35], (T, 64)).astype(np.float32)
    rbs = rng.random(T).astype(np.float32)
    want = oracle_qoe_sequence(w, vps, tqs, rbs)

    state = Q.init_qoe_state()
    for t in range(T):
        state, qoe, q1, q2, q3 = Q.qoe_step(state, w, vps[t], tqs[t], rbs[t])
        wq, w1, w2, w3 = want[t]
        assert float(qoe) == pytest.approx(wq, rel=1e-5)
        assert float(q1) == pytest.approx(w1, rel=1e-5)
        assert float(q2) == pytest.approx(w2, rel=1e-5)
        assert float(q3) == pytest.approx(w3, rel=1e-5)


def test_qoe_expert_variant():
    w = np.array([3.0, 3.0, 3.0], np.float32)
    qoe, q1, q2, q3, prev = Q.qoe_step_with_given_quality(
        w, np.float32(16.0), np.float32(0.0), np.array(False),
        np.float32(2.0), np.float32(0.5))
    assert float(q1) == pytest.approx(16 / 35)
    assert float(q3) == pytest.approx(2 / 35)  # no inter on first chunk
    assert float(prev) == pytest.approx(16 / 35)
    qoe2, *_ = Q.qoe_step_with_given_quality(
        w, np.float32(35.0), prev, np.array(True), np.float32(0.0), np.float32(0.0))
    # inter = |1 - 16/35|
    assert float(qoe2) == pytest.approx(3 * 1.0 - 3 * 0.0 - 3 * (1 - 16 / 35), rel=1e-5)


def test_normalizers():
    assert float(Q.normalize_quality(np.float32(35.0))) == 1.0
    assert float(Q.normalize_size(np.float32(500000.0))) == 1.0
    assert float(Q.normalize_throughput(np.float32(5e6))) == 1.0
    w = Q.normalize_qoe_weight(np.array([7.0, 1.0, 1.0], np.float32))
    np.testing.assert_allclose(np.asarray(w), [7 / 9, 1 / 9, 1 / 9], rtol=1e-6)
