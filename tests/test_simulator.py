"""Step-level parity of the functional simulator/env against an independent
host oracle over the real shipped dataset."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_data

import mansy_immersivevideostreaming_tpu as mansy
from mansy_immersivevideostreaming_tpu.sim import (
    SimTables, build_sim_tables, EnvState, reset_env, step_env, observe_mansy,
    observe_simple, generate_environment_samples, generate_environment_test_samples,
)
from mansy_immersivevideostreaming_tpu.sim.simulator import (
    NetState, init_net_state, simulate_download_bytes,
)

CFG = mansy.default_config()


# --------------------------- host oracle ----------------------------------

class HostNet:
    def __init__(self, bw):
        self.bw = list(bw)
        self.t = 0.0
        self.i = 0

    def download(self, size):
        start = self.t
        while size > 0:
            remain = (math.floor(self.t + 1) - self.t) * self.bw[self.i]
            if size >= remain:
                self.i = (self.i + 1) % len(self.bw)
                self.t = math.floor(self.t + 1)
                size -= remain
            else:
                self.t += size / self.bw[self.i]
                size = 0
        return self.t - start


class HostEpisode:
    """Plain-python episode oracle with the reference's semantics."""

    def __init__(self, sizes, quals, gt, pred, acc, end_chunk, bw, weights):
        self.sizes, self.quals = sizes, quals
        self.gt, self.pred, self.acc = gt, pred, acc
        self.end_chunk = end_chunk
        self.net = HostNet(bw)
        self.weights = weights
        self.buf = 3.0
        self.chunk = 6  # startup_download + 1
        self.prev_q = None

    def step(self, versions):
        t = np.arange(64)
        sz = self.sizes[self.chunk, versions, t]
        q = self.quals[self.chunk, versions, t]
        chunk_size = float(np.sum(sz))
        dt = self.net.download(chunk_size)
        if dt > self.buf:
            reb = dt - self.buf
            self.buf = 1.0
        else:
            reb = 0.0
            self.buf = self.buf - dt + 1.0
        vp = self.gt[self.chunk]
        vq = float(np.sum(vp * q) / np.sum(vp))
        intra = float(np.sum(vp * np.abs(q - vq)) / np.sum(vp)) / 35.0
        vqn = vq / 35.0
        inter = abs(vqn - self.prev_q) if self.prev_q is not None else 0.0
        self.prev_q = vqn
        q1, q2, q3 = vqn, reb, intra + inter
        qoe = self.weights[0] * q1 - self.weights[1] * q2 - self.weights[2] * q3
        self.chunk += 1
        over = self.chunk > self.end_chunk
        return dict(chunk_size=chunk_size, dt=dt, reb=reb, qoe=qoe,
                    q1=q1, q2=q2, q3=q3, over=over)


@pytest.fixture(scope="module")
def tables():
    return build_sim_tables(
        CFG, "Jin2022", "4G",
        videos=[1, 9, 21], users=[1, 3], traces=[0, 31],
        qoe_weights=[[7, 1, 1], [1, 1, 7]])


@requires_data
def test_network_download_parity(tables):
    bw = np.asarray(tables.bw[0][: int(tables.bw_len[0])])
    oracle = HostNet(bw)
    net = init_net_state()
    rng = np.random.default_rng(0)
    fn = jax.jit(lambda n, s: simulate_download_bytes(tables.bw[0], tables.bw_len[0], n, s))
    for _ in range(200):
        size = float(rng.uniform(1e4, 8e6))
        want = oracle.download(size)
        net, got = fn(net, jnp.float32(size))
        assert float(got) == pytest.approx(want, rel=1e-4, abs=1e-4)
    assert int(net.idx) == oracle.i
    assert float(net.sec + net.frac) == pytest.approx(oracle.t, rel=1e-5)


@requires_data
def test_episode_parity(tables):
    """Whole-episode parity: QoE components, download math, termination."""
    rng = np.random.default_rng(1)
    samples = jnp.asarray(np.array([[0, 0, 0, 0], [2, 1, 1, 1]], np.int32))
    step = jax.jit(lambda s, a: step_env(tables, samples, s, a, 1, False))

    for si, (v, u, tr, qw) in enumerate([(0, 0, 0, 0), (2, 1, 1, 1)]):
        state = reset_env(tables, samples, jnp.int32(si), 1)
        oracle = HostEpisode(
            sizes=np.asarray(tables.sizes[v]), quals=np.asarray(tables.qualities[v]),
            gt=np.asarray(tables.gt[v, u]), pred=np.asarray(tables.pred[v, u]),
            acc=np.asarray(tables.vp_acc[v, u]),
            end_chunk=int(tables.end_chunk[v, u]),
            bw=np.asarray(tables.bw[tr][: int(tables.bw_len[tr])]),
            weights=np.asarray(tables.qoe_weights[qw]))

        from mansy_immersivevideostreaming_tpu.ops.allocation import (
            ACTION_TO_RATES)
        from _alloc_oracle import oracle_allocate  # shared helper

        done = False
        steps = 0
        while not done:
            action = int(rng.integers(0, 15))
            ri, ro = ACTION_TO_RATES[action]
            versions = oracle_allocate(int(ri), int(ro),
                                       np.asarray(oracle.pred[oracle.chunk]))
            want = oracle.step(versions)
            state, reward, over, log = step(state, jnp.int32(action))
            assert float(reward) == pytest.approx(want["qoe"], rel=2e-3, abs=2e-3)
            done = bool(over)
            assert done == want["over"]
            steps += 1
        assert steps == oracle.end_chunk - 6 + 1
        # log record sanity: emitted means are finite
        assert np.isfinite(float(log.qoe))


@requires_data
def test_observation_schema(tables):
    samples = jnp.asarray(generate_environment_samples(3, 2, 2, 2))
    state = reset_env(tables, samples, jnp.int32(0), 1)
    obs = observe_mansy(tables, state)
    assert set(obs.keys()) == {
        "throughput", "next_chunk_size", "next_chunk_quality", "pred_viewport",
        "rates_inside", "rates_outside", "viewport_acc", "buffer", "qoe_weight",
        "action_one_hot", "past_viewport_qualities", "past_quality_variances",
        "past_rebuffering"}
    assert obs["next_chunk_size"].shape == (5, 64)
    assert obs["qoe_weight"].shape == (3,)
    assert float(obs["buffer"][0]) == pytest.approx(3.0 / 5.0)
    np.testing.assert_allclose(np.asarray(obs["qoe_weight"]), [7 / 9, 1 / 9, 1 / 9],
                               rtol=1e-6)
    sobs = observe_simple(tables, state)
    assert set(sobs.keys()) == {"throughput", "chunk_sizes", "rebuffer",
                                "last_bitrates", "pred_viewport"}


@requires_data
def test_autoreset_advances_sample(tables):
    samples = jnp.asarray(np.array([[0, 0, 0, 0], [1, 1, 1, 1], [2, 0, 1, 0]], np.int32))
    step = jax.jit(lambda s, a: step_env(tables, samples, s, a, 1, True))
    state = reset_env(tables, samples, jnp.int32(0), 1)
    assert int(state.video) == 0
    done = False
    while not done:
        state, r, over, log = step(state, jnp.int32(10))
        done = bool(over)
    # After auto-reset the state must point at sample 1
    assert int(state.video) == 1 and int(state.user) == 1
    assert int(state.next_chunk) == 6
    assert float(state.buf) == pytest.approx(3.0)


def test_sample_generators_match_reference_shapes():
    s = generate_environment_samples(18, 45, 24, 4)
    # reference common.py:76: total_len = max(45, 18*4*ceil(45/72)) = 72
    assert s.shape == (72, 4)
    assert set(s[:, 0]) == set(range(18))
    assert set(s[:, 3]) == set(range(4))
    t = generate_environment_test_samples(3, 15, 8, 4)
    assert t.shape == (3 * 15 * 8 * 4, 4)
    # cartesian order matches nested loops video->user->trace->qoe
    assert tuple(t[0]) == (0, 0, 0, 0)
    assert tuple(t[1]) == (0, 0, 0, 1)
