"""Parity of the closed-form prefix download vs the sequential while-loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_data

import mansy_immersivevideostreaming_tpu as mansy
from mansy_immersivevideostreaming_tpu.data.network import load_network_tables
from mansy_immersivevideostreaming_tpu.sim.simulator import (
    NetState, build_prefix, init_net_state, simulate_download_bytes,
    simulate_download_prefix,
)

CFG = mansy.default_config()


def _compare_on_trace(bw, bw_len, prefix, sizes):
    loop_fn = jax.jit(lambda n, s: simulate_download_bytes(bw, bw_len, n, s))
    fast_fn = jax.jit(lambda n, s: simulate_download_prefix(bw, prefix, bw_len, n, s))
    n1 = init_net_state()
    n2 = init_net_state()
    for size in sizes:
        n1, dt1 = loop_fn(n1, jnp.float32(size))
        n2, dt2 = fast_fn(n2, jnp.float32(size))
        assert float(dt2) == pytest.approx(float(dt1), abs=2e-3), f"size={size}"
        assert int(n2.idx) == int(n1.idx)
        assert int(n2.sec) == int(n1.sec)
        assert float(n2.frac) == pytest.approx(float(n1.frac), abs=2e-3)


@requires_data
def test_prefix_matches_loop_on_real_traces():
    # trace 1 (bicycle_0002) contains zero-bandwidth outage seconds
    nt = load_network_tables(CFG, "4G", [0, 1, 31])
    prefix = build_prefix(nt.throughput, nt.length)
    rng = np.random.default_rng(0)
    for t in range(3):
        sizes = rng.uniform(1e4, 8e6, 120)
        _compare_on_trace(jnp.asarray(nt.throughput[t]),
                          jnp.asarray(nt.length[t]),
                          prefix[t], sizes)


def test_prefix_with_outages_and_wraps():
    # synthetic trace with zero seconds, small length -> frequent wraps
    bw = np.array([1e6, 0.0, 0.0, 5e5, 2e6, 0.0, 3e6, 1e5], np.float32)
    bwp = np.zeros((1, 8), np.float32)
    bwp[0] = bw
    lens = np.array([8], np.int32)
    prefix = build_prefix(bwp, lens)
    rng = np.random.default_rng(1)
    sizes = np.concatenate([
        rng.uniform(1e3, 2e7, 60),          # spans many wraps
        np.array([1e6 * 0.5, 1e6]),         # partial + exact-ish
    ])
    _compare_on_trace(jnp.asarray(bwp[0]), jnp.asarray(lens[0]),
                      prefix[0], sizes)


def test_prefix_exact_first_second_boundary():
    bw = np.full((1, 4), 1e6, np.float32)
    lens = np.array([4], np.int32)
    prefix = build_prefix(bw, lens)
    # size exactly equal to the remaining first-second bytes
    net = NetState(idx=jnp.int32(0), sec=jnp.int32(0), frac=jnp.float32(0.5))
    new, dt = simulate_download_prefix(jnp.asarray(bw[0]), prefix[0],
                                       jnp.asarray(lens[0]), net,
                                       jnp.float32(0.5e6))
    assert int(new.idx) == 1 and int(new.sec) == 1
    assert float(new.frac) == 0.0
    assert float(dt) == pytest.approx(0.5, abs=1e-6)
