"""Golden tests for pyramid allocation + action codec vs an independent BFS oracle."""

from collections import deque

import numpy as np

from mansy_immersivevideostreaming_tpu.ops import allocation as A

RATES = (1, 5, 8, 16, 35)


def oracle_bfs_scales(vp8x8):
    h, w = vp8x8.shape
    scales = np.zeros((h, w), np.int32)
    seen = vp8x8.astype(bool).copy()
    q = deque([t for t in zip(*np.where(vp8x8 == 1))])
    while q:
        cy, cx = q.popleft()
        for dy, dx in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, -1), (1, 1), (-1, 1)]:
            ny, nx = (cy + dy) % h, (cx + dx) % w
            if not seen[ny, nx]:
                scales[ny, nx] = scales[cy, cx] + 1
                seen[ny, nx] = True
                q.append((ny, nx))
    return scales


def oracle_closest(rate):
    best, gap = 0, abs(RATES[0] - rate)
    for i, r in enumerate(RATES):
        g = abs(r - rate)
        if g < gap:
            best, gap = i, g
    return best


def oracle_allocate(rate_in, rate_out, vp):
    vp8 = vp.reshape(8, 8)
    scales = oracle_bfs_scales(vp8)
    versions = np.zeros((8, 8), np.int32)
    versions[scales == 0] = rate_in
    for s in range(1, scales.max() + 1):
        versions[scales == s] = oracle_closest(RATES[rate_out] // s)
    return versions.reshape(-1)


def random_viewport(rng):
    vp = np.zeros((8, 8), np.uint8)
    cy, cx = rng.integers(0, 8, 2)
    hh, ww = rng.integers(1, 4, 2)
    for dy in range(-hh, hh + 1):
        for dx in range(-ww, ww + 1):
            vp[(cy + dy) % 8, (cx + dx) % 8] = 1
    return vp.reshape(-1)


import jax

_scales_batch = jax.jit(jax.vmap(A.viewport_scales))
_alloc_batch = jax.jit(lambda a, v: A.allocate_for_actions(a, v, RATES))


def test_scales_match_bfs():
    rng = np.random.default_rng(0)
    vps = np.stack([random_viewport(rng) for _ in range(50)])
    got = np.asarray(_scales_batch(vps))
    for i in range(50):
        want = oracle_bfs_scales(vps[i].reshape(8, 8)).reshape(-1)
        np.testing.assert_array_equal(got[i], want)


def test_scales_empty_viewport_all_zero():
    vp = np.zeros(64, np.uint8)
    np.testing.assert_array_equal(np.asarray(A.viewport_scales(vp)), np.zeros(64, np.int32))


def test_allocate_matches_oracle():
    rng = np.random.default_rng(1)
    vps = np.stack([random_viewport(rng) for _ in range(30)])
    # all 15 actions for each viewport
    actions = np.tile(np.arange(15, dtype=np.int32), 30)
    vps_rep = np.repeat(vps, 15, axis=0)
    got = np.asarray(_alloc_batch(actions, vps_rep))
    for i in range(len(actions)):
        ri, ro = A.ACTION_TO_RATES[actions[i]]
        want = oracle_allocate(int(ri), int(ro), vps_rep[i])
        np.testing.assert_array_equal(got[i], want, err_msg=f"a={actions[i]}")


def test_action_codec_roundtrip():
    for a in range(15):
        ri, ro = A.action_to_rates(np.int32(a))
        assert int(A.rates_to_action(ri, ro)) == a
    # reference table spot checks (common.py:104-118)
    assert tuple(A.ACTION_TO_RATES[0]) == (1, 0)
    assert tuple(A.ACTION_TO_RATES[10]) == (0, 0)
    assert tuple(A.ACTION_TO_RATES[14]) == (4, 4)


def test_batched_allocation():
    rng = np.random.default_rng(2)
    vps = np.stack([random_viewport(rng) for _ in range(16)])
    actions = rng.integers(0, 15, 16).astype(np.int32)
    got = np.asarray(_alloc_batch(actions, vps))
    for i in range(16):
        ri, ro = A.ACTION_TO_RATES[actions[i]]
        want = oracle_allocate(int(ri), int(ro), vps[i])
        np.testing.assert_array_equal(got[i], want)
