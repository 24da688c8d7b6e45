"""Golden tests for the geometry kernels against independent host oracles."""

import numpy as np
import pytest

from mansy_immersivevideostreaming_tpu.ops import geometry as G

W, H = 2560, 1440
TW, TH = 320, 180


def oracle_tile_of_point(p, ts):
    # boundary pixels belong to the lower tile (reference common.py:37-43)
    t = p // ts
    if p > 0 and p % ts == 0:
        t -= 1
    return t


def oracle_occupancy(x, y, fov_w=600, fov_h=300):
    """Straightforward host oracle: walk every pixel-interval decomposition."""
    vp = np.zeros((8, 8), np.uint8)

    def axis_intervals(lo, hi, size):
        if lo >= 0 and hi <= size:
            return [(lo, hi)]
        if lo < 0:
            return [(0, hi), (lo % size, size)]
        return [(0, hi % size), (lo, size)]

    xs = axis_intervals(x - fov_w // 2, x + fov_w // 2, W)
    ys = axis_intervals(y - fov_h // 2, y + fov_h // 2, H)
    for (x1, x2) in xs:
        for (y1, y2) in ys:
            tx1, tx2 = oracle_tile_of_point(x1, TW), oracle_tile_of_point(x2, TW)
            ty1, ty2 = oracle_tile_of_point(y1, TH), oracle_tile_of_point(y2, TH)
            vp[ty1:ty2 + 1, tx1:tx2 + 1] = 1
    return vp


import jax

_batched_xy = jax.jit(jax.vmap(lambda x, y: G.tile_occupancy(x, y)))


def _check_points(xs, ys):
    got = np.asarray(_batched_xy(np.asarray(xs, np.int32), np.asarray(ys, np.int32)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        want = oracle_occupancy(int(x), int(y))
        np.testing.assert_array_equal(got[i], want, err_msg=f"x={x} y={y}")


def test_occupancy_exhaustive_grid():
    rng = np.random.default_rng(0)
    xs = np.concatenate([rng.integers(0, W + 1, 200),
                         np.array([0, 1, 299, 300, 301, 320, 640, W - 300, W - 1, W])])
    ys = np.concatenate([rng.integers(0, H + 1, 200),
                         np.array([0, 1, 149, 150, 151, 180, 360, H - 150, H - 1, H])])
    gx, gy = np.meshgrid(xs[:60], ys[:20])
    _check_points(gx.ravel(), gy.ravel())


def test_occupancy_boundaries_dense_x():
    # dense sweep over x at a few y values
    xs = np.arange(0, W + 1, 7)
    for y in (0, 149, 150, 720, H):
        _check_points(xs, np.full_like(xs, y))


def test_periodic_mse():
    a = np.array([[0.02, 0.98]], np.float32)
    b = np.array([[0.97, 0.03]], np.float32)
    # wrap distance: |0.02+1-0.97|=0.05 ; |0.98-1-0.03|=0.05
    got = float(G.periodic_mse(a, b)[0])
    assert got == pytest.approx((0.05 ** 2 + 0.05 ** 2) / 2, abs=1e-6)


def test_wrap_position_matches_torch_semantics():
    vals = np.array([-0.25, -1.3, 0.5, 1.75, 2.5, 0.0, 1.0], np.float32)
    got = np.asarray(G.wrap_position(vals))
    # torch: v<0 -> v - int(v) + 1 ; v>1 -> v - int(v)
    want = []
    for v in vals:
        if v < 0:
            want.append(v - int(v) + 1)
        elif v > 1:
            want.append(v - int(v))
        else:
            want.append(v)
    np.testing.assert_allclose(got, np.array(want, np.float32), atol=1e-6)


def test_iou_and_metrics():
    gt = np.zeros(64, np.uint8)
    pred = np.zeros(64, np.uint8)
    gt[:8] = 1
    pred[4:12] = 1
    acc = float(G.iou_accuracy(gt, pred))
    assert acc == pytest.approx(4 / 12)
    a, r, p, f1 = G.tile_metrics(gt, pred)
    assert float(r) == pytest.approx(0.5)
    assert float(p) == pytest.approx(0.5)
    assert float(f1) == pytest.approx(0.5)
    # disjoint maps: tp=0 with fp>0, fn>0 -> recall+precision==0 -> f1=0
    # (reference results.py:27-28 guard)
    disj = np.zeros(64, np.uint8)
    disj[32:40] = 1
    a2, r2, p2, f2 = G.tile_metrics(gt, disj)
    assert float(r2) == 0.0 and float(p2) == 0.0 and float(f2) == 0.0


def test_batched_occupancy_matches_scalar():
    rng = np.random.default_rng(1)
    pos = rng.random((32, 2)).astype(np.float32)
    batch = np.asarray(G.batched_tile_occupancy(pos))
    for i in range(32):
        single = np.asarray(G.tile_occupancy_from_normalized(pos[i]))
        np.testing.assert_array_equal(batch[i], single)
