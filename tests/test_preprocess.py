"""Golden tests for L0 preprocessing against the reference's own shipped
artifacts, plus quaternion-math checks."""

import os

import numpy as np
import pytest

from conftest import REFERENCE_DATA, requires_data

import mansy_immersivevideostreaming_tpu as mansy
from mansy_immersivevideostreaming_tpu.cli.preprocess_hmdtrace import (
    simplify_hmd_trace,
)
from mansy_immersivevideostreaming_tpu.ops import orientation

CFG = mansy.default_config()


@requires_data
def test_simplify_matches_shipped_output(tmp_path):
    """Run the 5 Hz resampler on the shipped raw user CSVs and compare with
    the reference pipeline's own shipped simple_5Hz_*.npy output."""
    # copy two users of video1 into a temp dataset tree
    src = os.path.join(REFERENCE_DATA, "Jin2022", "viewports", "video1")
    vdir = tmp_path / "Jin2022" / "viewports" / "video1"
    vdir.mkdir(parents=True)
    for u in (1, 2, 3):
        data = np.loadtxt(os.path.join(src, f"user{u}.csv"), delimiter=",",
                          dtype=np.float32)
        np.savetxt(vdir / f"user{u}.csv", data, fmt="%.6f", delimiter=",")

    import dataclasses
    cfg = mansy.default_config(datasets_base_dir=str(tmp_path))
    cfg = dataclasses.replace(cfg, video_num={"Jin2022": 1},
                              user_num={"Jin2022": 3},
                              viewport_datasets_dir={
                                  "Jin2022": str(tmp_path / "Jin2022" / "viewports")})
    simplify_hmd_trace("Jin2022", cfg, frequency=5)

    for u in (1, 2, 3):
        got = np.load(vdir / "5Hz" / f"simple_5Hz_user{u}.npy")
        want = np.load(os.path.join(src, "5Hz", f"simple_5Hz_user{u}.npy"))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_quat_rotate_matches_rotation_matrix():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        v = rng.normal(size=3)
        got = orientation.quat_rotate(q, v)
        np.testing.assert_allclose(got, R @ v, atol=1e-10)


def test_vector_to_ang_roundtrip_poles():
    # looking straight at [0,0,-1] (behind): theta = +-180, phi = 0
    theta, phi = orientation.vector_to_ang(np.array([0.0, 0.0, 1.0]))
    assert abs(phi) < 1e-9
    x, y = orientation.ang_to_geoxy(theta, phi, 360, 720)
    assert x == pytest.approx(180.0)  # vertical center
    # up vector -> phi 90
    _, phi_up = orientation.vector_to_ang(np.array([0.0, 1.0, 0.0]))
    assert phi_up == pytest.approx(90.0)


def test_vector_to_ang_batched_consistent():
    rng = np.random.default_rng(1)
    vs = rng.normal(size=(16, 3))
    t_b, p_b = orientation.vector_to_ang(vs)
    for i in range(16):
        t_i, p_i = orientation.vector_to_ang(vs[i])
        assert float(t_b[i]) == pytest.approx(float(t_i), abs=1e-9)
        assert float(p_b[i]) == pytest.approx(float(p_i), abs=1e-9)


def test_pixel_to_ang_helpers_match_scalar_oracle():
    """pixel_to_ang/geoy_to_phi/adjust_pixel_* vs direct scalar ports of
    reference head_orientation_lib.py:33-111 (dead code there, ported for
    API completeness)."""
    H, W = 1440.0, 2560.0

    def oracle_geoy_to_phi(geoy, h):
        d = (h / 2 - geoy) / (h / 2)
        s = -1 if d < 0 else 1
        return s * np.arcsin(abs(d)) / np.pi * 180

    def oracle_pixel_to_ang(x, y, gh, gw):
        phi = oracle_geoy_to_phi(x, gh)
        theta = -(y / gw) * 360
        if theta < -180:
            theta = 360 + theta
        return theta, phi

    rng = np.random.default_rng(11)
    xs = rng.uniform(0, H, 64)
    ys = rng.uniform(0, W, 64)
    theta, phi = orientation.pixel_to_ang(xs, ys, H, W)
    for i in range(64):
        t0, p0 = oracle_pixel_to_ang(xs[i], ys[i], H, W)
        np.testing.assert_allclose([theta[i], phi[i]], [t0, p0], rtol=1e-12)

    # adjust helpers: flip with wrap, exactly the reference's branches
    hi, wi = orientation.adjust_pixel_dataset1(np.array([0.0, H, 10.0]),
                                               np.array([1.0, 2.0, 3.0]), H, W)
    np.testing.assert_allclose(hi, [H, 0.0, H - 10.0])
    np.testing.assert_allclose(wi, [1.0, 2.0, 3.0])
    hi, wi = orientation.adjust_pixel_dataset2(np.array([1.0, 2.0]),
                                               np.array([0.0, W + 5.0]), H, W)
    np.testing.assert_allclose(wi, [W, W - 5.0 + W - W])
    pairs = list(orientation.adjust_pixellist_dataset(
        1, [(10.0, 20.0), (H, 30.0)], H, W))
    np.testing.assert_allclose(pairs, [(H - 10.0, 20.0), (0.0, 30.0)])

    # pixel_to_ang inverts ang_to_geoxy on the interior of the domain
    thetas = rng.uniform(-179.0, 179.0, 32)
    phis = rng.uniform(-89.0, 89.0, 32)
    gx, gy = orientation.ang_to_geoxy(thetas, phis, H, W)
    t2, p2 = orientation.pixel_to_ang(gx, gy, H, W)
    np.testing.assert_allclose(p2, phis, atol=1e-9)
    # theta wraps modulo 360
    np.testing.assert_allclose(np.mod(t2 - thetas, 360.0),
                               np.where(np.mod(t2 - thetas, 360.0) > 180,
                                        360.0, 0.0), atol=1e-9)
