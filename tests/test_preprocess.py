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
