"""Round-trip test for the reference demo-pkl loader.

Synthesizes a pickle byte-stream identical in structure to what the
reference's ``run_expert.py:35-39`` produces (tianshou 0.4.8 ``ReplayBuffer``
objects holding ``Batch`` metadata) by registering fake ``tianshou.*``
modules whose classes pickle to the same GLOBAL records real tianshou
classes would, then checks :func:`load_demonstrations` recovers the obs/act
arrays in this framework's native shapes.
"""

import pickle
import sys
import types

import numpy as np
import pytest

from mansy_immersivevideostreaming_tpu.data.tianshou_compat import (
    load_demonstrations,
)

T = 4  # steps in the tiny demo episode


def _fake_tianshou_modules():
    """Install fake tianshou modules so pickling writes tianshou GLOBALs."""
    batch_mod = types.ModuleType("tianshou.data.batch")
    buffer_mod = types.ModuleType("tianshou.data.buffer.base")

    class Batch:
        # mirrors tianshou Batch pickling: state is a plain (nested) dict
        def __init__(self, **kw):
            self._store = kw

        def __getstate__(self):
            out = {}
            for k, v in self._store.items():
                out[k] = v.__getstate__() if isinstance(v, Batch) else v
            return out

    class ReplayBuffer:
        # mirrors tianshou ReplayBuffer pickling: state is __dict__
        def __init__(self, meta, size):
            self.maxsize = size
            self.stack_num = 1
            self._meta = meta
            self._index = 0
            self._size = size

    Batch.__module__ = "tianshou.data.batch"
    Batch.__qualname__ = "Batch"
    ReplayBuffer.__module__ = "tianshou.data.buffer.base"
    ReplayBuffer.__qualname__ = "ReplayBuffer"
    batch_mod.Batch = Batch
    buffer_mod.ReplayBuffer = ReplayBuffer

    mods = {
        "tianshou": types.ModuleType("tianshou"),
        "tianshou.data": types.ModuleType("tianshou.data"),
        "tianshou.data.batch": batch_mod,
        "tianshou.data.buffer": types.ModuleType("tianshou.data.buffer"),
        "tianshou.data.buffer.base": buffer_mod,
    }
    return mods, Batch, ReplayBuffer


def _reference_obs(rng):
    """Per-step obs shaped as the reference env stores them
    (``mansy_env.py:136-150``: histories are [1, past_k] rows)."""
    return {
        "throughput": rng.random((T, 1, 8), dtype=np.float32),
        "next_chunk_size": rng.random((T, 5, 64), dtype=np.float32),
        "next_chunk_quality": rng.random((T, 5, 64), dtype=np.float32),
        "pred_viewport": rng.random((T, 1, 64), dtype=np.float32),
        "rates_inside": rng.random((T, 1, 8), dtype=np.float32),
        "rates_outside": rng.random((T, 1, 8), dtype=np.float32),
        "viewport_acc": rng.random((T, 1, 8), dtype=np.float32),
        "buffer": rng.random((T,), dtype=np.float32),
        "qoe_weight": rng.random((T, 3), dtype=np.float32),
        "action_one_hot": rng.random((T, 15), dtype=np.float32),
        "past_viewport_qualities": rng.random((T, 1, 8), dtype=np.float32),
        "past_quality_variances": rng.random((T, 1, 8), dtype=np.float32),
        "past_rebuffering": rng.random((T, 1, 8), dtype=np.float32),
    }


@pytest.fixture
def reference_pickle(tmp_path):
    mods, Batch, ReplayBuffer = _fake_tianshou_modules()
    rng = np.random.default_rng(0)
    obs = _reference_obs(rng)
    act = rng.integers(0, 15, size=T).astype(np.int64)
    meta = Batch(obs=Batch(**obs), act=act,
                 rew=np.zeros(T, np.float32),
                 done=np.eye(1, T, T - 1, dtype=bool)[0],
                 obs_next=np.arange(1, T + 1), info=Batch())
    demos = {(1, 2, 3, (7, 1, 1)): ReplayBuffer(meta, T)}
    path = tmp_path / "train_demonstrations.pkl"
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        with open(path, "wb") as f:
            pickle.dump(demos, f)
    finally:
        for k, v in saved.items():
            if v is None:
                del sys.modules[k]
            else:
                sys.modules[k] = v
    assert b"tianshou" in path.read_bytes()
    return path, obs, act


def test_loads_reference_format_without_tianshou(reference_pickle):
    path, obs, act = reference_pickle
    assert "tianshou" not in sys.modules  # the point: no tianshou needed
    demos = load_demonstrations(str(path))
    assert list(demos.keys()) == [(1, 2, 3, (7, 1, 1))]
    d = demos[(1, 2, 3, (7, 1, 1))]
    np.testing.assert_array_equal(d["act"], act.astype(np.int32))
    # reference [T,1,8] rows land as this framework's flat [T,8]
    np.testing.assert_allclose(d["obs"]["throughput"], obs["throughput"][:, 0])
    np.testing.assert_allclose(d["obs"]["buffer"], obs["buffer"][:, None])
    np.testing.assert_allclose(d["obs"]["next_chunk_size"],
                               obs["next_chunk_size"])
    assert set(d["obs"]) == {
        "throughput", "next_chunk_size", "next_chunk_quality", "pred_viewport",
        "rates_inside", "rates_outside", "viewport_acc", "buffer",
        "qoe_weight", "action_one_hot", "past_viewport_qualities",
        "past_quality_variances", "past_rebuffering"}


def test_refuses_dangerous_globals(tmp_path):
    """The demo files are untrusted upstream content: any global outside the
    numpy/builtin-container allowlist must raise instead of executing."""

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    path = tmp_path / "evil.pkl"
    with open(path, "wb") as f:
        pickle.dump({"k": Evil()}, f)
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_demonstrations(str(path))


def test_native_format_passthrough(tmp_path):
    rng = np.random.default_rng(1)
    native = {(5, 6, 7, (1, 1, 7)): {
        "obs": {"throughput": rng.random((T, 8), dtype=np.float32)},
        "act": rng.integers(0, 15, size=T).astype(np.int32)}}
    path = tmp_path / "native.pkl"
    with open(path, "wb") as f:
        pickle.dump(native, f)
    demos = load_demonstrations(str(path))
    np.testing.assert_array_equal(
        demos[(5, 6, 7, (1, 1, 7))]["act"], native[(5, 6, 7, (1, 1, 7))]["act"])
