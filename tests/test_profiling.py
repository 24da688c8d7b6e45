"""utils/profiling: timed() must block on the watched work; profile_to must
produce a TensorBoard-readable capture (SURVEY §5 replacement for the
reference's wall-clock prints, ``dataset_preprocess/video.py:126-154``)."""

import glob
import os

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.utils.profiling import (
    profile_to, timed, trace,
)


def test_timed_blocks_on_watched_computation(capsys):
    x = jnp.ones((256, 256))
    with timed("matmul") as t:
        out = t.watch(x @ x)
    assert t.seconds is not None and t.seconds >= 0
    assert float(out[0, 0]) == 256.0
    assert "[matmul]" in capsys.readouterr().out


def test_timed_without_watch_still_reports(capsys):
    with timed("empty"):
        pass
    assert "[empty]" in capsys.readouterr().out


def test_profile_to_writes_capture(tmp_path):
    target = str(tmp_path / "prof")
    with profile_to(target):
        with trace("annotated_block"):
            jnp.ones((64, 64)).sum().block_until_ready()
    # jax writes plugins/profile/<ts>/*.xplane.pb under the trace dir
    captures = glob.glob(os.path.join(target, "**", "*.xplane.pb"),
                         recursive=True)
    assert captures, f"no profiler capture written under {target}"
