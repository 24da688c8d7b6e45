"""Frequency-variant dataset loading (the reference ships 5Hz and 10Hz)."""

import numpy as np

from conftest import requires_data

import mansy_immersivevideostreaming_tpu as mansy
from mansy_immersivevideostreaming_tpu.data.viewport import (
    build_windowed_dataset, load_viewport_trace,
)

CFG = mansy.default_config()


@requires_data
def test_10hz_traces_load_and_window():
    t5 = load_viewport_trace(CFG, "Jin2022", 1, 1, frequency=5)
    t10 = load_viewport_trace(CFG, "Jin2022", 1, 1, frequency=10)
    # 10 Hz trace has roughly twice the samples of the 5 Hz one
    assert 1.8 < len(t10) / len(t5) < 2.2
    ds = build_windowed_dataset(CFG, "Jin2022", [1], [1], his_window=5,
                                fut_window=10, frequency=10)
    h, c, f, video, user, ts = ds.gather(np.arange(3))
    assert h.shape == (3, 5, 2) and f.shape == (3, 10, 2)
    assert (video == 1).all()
