"""Config loader vs the actual reference config.yml; results recorder format."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import mansy_immersivevideostreaming_tpu as mansy
from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.utils.results import Results

REF_YML = "/root/reference/config.yml"


@pytest.mark.skipif(not os.path.exists(REF_YML), reason="reference yml absent")
def test_load_reference_yaml_matches_defaults():
    cfg = load_config(REF_YML)
    d = mansy.default_config()
    assert cfg.video_rates == tuple(d.video_rates)
    assert cfg.tile_total_num == 64
    assert cfg.video_info["Jin2022"][9][0] == 58
    assert cfg.video_info["Jin2022"][10] == (60, 1920, 1080)
    assert list(cfg.video_split["Jin2022"]["train"]) == list(d.video_split["Jin2022"]["train"])
    assert list(cfg.user_split["Jin2022"]["valid"]) == list(d.user_split["Jin2022"]["train"])
    assert cfg.qoe_split["test"] == [[5, 1, 3], [2, 4, 3], [1, 3, 5], [4, 4, 1]]
    assert cfg.network_info["4G"][31] == "report_train_0003.pkl"
    assert cfg.startup_download == 5 and cfg.past_k == 8 and cfg.action_space == 15
    # derived tile sizes (the reference's missing attrs)
    assert cfg.tile_width == 320 and cfg.tile_height == 180


def test_results_recorder_files(tmp_path):
    r = Results("mtio", fut_window=3, output_dir=str(tmp_path),
                dataset_frequency=5)
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.random((4, 3, 2), np.float32))
    gt = jnp.asarray(rng.random((4, 3, 2), np.float32))
    r.record(pred, gt, np.array([1, 1, 2, 2]), np.array([3, 3, 4, 4]),
             np.array([15, 20, 15, 20]))
    r.write(log=True, label="x_")
    csv = (tmp_path / "x_results.csv").read_text().splitlines()
    assert csv[0] == ("video,user,timestamp,time,gt_1,gt_2,pred_1,pred_2,"
                      "mse,accuracy,recall,precision,f1")
    assert len(csv) == 1 + 4 * 3
    first = csv[1].split(",")
    assert first[0] == "1" and first[1] == "3" and first[2] == "15"
    assert first[3] == "0.2"  # (t+1)/freq
    acc_csv = (tmp_path / "x_accuracy_result.csv").read_text().splitlines()
    assert acc_csv[0] == "timestamp,accuracy"
    assert len(acc_csv) == 4
    # log quirk: accuracy printed as None (reference results.py:121)
    log = (tmp_path / "x_results.log").read_text()
    assert "accuracy=None" in log
    means = r.mean_accuracy()
    assert len(means) == 3 and all(0 <= m <= 1 for m in means)
    r.reset()
    assert len(r._rows) == 0
