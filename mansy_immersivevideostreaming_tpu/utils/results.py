"""Viewport-prediction results recorder.

Vectorized rebuild of the reference ``Results`` notebook
(reference ``viewport_prediction/utils/results.py:53-152``): per-sample,
per-horizon periodic MSE + tile-IoU accuracy/recall/precision/f1.  The
reference computes occupancy maps in a batch x horizon double Python loop
(``results.py:44-49``); here one jitted vmapped kernel call handles the whole
batch.  Output files keep the reference's exact CSV/log column layout,
including its ``.log`` quirk of printing the (always-None) ``prob`` field in
the ``accuracy`` slot and ``recall`` twice (``results.py:121-122``) so
downstream parsers see identical files.
"""

from __future__ import annotations

import functools
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from mansy_immersivevideostreaming_tpu.config import Config
from mansy_immersivevideostreaming_tpu.ops.geometry import (
    batched_tile_occupancy, periodic_mse, tile_metrics,
)
from mansy_immersivevideostreaming_tpu.utils.logging import ascii_table


@functools.partial(jax.jit, static_argnums=())
def _metrics_kernel(gt: jnp.ndarray, pred: jnp.ndarray):
    """gt/pred [B, F, 2] -> (mse, accuracy, recall, precision, f1), each [B, F]."""
    mse = periodic_mse(pred, gt)
    B, F, _ = gt.shape
    gt_maps = batched_tile_occupancy(gt.reshape(B * F, 2)).reshape(B, F, -1)
    pred_maps = batched_tile_occupancy(pred.reshape(B * F, 2)).reshape(B, F, -1)
    acc, rec, prec, f1 = tile_metrics(gt_maps.astype(jnp.int32),
                                      pred_maps.astype(jnp.int32))
    return mse, acc, rec, prec, f1


class Results:
    def __init__(self, model_name: str, fut_window: int, output_dir: str,
                 dataset_frequency: int, config: Config | None = None):
        self.model_name = model_name
        self.fut_window = fut_window
        self.output_dir = output_dir
        self.dataset_frequency = dataset_frequency
        self._rows: List[tuple] = []  # (video, user, timestamp, gt, pred, metrics)
        self.accuracy_per_horizon: List[List[float]] = [[] for _ in range(fut_window)]

    def record(self, prediction, ground_truth, video, user, timestamp) -> None:
        pred = jnp.asarray(prediction)
        gt = jnp.asarray(ground_truth)
        mse, acc, rec, prec, f1 = (np.asarray(m) for m in _metrics_kernel(gt, pred))
        pred_np, gt_np = np.asarray(pred), np.asarray(gt)
        video = np.asarray(video)
        user = np.asarray(user)
        timestamp = np.asarray(timestamp)
        for i in range(pred_np.shape[0]):
            self._rows.append((int(video[i]), int(user[i]), int(timestamp[i]),
                               gt_np[i], pred_np[i],
                               mse[i], acc[i], rec[i], prec[i], f1[i]))
            for t in range(self.fut_window):
                self.accuracy_per_horizon[t].append(float(acc[i, t]))

    def write(self, log: bool = True, label: str = "") -> None:
        os.makedirs(self.output_dir, exist_ok=True)
        csv_path = os.path.join(self.output_dir, label + "results.csv")
        with open(csv_path, "w", encoding="utf-8") as f:
            f.write("video,user,timestamp,time,gt_1,gt_2,pred_1,pred_2,"
                    "mse,accuracy,recall,precision,f1\n")
            for (video, user, ts, gt, pred, mse, acc, rec, prec, f1) in self._rows:
                for t in range(self.fut_window):
                    tt = round((t + 1) * (1 / self.dataset_frequency), 3)
                    f.write(f"{video},{user},{ts},{tt},{gt[t][0]},{gt[t][1]},"
                            f"{pred[t][0]},{pred[t][1]},{mse[t]},{acc[t]},"
                            f"{rec[t]},{prec[t]},{f1[t]}\n")
        print("Results saved at", csv_path)
        if log:
            log_path = os.path.join(self.output_dir, label + "results.log")
            with open(log_path, "w", encoding="utf-8") as f:
                for (video, user, ts, gt, pred, mse, acc, rec, prec, f1) in self._rows:
                    f.write(f"##### Video={video}, User={user}, Timestamp={ts} #####\n")
                    for t in range(self.fut_window):
                        tt = round((t + 1) * (1 / self.dataset_frequency), 3)
                        # preserved quirk: reference results.py:121-122 prints
                        # prob (None) as 'accuracy' and recall twice
                        f.write(f"time={tt}, gt={list(gt[t])}, pred={list(pred[t])}, "
                                f"mse={mse[t]}, accuracy=None, "
                                f"recall={rec[t]}, precision={prec[t]}, f1={f1[t]}\n")
            print("Log saved at", log_path)

        accuracy_csv_path = os.path.join(self.output_dir, label + "accuracy_result.csv")
        mean_acc = [float(np.mean(a)) * 100.0 for a in self.accuracy_per_horizon]
        with open(accuracy_csv_path, "w", encoding="utf-8") as f:
            f.write("timestamp,accuracy\n")
            for t in range(self.fut_window):
                tt = round((t + 1) * (1 / self.dataset_frequency), 3)
                f.write(f"{tt},{mean_acc[t]}\n")
        # cumulative means as in reference results.py:141-148
        cum = [sum(mean_acc[: i + 1]) / (i + 1) for i in range(self.fut_window)]
        print("Pretty Table...")
        print(ascii_table(
            [round((i + 1) * (1 / self.dataset_frequency), 3) for i in range(self.fut_window)],
            [[round(m, 5) for m in cum]]))

    def mean_accuracy(self) -> List[float]:
        return [float(np.mean(a)) for a in self.accuracy_per_horizon]

    def reset(self) -> None:
        self._rows.clear()
        self.accuracy_per_horizon = [[] for _ in range(self.fut_window)]
