"""Synthetic on-disk dataset tree in the reference's file formats.

Builds a miniature Jin2022-shaped tree (viewport npys, video manifests,
network pkls, prediction pkls) plus a matching Config, so the CLIs can run
end-to-end hermetically (VERDICT round-1 item 9).  File formats follow the
reference writers: ``hmdtrace.py:81-115`` (5 Hz npy), ``video.py:123-152``
(manifest JSON), ``network.py:32-41`` (trace pkl), ``predict.py:50-65``
(prediction pkl).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle

import numpy as np

from mansy_immersivevideostreaming_tpu.config import default_config

VIDEOS = [1, 2]
USERS = [1, 2, 3]
TRACES = [0, 1]
VIDEO_LEN_S = 10           # chunks 0..9
TRACE_HZ = 5


def build_synthetic_tree(base_dir: str, seed: int = 0):
    """Write the tree under ``base_dir`` and return a matching Config."""
    rng = np.random.default_rng(seed)
    ds_dir = os.path.join(base_dir, "datasets")
    vp_dir = os.path.join(ds_dir, "Jin2022", "viewports")
    mf_dir = os.path.join(ds_dir, "Jin2022", "video_manifests")
    net_dir = os.path.join(ds_dir, "network", "4G")
    os.makedirs(mf_dir, exist_ok=True)
    os.makedirs(net_dir, exist_ok=True)

    rates = [1, 5, 8, 16, 35]
    for v in VIDEOS:
        # --- viewport traces: [T, 3] (time, x, y) at 5 Hz ---
        for u in USERS:
            hz_dir = os.path.join(vp_dir, f"video{v}", f"{TRACE_HZ}Hz")
            os.makedirs(hz_dir, exist_ok=True)
            T = VIDEO_LEN_S * TRACE_HZ
            t = np.arange(T) / TRACE_HZ
            xy = (0.5 + 0.3 * np.sin(
                t[:, None] * (0.3 + 0.1 * u) + v + np.array([0.0, 1.0])))
            trace = np.column_stack([t, xy]).astype(np.float32)
            np.save(os.path.join(
                hz_dir, f"simple_{TRACE_HZ}Hz_user{u}.npy"), trace)

        # --- manifest JSON (reference video.py:123-152 schema) ---
        chunks = {}
        for c in range(VIDEO_LEN_S):
            size = [(np.full(64, r * 1e6 / 8 / 64) *
                     rng.uniform(0.5, 1.5, 64)).tolist() for r in rates]
            quality = [np.full(64, float(r)).tolist() for r in rates]
            chunks[str(c)] = {"size": size, "quality": quality}
        manifest = {"Video_Time": VIDEO_LEN_S, "Chunk_Count": VIDEO_LEN_S,
                    "Chunk_Time": 1, "Available_Bitrates": rates,
                    "Chunks": chunks}
        with open(os.path.join(mf_dir, f"video{v}.json"), "w") as f:
            json.dump(manifest, f)

        # --- prediction pkls (reference predict.py:50-65 schema) ---
        for u in USERS:
            pdir = os.path.join(vp_dir, "prediction", f"video{v}")
            os.makedirs(pdir, exist_ok=True)
            entries = []
            for c in range(3, VIDEO_LEN_S):
                gt = np.zeros(64, np.uint8)
                s = int(rng.integers(0, 56))
                gt[s: s + 8] = 1
                pred = np.roll(gt, int(rng.integers(-2, 3)))
                inter = float(np.sum(gt & pred))
                union = float(np.sum(gt | pred))
                entries.append((c, gt, pred, inter / union))
            with open(os.path.join(pdir, f"user{u}.pkl"), "wb") as f:
                pickle.dump(entries, f)

    # --- network traces: pkl list of (second, bytes) ---
    for tr in TRACES:
        data = [(s, float(rng.uniform(8e5, 4e6)))
                for s in range(1, 40)]
        with open(os.path.join(net_dir, f"t{tr}.pkl"), "wb") as f:
            pickle.dump(data, f)

    base = default_config(datasets_base_dir=ds_dir,
                          results_base_dir=os.path.join(base_dir, "results"),
                          models_base_dir=os.path.join(base_dir, "models"))
    return dataclasses.replace(
        base,
        video_info={"Jin2022": {v: (VIDEO_LEN_S, 2560, 1440) for v in VIDEOS}},
        video_num={"Jin2022": len(VIDEOS)},
        user_num={"Jin2022": len(USERS)},
        network_info={"4G": {tr: f"t{tr}.pkl" for tr in TRACES}},
        network_split={"4G": {"train": [0], "valid": [0], "test": [1]}},
        video_split={"Jin2022": {"train": [1], "valid": [1], "test": [2]}},
        user_split={"Jin2022": {"train": [1, 2], "valid": [1, 2], "test": [3]}},
        trim_head=5, trim_tail=5, sample_step=2,
    )
