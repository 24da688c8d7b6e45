"""Prediction-export CLI: the L1 -> L2 bridge artifact.

TPU-native equivalent of reference ``viewport_prediction/predict.py``: runs a
trained model over the merged (train+valid+test) split and writes per-
(video, user) chunk-level viewport pickles with schema
``[(chunk, gt_tilemap[64], pred_tilemap[64], IoU)]``
(reference ``predict.py:32-65``).  The per-sample/per-step host loop over
``find_tiles_covered_by_viewport`` becomes one vmapped occupancy+OR+IoU kernel
per batch.  Fixes the reference's ``config.tile_width`` AttributeError
(``predict.py:41-45``) by deriving tile sizes from the frame size.

Example::

    python -m mansy_immersivevideostreaming_tpu.cli.predict \
        --model mtio --dataset Jin2022 --bs 512 --model-path <ckpt>
"""

from __future__ import annotations

import argparse
import functools
import os
import time
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.data.prediction import write_prediction
from mansy_immersivevideostreaming_tpu.data.viewport import build_windowed_dataset
from mansy_immersivevideostreaming_tpu.models import vp_train
from mansy_immersivevideostreaming_tpu.models.mtio import ViewportTransformerMTIO
from mansy_immersivevideostreaming_tpu.models.regression import linear_regression_sample
from mansy_immersivevideostreaming_tpu.ops.geometry import batched_tile_occupancy
from mansy_immersivevideostreaming_tpu.utils.checkpoint import restore_checkpoint
from mansy_immersivevideostreaming_tpu.utils.prng import enable_compilation_cache, seed_everything


@functools.partial(jax.jit, static_argnums=(2,))
def chunk_maps(gt: jnp.ndarray, pred: jnp.ndarray, frequency: int):
    """[B, F, 2] trajectories -> per-chunk OR'd occupancy maps + IoU.

    Matches reference ``predict.py:36-46``: the first ``frequency`` future
    steps of each sample form one chunk; per-step tile maps are OR-combined.
    """
    B = gt.shape[0]
    g = batched_tile_occupancy(gt[:, :frequency].reshape(B * frequency, 2))
    p = batched_tile_occupancy(pred[:, :frequency].reshape(B * frequency, 2))
    g = jnp.any(g.reshape(B, frequency, -1), axis=1).astype(jnp.uint8)
    p = jnp.any(p.reshape(B, frequency, -1), axis=1).astype(jnp.uint8)
    inter = jnp.sum((g & p).astype(jnp.float32), axis=-1)
    union = jnp.sum((g | p).astype(jnp.float32), axis=-1)
    return g, p, inter / union


def run(args, config):
    # None -> config backfill (reference predict.py:148-153); kept in run()
    # so programmatic callers get the same semantics as main()
    args.trim_head = config.trim_head if args.trim_head is None else args.trim_head
    args.trim_tail = config.trim_tail if args.trim_tail is None else args.trim_tail
    args.dataset_frequency = (config.frequency if args.dataset_frequency is None
                              else args.dataset_frequency)
    args.sample_step = config.sample_step if args.sample_step is None else args.sample_step
    key = seed_everything(args.seed)
    results_dir = os.path.join(config.viewport_dir(args.dataset), "prediction")
    if args.output_dir:
        results_dir = args.output_dir
    os.makedirs(results_dir, exist_ok=True)

    videos, users = [], []
    for split in ("train", "valid", "test"):
        videos += config.video_split[args.dataset][split]
        users += config.user_split[args.dataset][split]
    videos, users = sorted(set(videos)), sorted(set(users))

    ds = build_windowed_dataset(config, args.dataset, videos, users,
                                args.his_window, args.fut_window,
                                args.trim_head, args.trim_tail,
                                args.sample_step, args.dataset_frequency)

    model = ViewportTransformerMTIO(
        in_channel=2, fut_window=args.fut_window, d_model=args.hidden_dim,
        dim_feedforward=args.hidden_dim, num_encoder_layers=args.block_num,
        num_decoder_layers=args.block_num)
    state = None
    if args.model != "regression":
        optimizer = vp_train.make_optimizer(1e-4)
        state = vp_train.create_train_state(model, key, args.his_window, optimizer)
        state = restore_checkpoint(args.model_path, state)
        print("Successfully loaded model from", args.model_path)

    print(f"Predict with model {args.model} on {args.dataset} - seed: {args.seed}")
    per_pair = defaultdict(list)
    n = len(ds)
    t0 = time.time()
    for s in range(0, n, args.bs):
        idx = np.arange(s, min(s + args.bs, n))
        h, c, f, video, user, ts = ds.gather(idx)
        if args.model == "regression":
            pred = linear_regression_sample(jnp.asarray(h), jnp.asarray(c),
                                            args.fut_window)
        else:
            pred = vp_train.sample_step(model, state, jnp.asarray(h), jnp.asarray(c))
        g, p, acc = chunk_maps(jnp.asarray(f), pred, args.dataset_frequency)
        g, p, acc = np.asarray(g), np.asarray(p), np.asarray(acc)
        for i in range(len(idx)):
            per_pair[(int(video[i]), int(user[i]))].append((g[i], p[i], float(acc[i])))
    print(f"Processed {n} samples in {time.time() - t0:.1f}s "
          f"({n / (time.time() - t0):,.0f} trajectories/s)")

    chunk_offset = args.trim_head // args.dataset_frequency
    for (video, user), entries in per_pair.items():
        out = [(i + chunk_offset, g, p, a) for i, (g, p, a) in enumerate(entries)]
        write_prediction(config, args.dataset, video, user, out,
                         out_dir=results_dir)
    print("Predictions saved under", results_dir)


def build_parser():
    parser = argparse.ArgumentParser(description="Export chunk-level viewport predictions.")
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--model", type=str, default="mtio")
    parser.add_argument("--hidden-dim", type=int, default=512)
    parser.add_argument("--block-num", type=int, default=2)
    parser.add_argument("--model-path", type=str)
    parser.add_argument("--compile", action="store_true")
    parser.add_argument("--dataset", type=str, default="Jin2022")
    parser.add_argument("--his-window", type=int, default=5)
    parser.add_argument("--fut-window", type=int, default=15)
    parser.add_argument("--trim-head", type=int)
    parser.add_argument("--trim-tail", type=int)
    parser.add_argument("--dataset-frequency", type=int)
    parser.add_argument("--sample-step", type=int)
    parser.add_argument("--bs", type=int, default=512)
    parser.add_argument("--seed", type=int, default=5)
    parser.add_argument("--output-dir", type=str, default=None,
                        help="override output dir (default: dataset tree)")
    parser.add_argument("--config-yml", type=str, default=None)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    config = load_config(args.config_yml)
    args.trim_head = config.trim_head if args.trim_head is None else args.trim_head
    args.trim_tail = config.trim_tail if args.trim_tail is None else args.trim_tail
    args.dataset_frequency = (config.frequency if args.dataset_frequency is None
                              else args.dataset_frequency)
    args.sample_step = config.sample_step if args.sample_step is None else args.sample_step
    if args.device:
        jax.config.update("jax_platforms", args.device)
    enable_compilation_cache()
    print(args)
    run(args, config)


if __name__ == "__main__":
    main()
