"""Viewport-prediction training/testing CLI.

TPU-native equivalent of reference ``viewport_prediction/run_models.py``:
same flags, directory layout, file prefixes, and outputs; the torch training
loop is replaced by jitted JAX steps over gathered batches.

Example (mirrors reference ``run_models.py:196``)::

    python -m mansy_immersivevideostreaming_tpu.cli.run_models \
        --model mtio --train --test --train-dataset Jin2022 \
        --test-dataset Jin2022 --his-window 5 --fut-window 15 --bs 512 \
        --seed 5 --hidden-dim 512 --block-num 2 --lr 1e-4 --epochs 200
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.data.viewport import create_datasets
from mansy_immersivevideostreaming_tpu.models.mtio import ViewportTransformerMTIO
from mansy_immersivevideostreaming_tpu.models.regression import linear_regression_sample
from mansy_immersivevideostreaming_tpu.models import vp_train
from mansy_immersivevideostreaming_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint,
)
from mansy_immersivevideostreaming_tpu.utils.logging import ConsoleLogger
from mansy_immersivevideostreaming_tpu.utils.prng import enable_compilation_cache, seed_everything
from mansy_immersivevideostreaming_tpu.utils.results import Results


def maybe_mesh(args):
    """SPMD data parallelism: replicate params, shard batches over 'data'."""
    if not getattr(args, "data_parallel", False) or jax.device_count() < 2:
        return None
    from mansy_immersivevideostreaming_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    print(f"Data-parallel over {jax.device_count()} devices")
    return mesh


def batches(dataset, batch_size, shuffle, rng=None, drop_remainder=False):
    n = len(dataset)
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    stop = n - (n % batch_size) if drop_remainder else n
    for s in range(0, stop, batch_size):
        yield dataset.gather(idx[s: s + batch_size])


def train(args, config, model, optimizer, state, models_dir, file_prefix):
    checkpoint_path = os.path.join(models_dir, file_prefix + "_checkpoint.ckpt")
    best_model_path = os.path.join(models_dir, file_prefix + "_best_model.ckpt")

    if args.resume:
        assert args.resume_path is not None
        state = restore_checkpoint(args.resume_path, state)
        print("Resume model for training from:", args.resume_path)

    sets = create_datasets(config, args.train_dataset, args.his_window,
                           args.fut_window, include=("train", "valid"),
                           trim_head=args.trim_head, trim_tail=args.trim_tail,
                           step=args.sample_step, frequency=args.dataset_frequency)
    ds_train, ds_valid = sets["train"], sets["valid"]
    print(f"Training {args.model} on {args.train_dataset} - bs: {args.bs} "
          f"- lr: {args.lr} - seed: {args.seed} - samples: {len(ds_train)}")

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    mesh = maybe_mesh(args)
    if mesh is not None:
        from mansy_immersivevideostreaming_tpu.parallel.mesh import replicate
        state = jax.device_put(state, replicate(mesh))
    device_data = None
    if mesh is None:
        # single-device: stage the whole split in HBM once and run each
        # epoch as one on-device scan (vp_train.train_epoch)
        h, c, f, *_ = ds_train.gather(np.arange(len(ds_train)))
        device_data = {"history": jnp.asarray(h), "current": jnp.asarray(c),
                       "future": jnp.asarray(f)}
    best_valid_mse, best_epoch = float("inf"), 0
    for epoch in range(args.epochs):
        print(f"Epoch {epoch + 1}/{args.epochs}\n-------------------------------")
        t0 = time.time()
        nsamples = 0
        if device_data is not None:
            perm = rng.permutation(len(ds_train))
            state, losses = vp_train.train_epoch(
                model, optimizer, state, device_data, args.bs,
                jnp.asarray(perm), key)
            losses = np.asarray(losses)
            nsamples = losses.shape[0] * args.bs
        else:
            losses = []
            for h, c, f, *_ in batches(ds_train, args.bs, True, rng,
                                       drop_remainder=True):
                batch = {"history": jnp.asarray(h), "current": jnp.asarray(c),
                         "future": jnp.asarray(f)}
                from mansy_immersivevideostreaming_tpu.parallel.mesh import shard_batch
                batch = shard_batch(mesh, batch)
                state, loss = vp_train.train_step(model, optimizer, state,
                                                  batch, key)
                losses.append(loss)
                nsamples += h.shape[0]
        mean_loss = float(np.mean([float(l) for l in losses]))
        dt = time.time() - t0
        print(f"Train: mean train loss: {mean_loss:>9f} "
              f"({nsamples / dt:,.0f} samples/s)")
        if epoch % args.epochs_per_valid == 0:
            mses = []
            for h, c, f, *_ in batches(ds_valid, args.bs, False):
                batch = {"history": jnp.asarray(h), "current": jnp.asarray(c),
                         "future": jnp.asarray(f)}
                mses.append(float(vp_train.valid_step(model, state, batch)))
            mse = float(np.mean(mses))
            print(f"Valid: mean square error: {mse:>9f}")
            save_checkpoint(checkpoint_path, state)
            print("Checkpoint saved at", checkpoint_path)
            if best_valid_mse > mse:
                best_valid_mse = mse
                best_epoch = epoch + 1
                save_checkpoint(best_model_path, state)
            print(f"Best model (epoch {best_epoch}, loss {best_valid_mse}) "
                  f"saved at", best_model_path)
    return state


def test(args, config, model, optimizer, state, models_dir, results_dir, file_prefix):
    best_model_path = os.path.join(models_dir, file_prefix + "_best_model.ckpt")
    if args.model != "regression":
        state = restore_checkpoint(best_model_path, state)
        print("Load model from", best_model_path)

    sets = create_datasets(config, args.test_dataset, args.his_window,
                           args.fut_window, include=("test_seen", "test_unseen"),
                           trim_head=args.trim_head, trim_tail=args.trim_tail,
                           step=args.sample_step, frequency=args.dataset_frequency)

    def sample_fn(h, c):
        if args.model == "regression":
            return linear_regression_sample(jnp.asarray(h), jnp.asarray(c),
                                            args.fut_window)
        return vp_train.sample_step(model, state, jnp.asarray(h), jnp.asarray(c))

    notebook = Results(args.model, fut_window=args.fut_window,
                       dataset_frequency=args.dataset_frequency,
                       output_dir=results_dir, config=config)
    print(f"Testing {args.model} on {args.test_dataset} - seed: {args.seed}")
    for split, label in (("test_seen", "_seen_"), ("test_unseen", "_unseen_")):
        print(f"On {'seen' if 'un' not in label else 'unseen'} viewing patterns.")
        t0 = time.time()
        n = 0
        for h, c, f, video, user, ts in batches(sets[split], args.bs, False):
            pred = sample_fn(h, c)
            notebook.record(pred, f, video, user, ts)
            n += h.shape[0]
        print(f"({n / (time.time() - t0):,.0f} trajectories/s)")
        notebook.write(log=True, label=file_prefix + label)
        notebook.reset()


def build_model(args):
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    return ViewportTransformerMTIO(
        in_channel=2, fut_window=args.fut_window, d_model=args.hidden_dim,
        dim_feedforward=args.hidden_dim, num_encoder_layers=args.block_num,
        num_decoder_layers=args.block_num, dtype=dtype,
        teacher_forcing=getattr(args, "teacher_forcing", False))


def run(args, config):
    assert args.model in ("regression", "mtio")
    # None -> config backfill (reference run_models.py:198-203); kept in
    # run() so programmatic callers get the same semantics as main()
    args.trim_head = config.trim_head if args.trim_head is None else args.trim_head
    args.trim_tail = config.trim_tail if args.trim_tail is None else args.trim_tail
    args.dataset_frequency = (config.frequency if args.dataset_frequency is None
                              else args.dataset_frequency)
    args.sample_step = config.sample_step if args.sample_step is None else args.sample_step
    key = seed_everything(args.seed)

    models_dir = os.path.join(config.vp_models_dir, args.model,
                              args.train_dataset, f"{args.dataset_frequency}Hz")
    results_dir = os.path.join(config.vp_results_dir, args.model,
                               args.test_dataset, f"{args.dataset_frequency}Hz")
    os.makedirs(models_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)

    file_prefix = (f"his_{args.his_window}_fut_{args.fut_window}_"
                   f"hid_{args.hidden_dim}_ss_{args.sample_step}_"
                   f"epochs_{args.epochs}_bs_{args.bs}_lr_{args.lr}_seed_{args.seed}")

    model = build_model(args)
    optimizer = vp_train.make_optimizer(
        args.lr, 0.01 if args.weight_decay is None else args.weight_decay)
    state = vp_train.create_train_state(model, key, args.his_window, optimizer)

    if args.train:
        console_log = open(os.path.join(results_dir, file_prefix + "console.log"), "w")
        sys.stdout = ConsoleLogger(sys.__stdout__, console_log)
        state = train(args, config, model, optimizer, state, models_dir, file_prefix)
    if args.test:
        test(args, config, model, optimizer, state, models_dir, results_dir,
             file_prefix)


def build_parser():
    parser = argparse.ArgumentParser(
        description="Train/test viewport prediction models (TPU-native).")
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--device", type=str, default=None,
                        help="jax platform override (cpu/tpu)")
    parser.add_argument("--model", type=str, default="mtio")
    parser.add_argument("--hidden-dim", type=int, default=512)
    parser.add_argument("--block-num", type=int, default=2)
    parser.add_argument("--compile", action="store_true",
                        help="accepted for reference-CLI compatibility (JAX "
                             "always jit-compiles)")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--resume-path", type=str)
    parser.add_argument("--train-dataset", type=str, default="Jin2022")
    parser.add_argument("--test-dataset", type=str, default="Jin2022")
    parser.add_argument("--his-window", type=int, default=5)
    parser.add_argument("--fut-window", type=int, default=15)
    parser.add_argument("--trim-head", type=int)
    parser.add_argument("--trim-tail", type=int)
    parser.add_argument("--dataset-frequency", type=int)
    parser.add_argument("--sample-step", type=int)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--epochs-per-valid", type=int, default=3)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight-decay", type=float)
    parser.add_argument("--bs", type=int, default=512)
    parser.add_argument("--seed", type=int, default=5)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 compute dtype (params stay f32); TPU MXU "
                             "runs bf16 natively (extension)")
    parser.add_argument("--teacher-forcing", action="store_true",
                        help="single-pass ground-truth-fed TRAIN decode "
                             "instead of the reference's 15-step "
                             "autoregressive loop; inference stays AR "
                             "(extension, see models/mtio.py)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard batches over all devices (SPMD DP)")
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
    if args.model == "regression":
        args.train = False
        print("Detect model: regression. Automatically disable train mode.")
    print(args)
    run(args, config)


if __name__ == "__main__":
    main()
