"""simple_rl (A2C) baseline CLI.

TPU-native equivalent of reference ``bitrate_selection/run_simple_rl.py``:
A2C over the 5-field observation, one QoE preference per run
(``--qoe-train-id``), RMSprop.  The reference's ``SubprocVectorEnv`` x10
process fan-out (``run_simple_rl.py:38-42``) becomes vmapped env lanes.
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
from mansy_immersivevideostreaming_tpu.models.abr_nets import SimpleActorCritic
from mansy_immersivevideostreaming_tpu.rl import a2c as a2c_mod
from mansy_immersivevideostreaming_tpu.rl import runner
from mansy_immersivevideostreaming_tpu.rl.rollout import init_lanes, make_collector
from mansy_immersivevideostreaming_tpu.rl.types import RunningStat
from mansy_immersivevideostreaming_tpu.sim.env import observe_simple
from mansy_immersivevideostreaming_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint,
)
from mansy_immersivevideostreaming_tpu.utils.logging import ConsoleLogger
from mansy_immersivevideostreaming_tpu.utils.prng import enable_compilation_cache, seed_everything

try:
    from torch.utils.tensorboard import SummaryWriter
except Exception:  # pragma: no cover - tensorboard optional
    SummaryWriter = None


def dummy_obs(config, batch=2):
    return {
        "throughput": jnp.zeros((batch, config.past_k)),
        "chunk_sizes": jnp.zeros((batch, config.num_rates, config.tile_total_num)),
        "rebuffer": jnp.zeros((batch, 1)),
        "last_bitrates": jnp.zeros((batch, 2)),
        "pred_viewport": jnp.zeros((batch, config.tile_total_num)),
    }


def train(args, config, models_dir, file_prefix):
    train_log_path = os.path.join(models_dir, file_prefix + "_train_log.csv")
    valid_log_path = os.path.join(models_dir, file_prefix + "_valid_log.csv")
    for p in (train_log_path, valid_log_path):
        if os.path.exists(p):
            os.remove(p)

    qoe_weights = [config.qoe_split["train"][args.qoe_train_id]]
    print("Training QoE weights:", qoe_weights)
    tables, samples, videos, users, traces = runner.build_split(
        config, args.train_dataset, args.network_dataset, "train", qoe_weights)
    vtables, vsamples, vvideos, vusers, vtraces = runner.build_split(
        config, args.train_dataset, args.network_dataset, "valid", qoe_weights)

    policy = SimpleActorCritic(action_space=config.action_space)
    key = seed_everything(args.seed)
    params = policy.init(key, dummy_obs(config))["params"]
    policy_apply = lambda p, o: policy.apply({"params": p}, o)

    optimizer = a2c_mod.make_optimizer(args.lr)
    opt_state = optimizer.init(params)
    cfg = a2c_mod.A2CConfig(
        gamma=args.gamma, gae_lambda=args.gae_lambda, vf_coef=args.vf_coef,
        ent_coef=args.ent_coef, max_grad_norm=args.max_grad_norm,
        rew_norm=bool(args.rew_norm), minibatch=args.batch_size,
        repeat=args.repeat_per_collect)

    n_lanes = args.train_lanes
    n_steps = max(args.step_per_collect // n_lanes, 1)
    collect = make_collector(policy_apply, observe_simple, tables, samples,
                             n_lanes, n_steps, train=True)
    states = init_lanes(tables, samples, n_lanes, args.seed)
    ret_rms = RunningStat.init()
    valid_eval_fn = runner.make_eval_fn(policy_apply, vtables, observe_simple)

    checkpoint_path = os.path.join(models_dir, file_prefix + "_checkpoint.ckpt")
    best_policy_path = os.path.join(models_dir, file_prefix + "_best_policy.ckpt")

    writer = None
    if SummaryWriter is not None:
        writer = SummaryWriter(os.path.join(models_dir, file_prefix + "_tb"))

    best_reward = float("-inf")
    env_step = 0
    collects_per_epoch = max(args.step_per_epoch // (n_lanes * n_steps), 1)
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        for _ in range(collects_per_epoch):
            key, k_c, k_u = jax.random.split(key, 3)
            states, traj, logs, last_values = collect(params, states, k_c)
            env_step += n_lanes * n_steps
            params, opt_state, ret_rms, metrics = a2c_mod.a2c_update(
                policy_apply, optimizer, cfg, params, opt_state, traj,
                last_values, ret_rms, k_u)
            runner.append_episode_logs(
                train_log_path,
                runner.episode_log_rows(logs, videos, users, traces, qoe_weights))

        key, k_v = jax.random.split(key)
        vlogs, vmasks = runner.evaluate(policy_apply, params, vtables, vsamples,
                                        observe_simple, k_v, eval_fn=valid_eval_fn)
        runner.append_episode_logs(
            valid_log_path,
            runner.masked_log_rows(vlogs, vmasks, vvideos, vusers, vtraces,
                                   qoe_weights))
        rets = np.concatenate([np.asarray(l.ret)[m] for l, m in zip(vlogs, vmasks)])
        mean_reward = float(rets.mean())
        if epoch % 4 == 0:
            save_checkpoint(checkpoint_path, params)
        if mean_reward > best_reward:
            best_reward = mean_reward
            save_checkpoint(best_policy_path, params)
        dt = time.time() - t0
        print(f"Epoch: {epoch} | env_step {env_step} | "
              f"{collects_per_epoch * n_lanes * n_steps / dt:,.0f} env-steps/s | "
              f"valid mean return {mean_reward:.4f} (best {best_reward:.4f}) | "
              f"loss {float(metrics['loss']):.4f}")
        if writer is not None:
            writer.add_scalar("train/reward", mean_reward, env_step)
            for k_, v_ in metrics.items():
                writer.add_scalar(k_, float(v_), env_step)
        if mean_reward >= args.reward_threshold:
            break
    return params


def test(args, config, models_dir, results_dir, file_prefix):
    test_log_path = os.path.join(results_dir, "results.csv")
    if os.path.exists(test_log_path):
        os.remove(test_log_path)

    split = "train" if args.test_on_seen else "test"
    qoe_weights = [config.qoe_split[split][i] for i in args.qoe_test_ids]
    print("Testing QoE weights:", qoe_weights)
    tables, samples, videos, users, traces = runner.build_split(
        config, args.test_dataset, args.network_dataset, "test", qoe_weights,
        test_grid=True)

    policy = SimpleActorCritic(action_space=config.action_space)
    key = seed_everything(args.seed)
    params = policy.init(key, dummy_obs(config))["params"]
    policy_path = os.path.join(models_dir, file_prefix + "_best_policy.ckpt")
    if not os.path.exists(policy_path):
        raise FileExistsError(f"File not exist: {policy_path}")
    params = restore_checkpoint(policy_path, params)
    print("Successfully loaded agent from:", policy_path)
    policy_apply = lambda p, o: policy.apply({"params": p}, o)

    logs, masks = runner.evaluate(policy_apply, params, tables, samples,
                                  observe_simple, key,
                                  deterministic=args.deterministic_eval)
    rows = runner.masked_log_rows(logs, masks, videos, users, traces, qoe_weights)
    runner.append_episode_logs(test_log_path, rows)
    runner.read_log_file(test_log_path)
    print("Results saved at:", test_log_path)


def run(args, config):
    assert args.qoe_train_id is not None
    split = "train" if args.test_on_seen else "test"
    if args.qoe_test_ids is None:
        args.qoe_test_ids = list(range(len(config.qoe_split[split])))

    models_dir = os.path.join(config.bs_models_dir, args.model,
                              args.train_dataset + "_" + args.network_dataset,
                              f"qoe{args.qoe_train_id}")
    seen = "seen" if args.test_on_seen else "unseen"
    results_dir = os.path.join(config.bs_results_dir, args.model,
                               args.test_dataset + "_" + args.network_dataset,
                               f"{seen}_qoe" + "_".join(map(str, args.qoe_test_ids)))
    os.makedirs(models_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)

    file_prefix = (f"epochs_{args.epochs}_bs_{args.batch_size}_lr_{args.lr}_"
                   f"gamma_{args.gamma}_seed_{args.seed}_ent_{args.ent_coef}")
    if args.train:
        console_log = open(os.path.join(models_dir, file_prefix + "console.log"), "w")
        sys.stdout = ConsoleLogger(sys.__stdout__, console_log)
        train(args, config, models_dir, file_prefix)
    if args.test:
        test(args, config, models_dir, results_dir, file_prefix)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="simple_rl")
    parser.add_argument("--reward-threshold", type=float, default=500000.0)
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--buffer-size", type=int, default=1000000)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--gamma", type=float, default=0.99)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--step-per-epoch", type=int, default=6000)
    parser.add_argument("--step-per-collect", type=int, default=2048)
    parser.add_argument("--repeat-per-collect", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--train-lanes", type=int, default=128,
                        help="parallel env lanes (replaces SubprocVectorEnv x10)")
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--vf-coef", type=float, default=0.5)
    parser.add_argument("--ent-coef", type=float, default=0.01)
    parser.add_argument("--max-grad-norm", type=float, default=1)
    parser.add_argument("--gae-lambda", type=float, default=0.95)
    parser.add_argument("--rew-norm", type=int, default=1)
    parser.add_argument("--bound-action-method", type=str, default="clip")
    parser.add_argument("--model", type=str, default="simple_rl")
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--test-on-seen", action="store_true")
    parser.add_argument("--train-dataset", type=str, default="Jin2022")
    parser.add_argument("--test-dataset", type=str, default="Jin2022")
    parser.add_argument("--network-dataset", type=str, default="4G")
    parser.add_argument("--qoe-train-id", type=int)
    parser.add_argument("--qoe-test-ids", type=int, nargs="*")
    parser.add_argument("--deterministic-eval", action="store_true",
                        help="argmax actions at test time (tianshou "
                             "deterministic_eval; reference default samples)")
    parser.add_argument("--config-yml", type=str, default=None)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.device:
        jax.config.update("jax_platforms", args.device)
    enable_compilation_cache()
    print(args)
    config = load_config(args.config_yml)
    run(args, config)


if __name__ == "__main__":
    main()
