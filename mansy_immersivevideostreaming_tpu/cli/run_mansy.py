"""MANSY training/testing CLI (PPO + QoE-preference identifier).

TPU-native equivalent of reference ``bitrate_selection/run_mansy.py``: same
flags, hyperparameters, directory layout, and CSV outputs.  The tianshou
Collector/OnpolicyTrainer stack is replaced by a jitted scan collector over
vmapped envs, a jitted PPO update, and batched identifier training/reward
shaping (the reference recomputes identifier rewards one transition at a time
— ``mansy_ppo.py:43-48``; here it is one forward over the whole buffer).

Example::

    python -m mansy_immersivevideostreaming_tpu.cli.run_mansy --train --test \
        --epochs 1000 --step-per-epoch 4096 --lr 5e-4 --batch-size 512 \
        --qoe-test-ids 0 1 2 3 --test-on-seen --lamb 0.5 --train-identifier \
        --use-identifier --gamma 0.95 --ent-coef 0.02 --seed 5
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
from mansy_immersivevideostreaming_tpu.models.abr_nets import (
    MansyActorCritic, QoEIdentifier,
)
from mansy_immersivevideostreaming_tpu.rl import ppo as ppo_mod
from mansy_immersivevideostreaming_tpu.rl.identifier import (
    center_rewards_by_preference, identifier_rewards, shape_rewards,
    train_identifier_on_buffer,
)
from mansy_immersivevideostreaming_tpu.rl import runner
from mansy_immersivevideostreaming_tpu.rl.rollout import (
    flatten_time, init_lanes, make_collector,
)
from mansy_immersivevideostreaming_tpu.rl.types import RunningStat
from mansy_immersivevideostreaming_tpu.sim.env import observe_mansy
from mansy_immersivevideostreaming_tpu.utils.checkpoint import (
    load_net_config, restore_checkpoint, save_checkpoint, save_net_config,
)
from mansy_immersivevideostreaming_tpu.utils.logging import ConsoleLogger
from mansy_immersivevideostreaming_tpu.utils.prng import enable_compilation_cache, seed_everything

try:
    from torch.utils.tensorboard import SummaryWriter
except Exception:  # pragma: no cover - tensorboard optional
    SummaryWriter = None


def dummy_obs(config, batch=2, exact_action_values=False):
    k = config.past_k
    obs = {
        "throughput": jnp.zeros((batch, k)),
        "next_chunk_size": jnp.zeros((batch, config.num_rates, config.tile_total_num)),
        "next_chunk_quality": jnp.zeros((batch, config.num_rates, config.tile_total_num)),
        "pred_viewport": jnp.zeros((batch, config.tile_total_num)),
        "rates_inside": jnp.zeros((batch, k)),
        "rates_outside": jnp.zeros((batch, k)),
        "viewport_acc": jnp.zeros((batch, k)),
        "buffer": jnp.zeros((batch, 1)),
        "qoe_weight": jnp.zeros((batch, 3)),
        "action_one_hot": jnp.zeros((batch, config.action_space)),
        "past_viewport_qualities": jnp.zeros((batch, k)),
        "past_quality_variances": jnp.zeros((batch, k)),
        "past_rebuffering": jnp.zeros((batch, k)),
    }
    if exact_action_values:
        obs["action_values"] = jnp.zeros((batch, config.action_space + 1))
    return obs


def policy_net_config(args, acc_correct_obs=None):
    """The net/obs construction flags a policy checkpoint was trained under,
    written as a ``.netcfg.json`` sidecar (utils/checkpoint.py) so
    ``--test --policy-path`` reconstructs the SAME policy function —
    flags like av_logit_prior add no params, so a flag mismatch restores
    silently into a different policy (the v16 eval bug)."""
    return {
        "hidden_dim": int(args.hidden_dim),
        "obs_action_values": bool(args.obs_action_values),
        "exact_action_values": bool(args.exact_action_values),
        "av_logit_prior": float(args.av_logit_prior),
        "acc_correct_obs": bool(args.acc_correct if acc_correct_obs is None
                                else acc_correct_obs),
    }


def apply_net_config(args, netcfg):
    """Override the eval-time net/obs flags from a checkpoint's sidecar,
    reporting any CLI-flag mismatch (the sidecar wins)."""
    mapping = {"hidden_dim": "hidden_dim",
               "obs_action_values": "obs_action_values",
               "exact_action_values": "exact_action_values",
               "av_logit_prior": "av_logit_prior",
               "acc_correct_obs": "acc_correct"}
    for key, attr in mapping.items():
        if key not in netcfg:
            continue
        old = getattr(args, attr)
        if old != netcfg[key]:
            print(f"netcfg sidecar: {attr} {old} -> {netcfg[key]} "
                  "(checkpoint's training configuration wins)")
            setattr(args, attr, netcfg[key])


def _attach_exact_action_values(config, dataset, *tables_list,
                                acc_correct=False):
    """Attach deployable per-action profiling tables (expert-table build or
    cache) so observe_mansy emits the exact 'action_values' field; with
    ``acc_correct`` the field is the accuracy-corrected estimate
    (sim.expert.corrected_scores)."""
    from mansy_immersivevideostreaming_tpu.cli.run_expert import (
        get_expert_tables)
    from mansy_immersivevideostreaming_tpu.sim.expert import (
        attach_action_values)
    cache_dir = os.path.join(config.bs_models_dir, "expert")
    out = []
    for i, t in enumerate(tables_list):
        cache = os.path.join(cache_dir, f"{dataset}_avcache{i}.pkl")
        out.append(attach_action_values(t, get_expert_tables(t, cache, False),
                                        acc_correct=acc_correct))
    return out


def train(args, config, models_dir):
    train_log_path = os.path.join(models_dir, "train_log.csv")
    valid_log_path = os.path.join(models_dir, "valid_log.csv")
    for p in (train_log_path, valid_log_path):
        if os.path.exists(p):
            os.remove(p)

    qoe_weights = [config.qoe_split["train"][i] for i in args.qoe_train_ids]
    base_qoe_weights = list(qoe_weights)
    if args.pref_interp > 0:
        # preference-interpolation augmentation (extension, VERDICT r2 item 1):
        # append random convex combinations of the train preferences so the
        # policy sees a smooth conditioning manifold, not 4 isolated points
        rng = np.random.default_rng(args.seed)
        base = np.asarray(qoe_weights, np.float64)
        coef = rng.dirichlet(np.full(len(qoe_weights), args.pref_interp_alpha),
                             size=args.pref_interp)
        qoe_weights = qoe_weights + [[float(x) for x in np.round(c @ base, 4)]
                                     for c in coef]
    print("Training QoE weights:", qoe_weights)
    tables, samples, videos, users, traces = runner.build_split(
        config, args.train_dataset, args.network_dataset, "train", qoe_weights)
    # valid split stays on the base preference set so valid returns remain
    # comparable across runs with/without interpolation augmentation
    vtables, vsamples, vvideos, vusers, vtraces = runner.build_split(
        config, args.train_dataset, args.network_dataset, "valid",
        base_qoe_weights)
    if args.exact_action_values:
        tables, vtables = _attach_exact_action_values(
            config, args.train_dataset, tables, vtables,
            acc_correct=args.acc_correct)

    policy = MansyActorCritic(hidden_dim=args.hidden_dim,
                              action_space=config.action_space,
                              use_action_values=(args.obs_action_values
                                                 or args.exact_action_values),
                              av_logit_prior=args.av_logit_prior)
    identifier = QoEIdentifier(hidden_dim=args.hidden_dim)
    key = seed_everything(args.seed)
    k_p, k_i, key = jax.random.split(key, 3)
    obs0 = dummy_obs(config, exact_action_values=args.exact_action_values)
    params = policy.init(k_p, obs0)["params"]
    id_params = identifier.init(k_i, obs0)["params"]

    policy_apply = lambda p, o: policy.apply({"params": p}, o)
    id_apply = lambda p, o: identifier.apply({"params": p}, o)

    optimizer = ppo_mod.make_optimizer(args.lr, args.weight_decay)
    opt_state = optimizer.init(params)
    id_optimizer = ppo_mod.make_optimizer(args.identifier_lr, args.weight_decay)
    id_opt_state = id_optimizer.init(id_params)

    cfg = ppo_mod.PPOConfig(
        gamma=args.gamma, gae_lambda=args.gae_lambda, eps_clip=args.eps_clip,
        vf_coef=args.vf_coef, ent_coef=args.ent_coef,
        max_grad_norm=args.max_grad_norm, value_clip=bool(args.value_clip),
        norm_adv=bool(args.norm_adv), rew_norm=bool(args.rew_norm),
        repeat=args.repeat_per_collect, minibatch=args.batch_size,
        norm_adv_per_pref=bool(args.norm_adv_per_pref),
        n_prefs=len(qoe_weights))

    n_lanes = args.train_lanes
    n_steps = max(args.step_per_collect // n_lanes, 1)
    if args.data_parallel and jax.device_count() > 1:
        from mansy_immersivevideostreaming_tpu.parallel.mesh import (
            data_parallel_sharding, make_mesh, replicate)
        mesh = make_mesh()
        print(f"Env lanes sharded over {jax.device_count()} devices")
        repl = replicate(mesh)
        tables = jax.device_put(tables, repl)
        samples = jax.device_put(samples, repl)
        params = jax.device_put(params, repl)
        id_params = jax.device_put(id_params, repl)
        opt_state = jax.device_put(opt_state, repl)
        id_opt_state = jax.device_put(id_opt_state, repl)
    collect = make_collector(policy_apply, observe_mansy, tables, samples,
                             n_lanes, n_steps, train=True)
    states = init_lanes(tables, samples, n_lanes, args.seed)
    if args.data_parallel and jax.device_count() > 1:
        states = jax.device_put(states, data_parallel_sharding(mesh))
    ret_rms = RunningStat.init()
    # valid selection samples actions by default (tianshou parity; the
    # reference's best-checkpoint criterion, run_mansy.py:85-104);
    # --deterministic-eval makes selection measure the same argmax statistic
    # the test grids do (VERDICT r4: stochastic "best" rewards low-entropy
    # collapse, not boundary quality)
    valid_eval_fn = runner.make_eval_fn(policy_apply, vtables, observe_mansy,
                                        deterministic=args.deterministic_eval)

    checkpoint_path = os.path.join(models_dir, "checkpoint.ckpt")
    id_checkpoint_path = os.path.join(models_dir, "identifier_checkpoint.ckpt")
    best_policy_path = os.path.join(models_dir, "best_policy.ckpt")
    best_identifier_path = os.path.join(models_dir, "best_identifier.ckpt")
    netcfg = policy_net_config(args)
    for p in (checkpoint_path, best_policy_path):
        save_net_config(p, netcfg)
    anchor_params = None

    bc_file_prefix = (f"bc_ms_{args.bc_max_steps}_ims_{args.bc_identifier_max_steps}"
                      f"_ilr_{args.identifier_lr}_iur_{args.identifier_update_round}")
    policy_bc_path = os.path.join(models_dir, bc_file_prefix + "_policy.ckpt")
    identifier_bc_path = os.path.join(models_dir, bc_file_prefix + "_identifier.ckpt")
    if args.bc:
        # behavior cloning initialization from expert demos
        # (reference run_mansy.py:260-274); load_demonstrations also accepts
        # the reference's pickled-tianshou-ReplayBuffer demo format
        from mansy_immersivevideostreaming_tpu.data.tianshou_compat import (
            load_demonstrations)
        from mansy_immersivevideostreaming_tpu.rl.bc import (
            behavior_cloning_pretraining)
        demos_dir = os.path.join(
            config.bs_models_dir, "expert",
            args.train_dataset + "_" + args.network_dataset,
            "qoe" + "_".join(map(str, args.qoe_train_ids)))
        train_demos_path = os.path.join(demos_dir, "train_demonstrations.pkl")
        valid_demos_path = os.path.join(demos_dir, "valid_demonstrations.pkl")
        assert os.path.exists(train_demos_path) and os.path.exists(valid_demos_path)
        train_demos = list(load_demonstrations(train_demos_path).values())
        valid_demos = list(load_demonstrations(valid_demos_path).values())
        params, opt_state, id_params, id_opt_state, _ = (
            behavior_cloning_pretraining(
                policy_apply, optimizer, params, opt_state,
                id_apply, id_optimizer, id_params, id_opt_state,
                train_demos, valid_demos, args.bc_max_steps,
                args.bc_valid_per_step, args.bc_identifier_max_steps,
                args.identifier_update_round, args.seed,
                save_policy=lambda p: save_checkpoint(policy_bc_path, p),
                save_identifier=lambda p: save_checkpoint(identifier_bc_path, p)))

    if args.pretrain_identifier > 0:
        # pre-train the identifier on the expert-demo grid BEFORE PPO starts
        # (VERDICT r2 item 2: in the reference the identifier sees demos only
        # under --bc, utils/mansy_utils.py:74-87; here the shaping signal is
        # informative from step 0 without any policy imitation)
        from mansy_immersivevideostreaming_tpu.data.tianshou_compat import (
            load_demonstrations)
        from mansy_immersivevideostreaming_tpu.rl.dagger import flatten_demos
        from mansy_immersivevideostreaming_tpu.rl.identifier import (
            pretrain_identifier_on_demos)
        demos_path = args.pretrain_demos_path or os.path.join(
            config.bs_models_dir, "expert",
            args.train_dataset + "_" + args.network_dataset,
            "qoe" + "_".join(map(str, args.qoe_train_ids)),
            "train_demonstrations.pkl")
        demo_obs, _ = flatten_demos(
            list(load_demonstrations(demos_path).values()))
        key, k_pre = jax.random.split(key)
        id_params, id_opt_state, pre_losses, pre_valid = (
            pretrain_identifier_on_demos(
                id_apply, id_optimizer, id_params, id_opt_state, demo_obs,
                args.pretrain_identifier, 4096, k_pre))
        print(f"Identifier pretrained on {demo_obs['qoe_weight'].shape[0]} "
              f"demo transitions ({args.pretrain_identifier} steps): "
              f"mse {pre_losses[0]:.5f} -> {pre_losses[-1]:.5f}, "
              f"valid {pre_valid:.5f}")
        if args.data_parallel and jax.device_count() > 1:
            # pretraining ran after the replication block and returned
            # default-device arrays; restore the replicated mesh placement
            id_params = jax.device_put(id_params, repl)
            id_opt_state = jax.device_put(id_opt_state, repl)

    if args.resume:
        if os.path.exists(checkpoint_path):
            params = restore_checkpoint(checkpoint_path, params)
            print("Successfully loaded agent from:", checkpoint_path)
        if os.path.exists(id_checkpoint_path):
            id_params = restore_checkpoint(id_checkpoint_path, id_params)
            print("Successfully loaded identifier from:", id_checkpoint_path)
    elif args.init_path:
        # arbitrary warm-start (e.g. a DAgger policy); with --bc-kl it also
        # becomes the conditioning-preserving KL anchor (extension)
        params = restore_checkpoint(args.init_path, params)
        print("Successfully init agent from:", args.init_path)
        if args.bc_kl > 0 or args.bc_kl_per_pref is not None:
            anchor_params = jax.tree_util.tree_map(jnp.copy, params)
            print(f"KL anchor enabled (coef "
                  f"{args.bc_kl_per_pref or args.bc_kl})")
    elif args.init_from_bc:
        if os.path.exists(policy_bc_path):
            params = restore_checkpoint(policy_bc_path, params)
            print("Successfully init agent from behavior cloning:", policy_bc_path)
            if args.bc_kl > 0 or args.bc_kl_per_pref is not None:
                anchor_params = jax.tree_util.tree_map(jnp.copy, params)
                print(f"KL-to-BC anchor enabled (coef "
                      f"{args.bc_kl_per_pref or args.bc_kl})")
        if os.path.exists(identifier_bc_path):
            id_params = restore_checkpoint(identifier_bc_path, id_params)
            print("Successfully init identifier from behavior cloning:",
                  identifier_bc_path)

    writer = None
    if SummaryWriter is not None:
        writer = SummaryWriter(os.path.join(models_dir, "mansy_tb_logger"))

    collects_per_epoch = max(args.step_per_epoch // (n_lanes * n_steps), 1)
    # jitted anchor forward, built ONCE (a jax.jit(...) constructed inside the
    # collect loop would re-trace the policy every iteration)
    anchor_forward = jax.jit(policy_apply) if anchor_params is not None else None
    best_reward = float("-inf")
    env_step = 0
    for epoch in range(1, args.epochs + 1):
        # optional entropy annealing (extension beyond the reference; off by
        # default — linear decay from --ent-coef to --ent-final)
        if args.ent_final is not None:
            frac = (epoch - 1) / max(args.epochs - 1, 1)
            ent_coef = args.ent_coef + frac * (args.ent_final - args.ent_coef)
        else:
            ent_coef = args.ent_coef
        # optional λ warm-up (extension; off by default): identifier shaping
        # ramps in over --lamb-warmup epochs so early training is driven by
        # the QoE gradient before the representation bonus kicks in
        if args.lamb_warmup > 0:
            lamb = args.lamb * min((epoch - 1) / args.lamb_warmup, 1.0)
        else:
            lamb = args.lamb
        t0 = time.time()
        metrics = {}
        for _ in range(collects_per_epoch):
            key, k_c, k_u, k_id = jax.random.split(key, 4)
            states, traj, logs, last_values = collect(params, states, k_c)
            env_step += n_lanes * n_steps
            flat_obs = flatten_time(traj.obs)

            if args.train_identifier:
                id_params, id_opt_state, id_losses, id_valid = (
                    train_identifier_on_buffer(
                        id_apply, id_optimizer, id_params, id_opt_state,
                        flat_obs, k_id, args.identifier_update_round))
                print("identifier loss:",
                      [round(float(l), 6) for l in np.asarray(id_losses)],
                      "valid:", round(float(id_valid), 6))

            rewards = traj.reward
            if args.use_identifier:
                id_rew = identifier_rewards(id_apply, id_params, flat_obs)
                id_rew = id_rew.reshape(rewards.shape)
                if args.id_reward_center:
                    prefs = jnp.asarray(
                        [np.asarray(w) / np.sum(w) for w in qoe_weights],
                        jnp.float32)
                    id_rew = center_rewards_by_preference(
                        id_rew, flat_obs["qoe_weight"].reshape(
                            rewards.shape + (-1,)), prefs)
                rewards = shape_rewards(rewards, id_rew, lamb)

            anchor_logits = None
            if anchor_forward is not None:
                a_logits, _ = anchor_forward(anchor_params, flat_obs)
                anchor_logits = a_logits.reshape(traj.reward.shape + (-1,))
            if args.bc_kl_per_pref is not None:
                kl_coef = jnp.asarray(args.bc_kl_per_pref, jnp.float32)
            else:
                kl_coef = args.bc_kl
            params, opt_state, ret_rms, metrics = ppo_mod.ppo_update(
                policy_apply, optimizer, cfg, params, opt_state, traj,
                rewards, last_values, ret_rms, k_u, ent_coef,
                anchor_logits=anchor_logits, kl_coef=kl_coef,
                pref_ids=logs.qoe_id
                if (args.norm_adv_per_pref or args.bc_kl_per_pref is not None)
                else None)

            runner.append_episode_logs(
                train_log_path,
                runner.episode_log_rows(logs, videos, users, traces, qoe_weights))

        # validation over the valid split (reference valid collector,
        # run_mansy.py:117-136)
        key, k_v = jax.random.split(key)
        vlogs, vmasks = runner.evaluate(policy_apply, params, vtables, vsamples,
                                        observe_mansy, k_v, eval_fn=valid_eval_fn)
        vrows = runner.masked_log_rows(vlogs, vmasks, vvideos, vusers, vtraces,
                                       base_qoe_weights)
        runner.append_episode_logs(valid_log_path, vrows)
        rets = np.concatenate([np.asarray(l.ret)[m] for l, m in zip(vlogs, vmasks)])
        mean_reward = float(rets.mean())
        vqids = np.concatenate([np.asarray(l.qoe_id)[m]
                                for l, m in zip(vlogs, vmasks)])
        per_pref = " ".join(
            f"q{q}:{float(rets[vqids == q].mean()):.2f}"
            for q in sorted(set(vqids.tolist())))

        if epoch % max(args.save_interval, 1) == 0:
            # periodic checkpoint (reference save_interval, run_mansy.py:313)
            save_checkpoint(checkpoint_path, params)
            save_checkpoint(id_checkpoint_path, id_params)
        if mean_reward > best_reward:
            best_reward = mean_reward
            save_checkpoint(best_policy_path, params)
            save_checkpoint(best_identifier_path, id_params)
            print("=" * 68)
            print("Best policy save at " + best_policy_path)
            print("Best identifier save at " + best_identifier_path)
            print("=" * 68)

        dt = time.time() - t0
        print(f"Epoch: {epoch} | env_step {env_step} | "
              f"{collects_per_epoch * n_lanes * n_steps / dt:,.0f} env-steps/s | "
              f"valid mean return {mean_reward:.4f} [{per_pref}] "
              f"(best {best_reward:.4f})")
        if metrics:
            print("loss:", float(metrics["loss"]), " --- ",
                  "loss/clip:", float(metrics["loss/clip"]), " --- ",
                  "loss/vf:", float(metrics["loss/vf"]), " --- ",
                  "loss/ent:", float(metrics["loss/ent"]))
        if writer is not None:
            writer.add_scalar("train/reward", mean_reward, env_step)
            for k, v in metrics.items():
                writer.add_scalar(k, float(v), env_step)
        if mean_reward >= args.reward_threshold:
            break
    return params, id_params


def test(args, config, models_dir, results_dir):
    test_log_path = os.path.join(results_dir, "results.csv")
    if os.path.exists(test_log_path):
        os.remove(test_log_path)

    policy_path = args.policy_path or os.path.join(models_dir, "best_policy.ckpt")
    if not os.path.exists(policy_path):
        raise FileExistsError(f"File not exist: {policy_path}")
    netcfg = load_net_config(policy_path)
    if netcfg is not None:
        apply_net_config(args, netcfg)

    split = "train" if args.test_on_seen else "test"
    qoe_weights = [config.qoe_split[split][i] for i in args.qoe_test_ids]
    print("Testing QoE weights:", qoe_weights)
    tables, samples, videos, users, traces = runner.build_split(
        config, args.test_dataset, args.network_dataset, "test", qoe_weights,
        test_grid=True)
    if args.exact_action_values:
        tables, = _attach_exact_action_values(
            config, args.test_dataset + "_test", tables,
            acc_correct=args.acc_correct)

    policy = MansyActorCritic(hidden_dim=args.hidden_dim,
                              action_space=config.action_space,
                              use_action_values=(args.obs_action_values
                                                 or args.exact_action_values),
                              av_logit_prior=args.av_logit_prior)
    key = seed_everything(args.seed)
    params = policy.init(key, dummy_obs(
        config, exact_action_values=args.exact_action_values))["params"]
    params = restore_checkpoint(policy_path, params)
    print("Successfully loaded agent from:", policy_path)

    policy_apply = lambda p, o: policy.apply({"params": p}, o)
    t0 = time.time()
    logs, masks = runner.evaluate(policy_apply, params, tables, samples,
                                  observe_mansy, key,
                                  deterministic=args.deterministic_eval)
    n_eps = int(sum(m.sum() for m in masks))
    print(f"Tested {n_eps} episodes in {time.time() - t0:.1f}s")
    rows = runner.masked_log_rows(logs, masks, videos, users, traces, qoe_weights)
    runner.append_episode_logs(test_log_path, rows)
    runner.read_log_file(test_log_path)
    print("Results saved at:", test_log_path)


def run(args, config):
    if args.qoe_train_ids is None:
        args.qoe_train_ids = list(range(len(config.qoe_split["train"])))
    split = "train" if args.test_on_seen else "test"
    if args.qoe_test_ids is None:
        args.qoe_test_ids = list(range(len(config.qoe_split[split])))

    prefix = (f"epochs_{args.epochs}_bs_{args.batch_size}_lr_{args.lr}_"
              f"gamma_{args.gamma}_seed_{args.seed}_ent_{args.ent_coef}_"
              f"useid_{args.use_identifier}_lambda_{args.lamb}_"
              f"ilr_{args.identifier_lr}_iur_{args.identifier_update_round}_"
              f"bc_{args.bc or args.init_from_bc}")
    models_dir = os.path.join(
        config.bs_models_dir, args.model,
        args.train_dataset + "_" + args.network_dataset,
        "qoe" + "_".join(map(str, args.qoe_train_ids)), prefix)
    seen = "seen" if args.test_on_seen else "unseen"
    results_dir = os.path.join(
        config.bs_results_dir, args.model,
        args.test_dataset + "_" + args.network_dataset,
        f"{seen}_qoe" + "_".join(map(str, args.qoe_test_ids)), prefix)
    os.makedirs(models_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)

    if args.train:
        console_log = open(os.path.join(models_dir, "console.log"), "w")
        sys.stdout = ConsoleLogger(sys.__stdout__, console_log)
        train(args, config, models_dir)
    if args.test:
        test(args, config, models_dir, results_dir)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default="mansy")
    parser.add_argument("--reward-threshold", type=float, default=500000.0)
    parser.add_argument("--seed", type=int, default=5)
    parser.add_argument("--buffer-size", type=int, default=1000000)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--weight-decay", type=float, default=1e-2)
    parser.add_argument("--gamma", type=float, default=0.95)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--step-per-epoch", type=int, default=4096)
    parser.add_argument("--step-per-collect", type=int, default=4096)
    parser.add_argument("--repeat-per-collect", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--train-lanes", type=int, default=128,
                        help="parallel env lanes (replaces tianshou train_num)")
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--vf-coef", type=float, default=0.5)
    parser.add_argument("--ent-coef", type=float, default=0.02)
    parser.add_argument("--ent-final", type=float, default=None,
                        help="(extension) linearly anneal entropy coef to "
                             "this value over training")
    parser.add_argument("--eps-clip", type=float, default=0.2)
    parser.add_argument("--max-grad-norm", type=float, default=1)
    parser.add_argument("--gae-lambda", type=float, default=0.95)
    parser.add_argument("--rew-norm", type=int, default=1)
    parser.add_argument("--value-clip", type=int, default=1)
    parser.add_argument("--norm-adv", type=int, default=1)
    parser.add_argument("--recompute-adv", type=int, default=0,
                        help="accepted for reference-CLI compatibility; the "
                             "reference default (0) is the only supported mode")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--save-interval", type=int, default=4)
    parser.add_argument("--model", type=str, default="mansy")
    parser.add_argument("--hidden-dim", type=int, default=128)
    parser.add_argument("--obs-action-values", action="store_true",
                        help="(extension) add derived causal-MPC one-step "
                             "QoE features per action to the policy net "
                             "(models/abr_nets.py:causal_action_values)")
    parser.add_argument("--av-logit-prior", type=float, default=0.0,
                        help="(extension) add beta * standardized causal "
                             "one-step action values to the actor logits so "
                             "the init policy ~= the causal-h1 MPC controller "
                             "(models/abr_nets.py:MansyActorCritic)")
    parser.add_argument("--acc-correct", action="store_true",
                        help="use the accuracy-corrected deployable estimate "
                             "(sim.expert.corrected_scores) for the exact "
                             "action-value obs field")
    parser.add_argument("--exact-action-values", action="store_true",
                        help="(extension) env-computed EXACT causal one-step "
                             "action values as an observation field "
                             "(sim.env.exact_action_values)")
    parser.add_argument("--identifier-lr", type=float, default=1e-4)
    parser.add_argument("--identifier-update-round", type=int, default=2)
    parser.add_argument("--lamb", type=float, default=0.5)
    parser.add_argument("--lamb-warmup", type=int, default=0,
                        help="ramp the identifier-shaping λ from 0 to --lamb "
                             "over this many epochs (extension; 0 = off)")
    parser.add_argument("--id-reward-center", action="store_true",
                        help="subtract the per-preference batch mean from the "
                             "identifier reward before shaping (extension)")
    parser.add_argument("--norm-adv-per-pref", action="store_true",
                        help="(extension) normalize advantages within each "
                             "QoE-preference group instead of per minibatch")
    parser.add_argument("--pretrain-identifier", type=int, default=0,
                        help="(extension) minibatch-MSE steps pre-training "
                             "the identifier on the expert-demo grid before "
                             "PPO starts (0 = off)")
    parser.add_argument("--pretrain-demos-path", type=str, default=None,
                        help="demo pickle for --pretrain-identifier "
                             "(default: the standard expert demos dir)")
    parser.add_argument("--pref-interp", type=int, default=0,
                        help="(extension) append this many random convex "
                             "combinations of the train preferences as extra "
                             "training preferences (0 = off)")
    parser.add_argument("--pref-interp-alpha", type=float, default=1.0,
                        help="Dirichlet concentration for --pref-interp "
                             "combination coefficients")
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--train-identifier", action="store_true")
    parser.add_argument("--use-identifier", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--test-on-seen", action="store_true")
    parser.add_argument("--train-dataset", type=str, default="Jin2022")
    parser.add_argument("--test-dataset", type=str, default="Jin2022")
    parser.add_argument("--network-dataset", type=str, default="4G")
    parser.add_argument("--qoe-train-ids", type=int, nargs="*")
    parser.add_argument("--qoe-test-ids", type=int, nargs="*")
    parser.add_argument("--policy-path", type=str)
    parser.add_argument("--bc", action="store_true")
    parser.add_argument("--bc-max-steps", type=int, default=150)
    parser.add_argument("--bc-valid-per-step", type=int, default=50)
    parser.add_argument("--bc-identifier-max-steps", type=int, default=150)
    parser.add_argument("--init-from-bc", action="store_true")
    parser.add_argument("--init-path", type=str, default=None,
                        help="warm-start policy checkpoint (e.g. DAgger); "
                             "with --bc-kl also the KL anchor (extension)")
    parser.add_argument("--bc-kl", type=float, default=0.0,
                        help="(extension) KL penalty toward the frozen BC "
                             "policy during PPO fine-tuning (requires "
                             "--init-from-bc)")
    parser.add_argument("--bc-kl-per-pref", type=float, nargs="*",
                        default=None,
                        help="(extension) per-preference KL anchor "
                             "coefficients, one per train preference; "
                             "overrides --bc-kl (round-4 PPO diagnosis: "
                             "tight on sharp constant-mode anchors, loose "
                             "on dynamic cells)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard env lanes over all devices (SPMD)")
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
