"""Checkpoint round-trip + SPMD sharding tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.models.abr_nets import MansyActorCritic
from mansy_immersivevideostreaming_tpu.parallel.mesh import (
    data_parallel_sharding, make_mesh, replicate, shard_batch,
)
from mansy_immersivevideostreaming_tpu.rl import ppo as ppo_mod
from mansy_immersivevideostreaming_tpu.rl.rollout import init_lanes, make_collector
from mansy_immersivevideostreaming_tpu.rl.types import RunningStat
from mansy_immersivevideostreaming_tpu.sim.env import (
    generate_environment_samples, observe_mansy,
)
from mansy_immersivevideostreaming_tpu.sim.tables import synthetic_sim_tables
from mansy_immersivevideostreaming_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint,
)


def _obs0(B=2):
    return {
        "throughput": jnp.zeros((B, 8)), "next_chunk_size": jnp.zeros((B, 5, 64)),
        "next_chunk_quality": jnp.zeros((B, 5, 64)),
        "pred_viewport": jnp.zeros((B, 64)), "rates_inside": jnp.zeros((B, 8)),
        "rates_outside": jnp.zeros((B, 8)), "viewport_acc": jnp.zeros((B, 8)),
        "buffer": jnp.zeros((B, 1)), "qoe_weight": jnp.zeros((B, 3)),
        "action_one_hot": jnp.zeros((B, 15)),
        "past_viewport_qualities": jnp.zeros((B, 8)),
        "past_quality_variances": jnp.zeros((B, 8)),
        "past_rebuffering": jnp.zeros((B, 8)),
    }


def test_checkpoint_roundtrip(tmp_path):
    policy = MansyActorCritic(hidden_dim=16)
    params = policy.init(jax.random.PRNGKey(0), _obs0())["params"]
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = restore_checkpoint(path, zeros)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_collect_and_ppo_update():
    assert jax.device_count() >= 8, "conftest should force 8 virtual devices"
    mesh = make_mesh(8)
    repl = replicate(mesh)
    dp = data_parallel_sharding(mesh)

    tables = jax.device_put(synthetic_sim_tables(), repl)
    samples = jax.device_put(
        jnp.asarray(generate_environment_samples(2, 2, 2, 2)), repl)
    policy = MansyActorCritic(hidden_dim=16)
    params = jax.device_put(
        policy.init(jax.random.PRNGKey(0), _obs0())["params"], repl)
    apply_fn = lambda p, o: policy.apply({"params": p}, o)

    n_lanes = 16  # 2 per device
    collect = make_collector(apply_fn, observe_mansy, tables, samples,
                             n_lanes, n_steps=8, train=True)
    states = jax.device_put(init_lanes(tables, samples, n_lanes), dp)
    final_states, traj, logs, last_values = collect(params, states,
                                                    jax.random.PRNGKey(1))
    # outputs exist and are finite on the sharded path
    assert np.isfinite(np.asarray(traj.reward)).all()

    opt = ppo_mod.make_optimizer(1e-3)
    opt_state = jax.device_put(opt.init(params), repl)
    cfg = ppo_mod.PPOConfig(minibatch=32, repeat=1)
    params2, _, _, metrics = ppo_mod.ppo_update(
        apply_fn, opt, cfg, params, opt_state, traj, traj.reward, last_values,
        RunningStat.init(), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # params must actually have been updated
    changed = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(params2),
                        jax.tree_util.tree_leaves(
                            policy.init(jax.random.PRNGKey(0), _obs0())["params"])))
    assert changed


def test_deterministic_eval_path():
    from mansy_immersivevideostreaming_tpu.rl import runner
    tables = synthetic_sim_tables()
    samples = jnp.asarray(generate_environment_samples(2, 2, 2, 2))
    policy = MansyActorCritic(hidden_dim=16)
    params = policy.init(jax.random.PRNGKey(0), _obs0())["params"]
    apply_fn = lambda p, o: policy.apply({"params": p}, o)
    logs, masks = runner.evaluate(apply_fn, params, tables, samples,
                                  observe_mansy, jax.random.PRNGKey(1),
                                  deterministic=True)
    # every sample finished exactly once
    assert sum(int(m.sum()) for m in masks) == samples.shape[0]
    # deterministic: a second run with a different key gives identical logs
    logs2, _ = runner.evaluate(apply_fn, params, tables, samples,
                               observe_mansy, jax.random.PRNGKey(7),
                               deterministic=True)
    np.testing.assert_allclose(np.asarray(logs[0].qoe), np.asarray(logs2[0].qoe))


def test_netcfg_sidecar_roundtrip(tmp_path):
    """Policy checkpoints carry their net/obs construction flags in a
    .netcfg.json sidecar, and run_mansy --test restores them (param-free
    hyperparams like av_logit_prior restore silently into a DIFFERENT
    policy if the eval invocation forgets a flag — the round-4 v16 eval
    collapse)."""
    from mansy_immersivevideostreaming_tpu.cli.run_mansy import (
        apply_net_config, build_parser, policy_net_config)
    from mansy_immersivevideostreaming_tpu.utils.checkpoint import (
        load_net_config, save_net_config)

    args = build_parser().parse_args(
        ["--hidden-dim", "256", "--exact-action-values",
         "--acc-correct", "--av-logit-prior", "3.0"])
    path = str(tmp_path / "policy.ckpt")
    save_net_config(path, policy_net_config(args))

    eval_args = build_parser().parse_args([])  # eval omits every net flag
    assert eval_args.av_logit_prior == 0.0
    apply_net_config(eval_args, load_net_config(path))
    assert eval_args.hidden_dim == 256
    assert eval_args.exact_action_values is True
    assert eval_args.acc_correct is True
    assert eval_args.av_logit_prior == 3.0
    # sidecar-less checkpoints (rounds 2-3 artifacts) stay on CLI flags
    assert load_net_config(str(tmp_path / "absent.ckpt")) is None


def test_av_logit_prior_changes_argmax():
    """The av_logit_prior term is part of the policy function: the same
    params produce different argmax actions with and without it whenever
    the action_values field dominates — the invariant the netcfg sidecar
    protects."""
    obs = _obs0(B=4)
    obs["action_values"] = jnp.tile(
        jnp.linspace(-1.0, 1.0, 16)[None, :], (4, 1))
    with_prior = MansyActorCritic(hidden_dim=16, use_action_values=True,
                                  av_logit_prior=50.0)
    params = with_prior.init(jax.random.PRNGKey(0), obs)["params"]
    without = MansyActorCritic(hidden_dim=16, use_action_values=True,
                               av_logit_prior=0.0)
    logits_p, _ = with_prior.apply({"params": params}, obs)
    logits_0, _ = without.apply({"params": params}, obs)
    # prior 50 x standardized ascending AVs pins the argmax to the max-AV
    # action; the prior-less net (same params) must disagree somewhere
    assert jnp.all(jnp.argmax(logits_p, -1) == 14)
    assert not bool(jnp.all(jnp.argmax(logits_0, -1) ==
                            jnp.argmax(logits_p, -1)))
