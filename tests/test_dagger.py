"""DAgger unit + smoke tests (synthetic tables, horizon 1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.models.abr_nets import MansyActorCritic
from mansy_immersivevideostreaming_tpu.rl import dagger
from mansy_immersivevideostreaming_tpu.rl import ppo as ppo_mod
from mansy_immersivevideostreaming_tpu.sim.env import generate_environment_samples
from mansy_immersivevideostreaming_tpu.sim.expert import build_expert_tables
from mansy_immersivevideostreaming_tpu.sim.tables import synthetic_sim_tables


def test_flatten_and_aggregate_first_episode_only():
    demos = [{"obs": {"x": np.ones((3, 2))}, "act": np.array([1, 2, 3])},
             {"obs": {"x": np.zeros((2, 2))}, "act": np.array([4, 5])}]
    obs, act = dagger.flatten_demos(demos)
    assert obs["x"].shape == (5, 2) and act.tolist() == [1, 2, 3, 4, 5]

    # new rollout: T=4, N=2; lane 0 ends at t=1, lane 1 at t=3 -> keep
    # 2 + 4 = 6 of the 8 transitions (post-reset tail dropped)
    new_obs = {"x": np.arange(8, dtype=np.float32).reshape(4, 2, 1)}
    new_act = np.arange(8).reshape(4, 2)
    done = np.array([[0, 0], [1, 0], [0, 0], [0, 1]], bool)
    obs2, act2, w2 = dagger.aggregate(({"x": obs["x"][:, :1]}, act),
                                      new_obs, new_act, done, weight=3.0)
    assert act2.shape[0] == 5 + 6
    # lane 0 keeps t=0,1; lane 1 keeps t=0..3
    assert sorted(act2[5:].tolist()) == [0, 1, 2, 3, 5, 7]
    # initial aggregate keeps weight 1, relabels get the boost
    assert w2[:5].tolist() == [1.0] * 5 and w2[5:].tolist() == [3.0] * 6


def test_pinned_expert_labels():
    """Preferences with a pin get the fixed action; others keep MPC labels."""
    tables = synthetic_sim_tables(num_videos=2, num_users=2, num_traces=2,
                                  num_chunks=12, num_qoe=2)
    etables = build_expert_tables(tables)
    policy = MansyActorCritic(hidden_dim=16)
    samples = jnp.asarray(generate_environment_samples(2, 2, 2, 2))
    n_lanes = 8
    apply_fn = lambda p, o: policy.apply({"params": p}, o)

    from mansy_immersivevideostreaming_tpu.sim.env import observe_mansy, reset_env
    states = jax.vmap(lambda i: reset_env(tables, samples, i, n_lanes))(
        jnp.arange(n_lanes))
    obs0 = jax.vmap(lambda s: observe_mansy(tables, s))(states)
    params = policy.init(jax.random.PRNGKey(0), obs0)["params"]

    free = dagger.make_dagger_collector(apply_fn, tables, etables,
                                        horizon=1, n_steps=6)
    pinned = dagger.make_dagger_collector(apply_fn, tables, etables,
                                          horizon=1, n_steps=6,
                                          pin_table=np.array([-1, 10]))
    _, act_free, _ = free(params, samples[:n_lanes], jax.random.PRNGKey(1))
    _, act_pin, _ = pinned(params, samples[:n_lanes], jax.random.PRNGKey(1))
    qoe_ids = np.asarray(samples[:n_lanes, 3])
    act_free, act_pin = np.asarray(act_free), np.asarray(act_pin)
    # same rollout RNG: unpinned preference labels are untouched
    assert (act_pin[:, qoe_ids == 0] == act_free[:, qoe_ids == 0]).all()
    # pinned preference labels are the fixed action everywhere
    assert (act_pin[:, qoe_ids == 1] == 10).all()
    assert (qoe_ids == 1).any() and (qoe_ids == 0).any()


def test_dagger_round_improves_ce_on_synthetic():
    tables = synthetic_sim_tables(num_videos=2, num_users=2, num_traces=2,
                                  num_chunks=12, num_qoe=2)
    etables = build_expert_tables(tables)
    policy = MansyActorCritic(hidden_dim=16)
    samples = jnp.asarray(generate_environment_samples(2, 2, 2, 2))
    n_lanes = 4
    collect = dagger.make_dagger_collector(
        lambda p, o: policy.apply({"params": p}, o), tables, etables,
        horizon=1, n_steps=6)

    from mansy_immersivevideostreaming_tpu.sim.env import observe_mansy, reset_env
    states = jax.vmap(lambda i: reset_env(tables, samples, i, n_lanes))(
        jnp.arange(n_lanes))
    obs0 = jax.vmap(lambda s: observe_mansy(tables, s))(states)
    params = policy.init(jax.random.PRNGKey(0), obs0)["params"]

    obs, expert_act, done = collect(params, samples[:n_lanes],
                                    jax.random.PRNGKey(1))
    assert expert_act.shape == (6, n_lanes)
    assert int(expert_act.max()) < 15

    dataset = dagger.aggregate(
        ({k: np.zeros((0,) + v.shape[2:], np.float32) for k, v in obs.items()},
         np.zeros(0, np.int32)),
        jax.device_get(obs), np.asarray(expert_act), np.asarray(done))
    assert dataset[1].shape[0] > 0

    apply_fn = lambda p, o: policy.apply({"params": p}, o)
    opt = ppo_mod.make_optimizer(1e-3)
    params2, _, losses = dagger.bc_on_aggregate(
        apply_fn, opt, params, opt.init(params), dataset, steps=20,
        batch_size=64, key=jax.random.PRNGKey(2))
    assert losses[-1] < losses[0]


def test_class_balance_weights_rebalance_within_pref_only():
    # two preferences; pref A has a 90/10 class skew, pref B is uniform
    n_a, n_b = 200, 100
    qoe = np.concatenate([np.tile([7, 1, 1], (n_a, 1)),
                          np.tile([1, 7, 1], (n_b, 1))]).astype(np.float32)
    act = np.concatenate([
        np.array([3] * 180 + [14] * 20),   # pref A: 90% a3, 10% a14
        np.array([10] * 50 + [3] * 50),    # pref B: balanced
    ]).astype(np.int32)
    mult = dagger.class_balance_weights({"qoe_weight": qoe}, act, beta=1.0)
    a, b = mult[:n_a], mult[n_a:]
    # within-pref mean stays 1 -> between-pref sampling mass is unchanged
    assert np.isclose(a.mean(), 1.0) and np.isclose(b.mean(), 1.0)
    # full balance: every class gets equal total mass within the pref
    assert np.isclose(a[act[:n_a] == 3].sum(), a[act[:n_a] == 14].sum())
    # rare class transitions are upweighted, common downweighted
    assert a[act[:n_a] == 14].mean() > 1.0 > a[act[:n_a] == 3].mean()
    # uniform pref is untouched
    assert np.allclose(b, 1.0)
    # beta=0 is a no-op
    assert np.allclose(
        dagger.class_balance_weights({"qoe_weight": qoe}, act, beta=0.0), 1.0)


def test_margin_collector_and_filtering():
    """with_margin: pinned prefs get +inf, unpinned get finite nonneg margins,
    labels match the margin-free collector; extra_keep filters aggregation."""
    tables = synthetic_sim_tables(num_videos=2, num_users=2, num_traces=2,
                                  num_chunks=12, num_qoe=2)
    etables = build_expert_tables(tables)
    policy = MansyActorCritic(hidden_dim=16)
    samples = jnp.asarray(generate_environment_samples(2, 2, 2, 2))
    n_lanes = 8
    apply_fn = lambda p, o: policy.apply({"params": p}, o)

    from mansy_immersivevideostreaming_tpu.sim.env import observe_mansy, reset_env
    states = jax.vmap(lambda i: reset_env(tables, samples, i, n_lanes))(
        jnp.arange(n_lanes))
    obs0 = jax.vmap(lambda s: observe_mansy(tables, s))(states)
    params = policy.init(jax.random.PRNGKey(0), obs0)["params"]

    plain = dagger.make_dagger_collector(apply_fn, tables, etables,
                                         horizon=2, n_steps=6,
                                         pin_table=np.array([-1, 10]))
    marged = dagger.make_dagger_collector(apply_fn, tables, etables,
                                          horizon=2, n_steps=6,
                                          pin_table=np.array([-1, 10]),
                                          with_margin=True)
    _, act_a, _ = plain(params, samples[:n_lanes], jax.random.PRNGKey(1))
    obs, act_b, done, margin = marged(params, samples[:n_lanes],
                                      jax.random.PRNGKey(1))
    act_a, act_b = np.asarray(act_a), np.asarray(act_b)
    margin = np.asarray(margin)
    assert (act_a == act_b).all()
    assert margin.shape == act_b.shape
    qoe_ids = np.asarray(samples[:n_lanes, 3])
    assert np.isinf(margin[:, qoe_ids == 1]).all()      # pinned: always kept
    free = margin[:, qoe_ids == 0]
    assert np.isfinite(free).all() and (free >= 0).all()

    # extra_keep drops exactly the masked-out transitions
    empty = ({k: np.zeros((0,) + v.shape[2:], np.float32)
              for k, v in obs.items()}, np.zeros(0, np.int32))
    base = dagger.aggregate(empty, jax.device_get(obs), act_b,
                            np.asarray(done))
    # threshold above every finite margin: only the (+inf) pinned labels stay
    thr = float(free.max()) + 1.0
    filt = dagger.aggregate(empty, jax.device_get(obs), act_b,
                            np.asarray(done), extra_keep=margin >= thr)
    assert 0 < filt[1].shape[0] < base[1].shape[0]
    assert (filt[1] == 10).all()  # surviving labels are the pin action
