"""Unit tests for the RL core: GAE vs host recursion, PPO/A2C smoke, identifier."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.rl.gae import compute_gae
from mansy_immersivevideostreaming_tpu.rl.types import RunningStat, Transition
from mansy_immersivevideostreaming_tpu.rl import ppo as ppo_mod
from mansy_immersivevideostreaming_tpu.rl import a2c as a2c_mod
from mansy_immersivevideostreaming_tpu.rl.identifier import (
    identifier_rewards, shape_rewards, train_identifier_on_buffer,
)
from mansy_immersivevideostreaming_tpu.models.abr_nets import (
    MansyActorCritic, QoEIdentifier, SimpleActorCritic,
)


def host_gae(r, d, v, last_v, gamma, lam):
    T, N = r.shape
    adv = np.zeros_like(r)
    nxt = np.zeros(N)
    v_next = np.concatenate([v[1:], last_v[None]], axis=0)
    for t in reversed(range(T)):
        nd = 1.0 - d[t]
        delta = r[t] + gamma * v_next[t] * nd - v[t]
        nxt = delta + gamma * lam * nd * nxt
        adv[t] = nxt
    return adv, adv + v


def test_gae_matches_host():
    rng = np.random.default_rng(0)
    T, N = 20, 4
    r = rng.normal(size=(T, N)).astype(np.float32)
    d = (rng.random((T, N)) < 0.1).astype(np.float32)
    v = rng.normal(size=(T, N)).astype(np.float32)
    lv = rng.normal(size=N).astype(np.float32)
    adv, ret = compute_gae(jnp.asarray(r), jnp.asarray(d), jnp.asarray(v),
                           jnp.asarray(lv), 0.95, 0.95)
    wadv, wret = host_gae(r, d, v, lv, 0.95, 0.95)
    np.testing.assert_allclose(np.asarray(adv), wadv, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), wret, rtol=1e-5, atol=1e-5)


def _mansy_obs(rng, B):
    return {
        "throughput": jnp.asarray(rng.random((B, 8), np.float32)),
        "next_chunk_size": jnp.asarray(rng.random((B, 5, 64), np.float32)),
        "next_chunk_quality": jnp.asarray(rng.random((B, 5, 64), np.float32)),
        "pred_viewport": jnp.asarray(rng.random((B, 64), np.float32)),
        "rates_inside": jnp.asarray(rng.random((B, 8), np.float32)),
        "rates_outside": jnp.asarray(rng.random((B, 8), np.float32)),
        "viewport_acc": jnp.asarray(rng.random((B, 8), np.float32)),
        "buffer": jnp.asarray(rng.random((B, 1), np.float32)),
        "qoe_weight": jnp.asarray(rng.random((B, 3), np.float32)),
        "action_one_hot": jnp.asarray(rng.random((B, 15), np.float32)),
        "past_viewport_qualities": jnp.asarray(rng.random((B, 8), np.float32)),
        "past_quality_variances": jnp.asarray(rng.random((B, 8), np.float32)),
        "past_rebuffering": jnp.asarray(rng.random((B, 8), np.float32)),
    }


def _traj(rng, apply_fn, params, T, N):
    obs = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (T,) + (1,) * x.ndim), _mansy_obs(rng, N))
    flat = jax.tree_util.tree_map(lambda x: x.reshape((T * N,) + x.shape[2:]), obs)
    logits, values = apply_fn(params, flat)
    action = jnp.argmax(logits, -1).reshape(T, N)
    logp = jax.nn.log_softmax(logits)
    lp = jnp.take_along_axis(logp, action.reshape(-1)[:, None], axis=-1)[:, 0]
    return Transition(
        obs=obs, action=action, log_prob=lp.reshape(T, N),
        value=values.reshape(T, N),
        reward=jnp.asarray(rng.normal(size=(T, N)).astype(np.float32)),
        done=jnp.asarray(rng.random((T, N)) < 0.05))


def test_ppo_update_runs_and_improves_nothing_nan():
    rng = np.random.default_rng(1)
    policy = MansyActorCritic(hidden_dim=32)
    params = policy.init(jax.random.PRNGKey(0), _mansy_obs(rng, 2))["params"]
    apply_fn = lambda p, o: policy.apply({"params": p}, o)
    opt = ppo_mod.make_optimizer(5e-4)
    opt_state = opt.init(params)
    cfg = ppo_mod.PPOConfig(minibatch=16, repeat=2)
    T, N = 8, 4
    traj = _traj(rng, apply_fn, params, T, N)
    params2, opt_state, rms, metrics = ppo_mod.ppo_update(
        apply_fn, opt, cfg, params, opt_state, traj, traj.reward,
        jnp.zeros(N), RunningStat.init(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params actually changed
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, params2, params2), 0.0)
    assert float(rms.count) > 1


def test_a2c_update_runs():
    rng = np.random.default_rng(2)
    policy = SimpleActorCritic(hidden_dim=32)
    obs = {
        "throughput": jnp.asarray(rng.random((2, 8), np.float32)),
        "chunk_sizes": jnp.asarray(rng.random((2, 5, 64), np.float32)),
        "rebuffer": jnp.asarray(rng.random((2, 1), np.float32)),
        "last_bitrates": jnp.asarray(rng.random((2, 2), np.float32)),
        "pred_viewport": jnp.asarray(rng.random((2, 64), np.float32)),
    }
    params = policy.init(jax.random.PRNGKey(0), obs)["params"]
    apply_fn = lambda p, o: policy.apply({"params": p}, o)
    T, N = 6, 2
    tobs = jax.tree_util.tree_map(lambda x: jnp.tile(x[None], (T,) + (1,) * x.ndim), obs)
    logits, values = apply_fn(params, jax.tree_util.tree_map(
        lambda x: x.reshape((T * N,) + x.shape[2:]), tobs))
    traj = Transition(
        obs=tobs, action=jnp.zeros((T, N), jnp.int32),
        log_prob=jnp.zeros((T, N)), value=values.reshape(T, N),
        reward=jnp.ones((T, N)), done=jnp.zeros((T, N), bool))
    opt = a2c_mod.make_optimizer(1e-4)
    params2, _, rms, metrics = a2c_mod.a2c_update(
        apply_fn, opt, a2c_mod.A2CConfig(), params, opt.init(params), traj,
        jnp.zeros(N), RunningStat.init(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_identifier_training_reduces_loss():
    rng = np.random.default_rng(3)
    ident = QoEIdentifier(hidden_dim=32)
    obs = _mansy_obs(rng, 64)
    # make qoe_weight a deterministic function of a visible feature
    w = jax.nn.softmax(obs["buffer"] * jnp.asarray([[1.0, 2.0, 3.0]]), axis=-1)
    obs["qoe_weight"] = w
    params = ident.init(jax.random.PRNGKey(0), obs)["params"]
    apply_fn = lambda p, o: ident.apply({"params": p}, o)
    opt = ppo_mod.make_optimizer(1e-3)
    opt_state = opt.init(params)
    losses_hist = []
    for i in range(5):
        params, opt_state, losses, valid = train_identifier_on_buffer(
            apply_fn, opt, params, opt_state, obs, jax.random.PRNGKey(i), 2)
        losses_hist.append(float(losses[-1]))
    assert losses_hist[-1] < losses_hist[0]
    r = identifier_rewards(apply_fn, params, obs)
    assert r.shape == (64,)
    shaped = shape_rewards(jnp.ones(64), r, 0.5)
    assert np.isfinite(np.asarray(shaped)).all()


def test_running_stat():
    rs = RunningStat.init()
    data = np.random.default_rng(4).normal(3.0, 2.0, (10, 100)).astype(np.float32)
    for chunk in data:
        rs = rs.update(jnp.asarray(chunk))
    assert float(rs.mean) == pytest.approx(3.0, abs=0.2)
    assert float(jnp.sqrt(rs.var)) == pytest.approx(2.0, abs=0.2)


def test_center_rewards_by_preference():
    """Per-group centering removes constant per-preference offsets and leaves
    within-group variation intact."""
    import jax.numpy as jnp
    from mansy_immersivevideostreaming_tpu.rl.identifier import (
        center_rewards_by_preference)

    prefs = jnp.asarray([[7, 1, 1], [1, 7, 1]], jnp.float32)
    prefs = prefs / prefs.sum(axis=1, keepdims=True)
    # lanes 0-1 -> pref 0 with rewards 0.9/1.1; lanes 2-3 -> pref 1, 0.4/0.6
    id_rew = jnp.asarray([[0.9, 1.1, 0.4, 0.6]] * 3)  # [T=3, N=4]
    w = jnp.stack([jnp.stack([prefs[0], prefs[0], prefs[1], prefs[1]])] * 3)
    out = np.asarray(center_rewards_by_preference(id_rew, w, prefs))
    np.testing.assert_allclose(out, [[-0.1, 0.1, -0.1, 0.1]] * 3, atol=1e-6)


def test_generate_demo_samples_balanced():
    from mansy_immersivevideostreaming_tpu.sim.env import generate_demo_samples

    s = generate_demo_samples(18, 45, 24, 4, 1440, seed=1)
    assert s.shape == (1440, 4)
    for col, n in zip(s.T, (18, 45, 24, 4)):
        cnt = np.bincount(col, minlength=n)
        assert cnt.min() >= 1440 // n - 1 and cnt.max() <= 1440 // n + 1


def test_generate_demo_samples_qoe_probs():
    from mansy_immersivevideostreaming_tpu.sim.env import generate_demo_samples

    s = generate_demo_samples(4, 4, 4, 4, 400, seed=2,
                              qoe_probs=[0.0, 0.0, 0.0, 1.0])
    assert (s[:, 3] == 3).all()
    s = generate_demo_samples(4, 4, 4, 4, 4000, seed=3,
                              qoe_probs=[1.0, 1.0, 1.0, 5.0])
    cnt = np.bincount(s[:, 3], minlength=4)
    assert cnt[3] > 2 * cnt[0]  # focused preference dominates


def test_ppo_per_pref_adv_norm():
    """Per-preference advantage normalization: runs, finite, and actually
    changes the update relative to global normalization (a group with a much
    larger advantage scale no longer dominates)."""
    rng = np.random.default_rng(7)
    policy = MansyActorCritic(hidden_dim=32)
    params = policy.init(jax.random.PRNGKey(0), _mansy_obs(rng, 2))["params"]
    apply_fn = lambda p, o: policy.apply({"params": p}, o)
    opt = ppo_mod.make_optimizer(5e-4)
    T, N = 8, 4
    traj = _traj(rng, apply_fn, params, T, N)
    # lanes 0-1 are pref 0 with 100x reward scale; lanes 2-3 pref 1
    rewards = traj.reward * jnp.asarray([100.0, 100.0, 1.0, 1.0])
    pref_ids = jnp.tile(jnp.asarray([0, 0, 1, 1], jnp.int32), (T, 1))

    def run_update(cfg):
        return ppo_mod.ppo_update(
            apply_fn, opt, cfg, jax.tree_util.tree_map(jnp.copy, params),
            opt.init(params), traj, rewards, jnp.zeros(N), RunningStat.init(),
            jax.random.PRNGKey(1), pref_ids=pref_ids)

    cfg_pp = ppo_mod.PPOConfig(minibatch=32, repeat=1,
                               norm_adv_per_pref=True, n_prefs=2)
    cfg_gl = ppo_mod.PPOConfig(minibatch=32, repeat=1)
    p_pp, _, _, m_pp = run_update(cfg_pp)
    p_gl, _, _, m_gl = run_update(cfg_gl)
    assert np.isfinite(float(m_pp["loss"])) and np.isfinite(float(m_gl["loss"]))
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, p_pp, p_gl), 0.0)
    assert diff > 0.0


def test_ppo_per_pref_kl_coef():
    """Vector kl_coef: a uniform vector reproduces the scalar update exactly,
    and raising one preference's coefficient changes the update (its lanes'
    anchor KL is weighted harder)."""
    rng = np.random.default_rng(11)
    policy = MansyActorCritic(hidden_dim=32)
    params = policy.init(jax.random.PRNGKey(0), _mansy_obs(rng, 2))["params"]
    apply_fn = lambda p, o: policy.apply({"params": p}, o)
    opt = ppo_mod.make_optimizer(5e-4)
    T, N = 8, 4
    traj = _traj(rng, apply_fn, params, T, N)
    pref_ids = jnp.tile(jnp.asarray([0, 0, 1, 1], jnp.int32), (T, 1))
    anchor = jnp.asarray(rng.normal(size=(T, N, 15)), jnp.float32)
    cfg = ppo_mod.PPOConfig(minibatch=32, repeat=1, n_prefs=2)

    def run_update(kl_coef):
        return ppo_mod.ppo_update(
            apply_fn, opt, cfg, jax.tree_util.tree_map(jnp.copy, params),
            opt.init(params), traj, traj.reward, jnp.zeros(N),
            RunningStat.init(), jax.random.PRNGKey(1),
            anchor_logits=anchor, kl_coef=kl_coef, pref_ids=pref_ids)

    p_s, _, _, m_s = run_update(0.7)
    p_u, _, _, m_u = run_update(jnp.asarray([0.7, 0.7], jnp.float32))
    p_w, _, _, m_w = run_update(jnp.asarray([0.7, 5.0], jnp.float32))
    assert all(np.isfinite(float(m["loss"])) for m in (m_s, m_u, m_w))
    same = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).max()),
        jax.tree_util.tree_map(lambda a, b: a - b, p_s, p_u), 0.0)
    assert same < 1e-6, f"uniform vector must equal scalar, diff {same}"
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, p_s, p_w), 0.0)
    assert diff > 0.0


def test_pretrain_identifier_on_demos_reduces_loss():
    from mansy_immersivevideostreaming_tpu.rl.identifier import (
        pretrain_identifier_on_demos)

    rng = np.random.default_rng(9)
    ident = QoEIdentifier(hidden_dim=32)
    obs = _mansy_obs(rng, 256)
    obs["qoe_weight"] = jax.nn.softmax(
        obs["buffer"] * jnp.asarray([[1.0, 2.0, 3.0]]), axis=-1)
    params = ident.init(jax.random.PRNGKey(0), obs)["params"]
    apply_fn = lambda p, o: ident.apply({"params": p}, o)
    opt = ppo_mod.make_optimizer(1e-3)
    params, _, losses, valid = pretrain_identifier_on_demos(
        apply_fn, opt, params, opt.init(params),
        jax.device_get(obs), steps=30, batch_size=64,
        key=jax.random.PRNGKey(1))
    assert losses[-1] < losses[0]
    assert np.isfinite(valid)
