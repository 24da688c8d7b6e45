"""Tests for the derived causal-MPC action-value observation features
(``models/abr_nets.py:causal_action_values`` — round-4 extension)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_data

import mansy_immersivevideostreaming_tpu as mansy
from mansy_immersivevideostreaming_tpu.models.abr_nets import (
    MansyActorCritic, causal_action_values,
)
from mansy_immersivevideostreaming_tpu.ops.allocation import ACTION_TO_RATES
from _alloc_oracle import oracle_allocate

CFG = mansy.default_config()


def _random_obs(rng, batch=4, K=8, R=5, T=64, A=15):
    vp = (rng.random((batch, T)) < 0.3).astype(np.float32)
    vp[:, 0] = 1.0  # never empty
    thpt = rng.random((batch, K)).astype(np.float32)
    thpt[0, :] = 0.0  # episode start: empty history -> bw prior
    one_hot = np.zeros((batch, A), np.float32)
    one_hot[np.arange(1, batch), rng.integers(0, A, batch - 1)] = 1.0
    w = rng.random((batch, 3)).astype(np.float32) + 0.1
    w /= w.sum(-1, keepdims=True)
    return {
        "throughput": thpt,
        "next_chunk_size": rng.random((batch, R, T)).astype(np.float32),
        "next_chunk_quality": rng.random((batch, R, T)).astype(np.float32),
        "pred_viewport": vp,
        "rates_inside": rng.random((batch, K)).astype(np.float32),
        "rates_outside": rng.random((batch, K)).astype(np.float32),
        "viewport_acc": rng.random((batch, K)).astype(np.float32),
        "buffer": rng.random((batch, 1)).astype(np.float32),
        "qoe_weight": w,
        "action_one_hot": one_hot,
        "past_viewport_qualities": rng.random((batch, K)).astype(np.float32),
        "past_quality_variances": rng.random((batch, K)).astype(np.float32),
        "past_rebuffering": rng.random((batch, K)).astype(np.float32),
    }


def _host_action_values(obs):
    """Pure-numpy mirror of causal_action_values (deque-BFS allocation)."""
    B, A = obs["throughput"].shape[0], ACTION_TO_RATES.shape[0]
    out = np.zeros((B, A + 1), np.float32)
    for b in range(B):
        thpt = obs["throughput"][b]
        nz = thpt > 0
        if nz.any():
            bw_hat = nz.sum() / np.sum(1.0 / thpt[nz])
        else:
            bw_hat = 0.5
        vp = obs["pred_viewport"][b]
        vp_sum = max(vp.sum(), 1e-6)
        buf = obs["buffer"][b, 0] * 5.0
        prev_q = obs["past_viewport_qualities"][b, 0]
        has_prev = obs["action_one_hot"][b].sum() > 0
        w = obs["qoe_weight"][b]
        t = np.arange(vp.shape[0])
        for a in range(A):
            ri, ro = ACTION_TO_RATES[a]
            versions = oracle_allocate(int(ri), int(ro), vp)
            size = obs["next_chunk_size"][b][versions, t].sum()
            q_tile = obs["next_chunk_quality"][b][versions, t]
            qual = np.sum(vp * q_tile) / vp_sum
            intra = np.sum(vp * np.abs(q_tile - qual)) / vp_sum
            rebuf = max(0.1 * size / max(bw_hat, 1e-6) - buf, 0.0)
            inter = abs(qual - prev_q) if has_prev else 0.0
            out[b, a] = w[0] * qual - w[1] * rebuf - w[2] * (intra + inter)
        out[b, A] = bw_hat
    return out


def test_action_values_match_host_oracle():
    rng = np.random.default_rng(7)
    obs = _random_obs(rng)
    got = np.asarray(causal_action_values(
        {k: jnp.asarray(v) for k, v in obs.items()}))
    want = _host_action_values(obs)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_actor_critic_with_action_values():
    rng = np.random.default_rng(3)
    obs = {k: jnp.asarray(v) for k, v in _random_obs(rng).items()}
    policy = MansyActorCritic(hidden_dim=32, action_space=15,
                              use_action_values=True)
    params = policy.init(jax.random.PRNGKey(0), obs)["params"]
    assert "action_values" in params["feature_net"]
    logits, value = policy.apply({"params": params}, obs)
    assert logits.shape == (4, 15) and value.shape == (4,)
    assert np.all(np.isfinite(np.asarray(logits)))
    # the plain net must be unchanged (no extra branch params)
    plain = MansyActorCritic(hidden_dim=32, action_space=15)
    pparams = plain.init(jax.random.PRNGKey(0), obs)["params"]
    assert "action_values" not in pparams["feature_net"]


def test_av_logit_prior_starts_as_causal_controller():
    """With a large beta the init policy's argmax equals the action-value
    argmax (the ~causal-h1 controller); with beta=0 logits are unchanged."""
    rng = np.random.default_rng(11)
    obs = {k: jnp.asarray(v) for k, v in _random_obs(rng, batch=32).items()}
    base = MansyActorCritic(hidden_dim=32, action_space=15)
    params = base.init(jax.random.PRNGKey(0), obs)["params"]

    prior = MansyActorCritic(hidden_dim=32, action_space=15,
                             av_logit_prior=50.0)
    # the prior adds no parameters: the same pytree applies to both
    pparams = prior.init(jax.random.PRNGKey(0), obs)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(pparams)

    logits0, _ = base.apply({"params": params}, obs)
    logits_p, _ = prior.apply({"params": params}, obs)
    av = causal_action_values(obs)[..., :15]
    agree = np.mean(np.argmax(np.asarray(logits_p), -1) == np.argmax(
        np.asarray(av), -1))
    assert agree >= 0.9, agree
    # beta=0 (the default) is bit-identical to the plain net
    zero = MansyActorCritic(hidden_dim=32, action_space=15,
                            av_logit_prior=0.0)
    logits_z, _ = zero.apply({"params": params}, obs)
    np.testing.assert_array_equal(np.asarray(logits0), np.asarray(logits_z))
    # gradients still flow to the MLP under the prior
    g = jax.grad(lambda p: prior.apply({"params": p}, obs)[0].sum())(params)
    assert float(jnp.abs(g["actor_out"]["kernel"]).sum()) > 0


@requires_data
def test_bw_hat_feature_matches_causal_expert_estimate():
    """The feature's bw_hat (normalized) == sim.expert.causal_bw_estimate
    (raw) on real env states, including the empty-history prior."""
    from mansy_immersivevideostreaming_tpu.sim import (
        build_sim_tables, reset_env, step_env,
    )
    from mansy_immersivevideostreaming_tpu.sim.env import observe_mansy
    from mansy_immersivevideostreaming_tpu.sim.expert import causal_bw_estimate

    tables = build_sim_tables(CFG, "Jin2022", "4G", videos=[1], users=[1],
                              traces=[0], qoe_weights=[[7, 1, 1]])
    samples = jnp.asarray([[0, 0, 0, 0]], jnp.int32)
    state = reset_env(tables, samples, jnp.int32(0), 1)
    for step in range(4):
        obs = observe_mansy(tables, state)
        av = causal_action_values({k: v[None] for k, v in obs.items()})
        got = float(av[0, -1]) * tables.max_throughput
        want = float(causal_bw_estimate(tables, state))
        assert got == pytest.approx(want, rel=1e-5)
        state, _, _, _ = step_env(tables, samples, state, jnp.int32(5), 1, False)


def _attached_synthetic(seed=0, perturb_pred=True):
    """Synthetic tables with pred != gt plus attached deployable av tables."""
    from mansy_immersivevideostreaming_tpu.sim.tables import synthetic_sim_tables
    from mansy_immersivevideostreaming_tpu.sim.expert import (
        attach_action_values, build_expert_tables,
    )
    tables = synthetic_sim_tables(seed=seed)
    if perturb_pred:
        rng = np.random.default_rng(seed + 1)
        pred = np.asarray(tables.pred).copy()
        flip = rng.random(pred.shape) < 0.15  # mispredict ~15% of tiles
        pred = np.where(flip, 1.0 - pred, pred).astype(np.float32)
        pred[..., 0] = 1.0  # never empty
        tables = tables._replace(pred=jnp.asarray(pred))
    etables = build_expert_tables(tables)
    return attach_action_values(tables, etables), etables


def test_deployable_tables_eval_on_pred_viewport():
    """dep_* == pred_* iff pred == gt; they diverge under misprediction."""
    from mansy_immersivevideostreaming_tpu.sim.tables import synthetic_sim_tables
    from mansy_immersivevideostreaming_tpu.sim.expert import build_expert_tables
    exact = build_expert_tables(synthetic_sim_tables(seed=3))  # pred == gt
    np.testing.assert_allclose(np.asarray(exact.dep_quality),
                               np.asarray(exact.pred_quality), rtol=1e-6)
    _, perturbed = _attached_synthetic(seed=3)
    assert not np.allclose(np.asarray(perturbed.dep_quality),
                           np.asarray(perturbed.pred_quality))


def test_exact_action_values_is_h1_search_objective():
    """obs['action_values'][:A] equals (up to the preference-weight
    normalization) the horizon-1 causal search totals of
    sim.expert.choose_action on the deployable tables — the feature IS the
    deployable h1 controller's objective, not an approximation."""
    from mansy_immersivevideostreaming_tpu.sim.env import (
        observe_mansy, reset_env, step_env,
    )
    from mansy_immersivevideostreaming_tpu.sim.expert import (
        action_sequences, causal_bw_estimate, deployable_etables,
    )
    tables, etables = _attached_synthetic(seed=5)
    dep = deployable_etables(etables)
    seqs = jnp.asarray(action_sequences(1, int(tables.action_space)))
    samples = jnp.asarray([[0, 0, 0, 0], [1, 1, 1, 1]], jnp.int32)
    rng = np.random.default_rng(9)
    A = int(tables.action_space)

    def h1_totals(state):
        """choose_action's per-sequence rollout totals, horizon 1."""
        bw_hat = causal_bw_estimate(tables, state)
        v, u, c = state.video, state.user, state.next_chunk
        w = tables.qoe_weights[state.qoe_id]
        size = dep.pred_size[v, u, c]
        q_n = dep.pred_quality[v, u, c] / tables.max_rate
        intra_n = dep.pred_intra[v, u, c] / tables.max_rate
        from mansy_immersivevideostreaming_tpu.sim.simulator import push_chunk
        _, rebuf = push_chunk(state.buf, tables.chunk_length, size / bw_hat)
        inter = jnp.where(state.qoe.has_prev,
                          jnp.abs(q_n - state.qoe.prev_quality), 0.0)
        return w[0] * q_n - w[1] * rebuf - w[2] * (intra_n + inter)

    for lane in range(2):
        state = reset_env(tables, samples, jnp.int32(lane), 1)
        for step in range(6):
            obs = observe_mansy(tables, state)
            assert "action_values" in obs
            av = np.asarray(obs["action_values"])
            w_sum = float(jnp.sum(tables.qoe_weights[state.qoe_id]))
            np.testing.assert_allclose(av[:A] * w_sum,
                                       np.asarray(h1_totals(state)),
                                       rtol=1e-4, atol=1e-5)
            # and argmax(av) is exactly the deployable causal-h1 expert move
            from mansy_immersivevideostreaming_tpu.sim.expert import choose_action
            act = choose_action(tables, dep, state, seqs,
                                bw_hat=causal_bw_estimate(tables, state))
            assert int(np.argmax(av[:A])) == int(act)
            state, _, _, _ = step_env(tables, samples, state,
                                      jnp.int32(rng.integers(0, A)), 1, False)


def test_net_consumes_exact_field_checkpoint_compatible():
    """With obs['action_values'] present the net uses it (no derived
    recompute) and the param tree is identical to the derived-feature net —
    checkpoints are interchangeable."""
    rng = np.random.default_rng(13)
    obs = {k: jnp.asarray(v) for k, v in _random_obs(rng).items()}
    derived_net = MansyActorCritic(hidden_dim=32, action_space=15,
                                   use_action_values=True)
    params = derived_net.init(jax.random.PRNGKey(0), obs)["params"]

    exact = dict(obs)
    exact["action_values"] = jnp.asarray(
        np.random.default_rng(14).random((4, 16)), jnp.float32)
    params_e = derived_net.init(jax.random.PRNGKey(0), exact)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_e)

    la, _ = derived_net.apply({"params": params}, obs)
    lb, _ = derived_net.apply({"params": params}, exact)
    assert not np.allclose(np.asarray(la), np.asarray(lb))  # field is used
    # feeding the derived values through the exact field reproduces the
    # derived-net output bit-exactly
    same = dict(obs)
    same["action_values"] = causal_action_values(obs)
    lc, _ = derived_net.apply({"params": params}, same)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lc))


def test_expert_cache_schema_guard(tmp_path):
    """A pre-dep-tables 6-entry cache payload triggers a rebuild instead of a
    constructor crash."""
    import pickle
    from mansy_immersivevideostreaming_tpu.sim.tables import synthetic_sim_tables
    from mansy_immersivevideostreaming_tpu.cli.run_expert import (
        _tables_fingerprint, get_expert_tables,
    )
    tables = synthetic_sim_tables(seed=2)
    cache = str(tmp_path / "cache.pkl")
    stale = [np.zeros((1,), np.float32)] * 6  # old schema: 6 tables
    with open(cache, "wb") as f:
        pickle.dump({"fingerprint": _tables_fingerprint(tables),
                     "tables": stale}, f)
    et = get_expert_tables(tables, cache, refresh=False)
    assert et.dep_quality.shape == et.pred_quality.shape
    assert et.dep_quality.ndim == 4


def test_exact_action_values_acc_corrected_matches_controller():
    """With acc_correct on both sides, argmax of obs['action_values'][:A]
    equals the accuracy-corrected causal-h1 choose_action — the corrected
    feature IS the corrected controller's decision variable."""
    from mansy_immersivevideostreaming_tpu.sim.tables import synthetic_sim_tables
    from mansy_immersivevideostreaming_tpu.sim.env import (
        observe_mansy, reset_env, step_env, viewport_acc_estimate,
    )
    from mansy_immersivevideostreaming_tpu.sim.expert import (
        action_sequences, attach_action_values, build_expert_tables,
        causal_bw_estimate, choose_action,
    )
    tables = synthetic_sim_tables(seed=7)
    rng = np.random.default_rng(8)
    pred = np.asarray(tables.pred).copy()
    flip = rng.random(pred.shape) < 0.15
    pred = np.where(flip, 1.0 - pred, pred).astype(np.float32)
    pred[..., 0] = 1.0
    tables = tables._replace(pred=jnp.asarray(pred))
    etables = build_expert_tables(tables)
    tables = attach_action_values(tables, etables, acc_correct=True)
    assert tables.av_out_quality is not None
    seqs = jnp.asarray(action_sequences(1, int(tables.action_space)))
    samples = jnp.asarray([[0, 0, 0, 0], [1, 1, 1, 1]], jnp.int32)

    for lane in range(2):
        state = reset_env(tables, samples, jnp.int32(lane), 1)
        for _ in range(6):
            obs = observe_mansy(tables, state)
            av = np.asarray(obs["action_values"])[: int(tables.action_space)]
            want = int(choose_action(
                tables, etables, state, seqs,
                bw_hat=causal_bw_estimate(tables, state),
                acc_hat=viewport_acc_estimate(state.past_acc)))
            assert int(np.argmax(av)) == want
            state, _, _, _ = step_env(tables, samples, state, jnp.int32(3),
                                      1, False)
