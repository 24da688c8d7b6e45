"""Per-preference action histograms (+ entropy / cross-policy KL) for a
MANSY policy checkpoint.

The round-3 verdict's "behaviorally distinct modes" criterion and the PPO
regression diagnosis both need to see WHAT a policy does per preference,
not just its QoE.  This rolls the policy deterministically over the seen
test grid (or valid split) with an action-recording scan and prints, per
preference: the 15-bin action histogram, the mean policy entropy, and —
when ``--other`` is given — the mean KL(policy || other) over visited
states (how hard a fine-tune pulled away from its anchor, per preference).

Reference analogue: none (the reference logs only QoE CSVs,
``bitrate_selection/envs/mansy_env.py:271-290``).

Usage::

    python benchmarks/action_histogram.py artifacts/round3/dagger_v7.ckpt \
        [--other artifacts/round3/mansy_v7_policy.ckpt] [--split valid]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.models.abr_nets import MansyActorCritic
from mansy_immersivevideostreaming_tpu.rl import runner
from mansy_immersivevideostreaming_tpu.sim.env import (
    observe_mansy, reset_env, step_env,
)
from mansy_immersivevideostreaming_tpu.utils.checkpoint import (
    restore_checkpoint,
)
from mansy_immersivevideostreaming_tpu.utils.prng import (
    enable_compilation_cache, seed_everything,
)


def collect_actions(apply_fn, params, other_params, tables, samples, n_steps):
    """[T, N] actions + per-step entropy + (optional) KL to ``other``,
    deterministic (argmax) rollout with auto-reset; also first-done masks."""

    @jax.jit
    def run(params, other_params, sub):
        n = sub.shape[0]
        states = jax.vmap(lambda i: reset_env(tables, sub, i, n))(
            jnp.arange(n))

        def body(states, _):
            obs = jax.vmap(lambda s: observe_mansy(tables, s))(states)
            logits, _ = apply_fn(params, obs)
            logp = jax.nn.log_softmax(logits)
            entropy = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
            if other_params is not None:
                o_logits, _ = apply_fn(other_params, obs)
                o_logp = jax.nn.log_softmax(o_logits)
                kl = jnp.sum(jnp.exp(logp) * (logp - o_logp), axis=-1)
            else:
                kl = jnp.zeros_like(entropy)
            action = jnp.argmax(logits, axis=-1)
            new_states, _, done, _ = jax.vmap(
                lambda s, a: step_env(tables, sub, s, a, n, False)
            )(states, action)
            return new_states, (action, entropy, kl, done, states.qoe_id)

        _, out = jax.lax.scan(body, states, None, length=n_steps)
        return out

    acts, ents, kls, dones, qids = jax.device_get(
        run(params, other_params, samples))
    # keep steps up to and including each lane's first episode end
    first_done = np.zeros_like(dones)
    seen = np.zeros(dones.shape[1], bool)
    keep = np.zeros_like(dones)
    for t in range(dones.shape[0]):
        keep[t] = ~seen
        first_done[t] = dones[t] & ~seen
        seen |= dones[t]
    return acts, ents, kls, qids, keep


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt")
    p.add_argument("--other", default=None,
                   help="second checkpoint: also report KL(ckpt || other)")
    p.add_argument("--split", default="test", choices=["test", "valid"])
    p.add_argument("--qoe-mode", default="train", choices=["train", "test"],
                   help="preference set (train = seen grid, test = unseen)")
    p.add_argument("--episodes-per-pref", type=int, default=64)
    p.add_argument("--hidden-dim", type=int, default=128)
    p.add_argument("--obs-action-values", action="store_true")
    p.add_argument("--av-logit-prior", type=float, default=0.0)
    p.add_argument("--exact-action-values", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train-dataset", default="Jin2022")
    p.add_argument("--network-dataset", default="4G")
    p.add_argument("--device", default=None)
    args = p.parse_args(argv)
    if args.device:
        jax.config.update("jax_platforms", args.device)
    enable_compilation_cache()

    config = load_config(None)
    key = seed_everything(args.seed)
    qoe_weights = list(config.qoe_split[args.qoe_mode])
    tables, samples, *_ = runner.build_split(
        config, args.train_dataset, args.network_dataset, args.split,
        qoe_weights, test_grid=True)
    samples = np.asarray(samples)
    # stratified subsample: episodes-per-pref per preference
    rng = np.random.default_rng(args.seed)
    picked = []
    for q in range(len(qoe_weights)):
        rows = np.nonzero(samples[:, 3] == q)[0]
        picked.append(rng.choice(rows, min(args.episodes_per_pref, len(rows)),
                                 replace=False))
    sub = jnp.asarray(samples[np.concatenate(picked)])
    if args.exact_action_values:
        from mansy_immersivevideostreaming_tpu.cli.run_expert import (
            get_expert_tables)
        from mansy_immersivevideostreaming_tpu.sim.expert import (
            attach_action_values)
        tables = attach_action_values(
            tables, get_expert_tables(tables, None, False))

    policy = MansyActorCritic(hidden_dim=args.hidden_dim,
                              action_space=config.action_space,
                              use_action_values=(args.obs_action_values
                                                 or args.exact_action_values),
                              av_logit_prior=args.av_logit_prior)
    obs0 = jax.vmap(lambda s: observe_mansy(tables, s))(
        jax.vmap(lambda i: reset_env(tables, sub, i, sub.shape[0]))(
            jnp.arange(sub.shape[0])))
    params = policy.init(key, obs0)["params"]
    params = restore_checkpoint(args.ckpt, params)
    other = None
    if args.other:
        other = restore_checkpoint(
            args.other, jax.tree_util.tree_map(jnp.copy, params))
    apply_fn = lambda p, o: policy.apply({"params": p}, o)

    n_steps = runner.episode_step_bound(tables)
    acts, ents, kls, qids, keep = collect_actions(
        apply_fn, params, other, tables, sub, n_steps)

    print(f"{args.ckpt} | split={args.split} qoe={args.qoe_mode} | "
          f"{sub.shape[0]} episodes x <= {n_steps} chunks (argmax actions)")
    header = "pref            " + " ".join(f"a{a:<4d}" for a in range(15))
    print(header)
    for q, w in enumerate(qoe_weights):
        m = keep & (qids == q)
        h = np.bincount(acts[m], minlength=15) / max(m.sum(), 1)
        row = " ".join(f"{x:5.2f}" for x in h)
        extra = f" | H {ents[m].mean():.3f}"
        if args.other:
            extra += f" | KL {kls[m].mean():.3f}"
        print(f"{str(w):<16s}{row}{extra}")


if __name__ == "__main__":
    main()
