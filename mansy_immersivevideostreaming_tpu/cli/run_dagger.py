"""DAgger CLI: aggregate MPC-expert labels on the policy's own states.

Extension beyond the reference (see ``rl/dagger.py``).  Starts from expert
demos (native or reference-tianshou pickles), optionally from a
behavior-cloned checkpoint, then alternates policy rollouts labeled by the
vmapped MPC expert with CE retraining on the aggregate.  The best policy by
valid-split mean return is saved in a ``run_mansy``-compatible checkpoint,
usable via ``run_mansy --test --policy-path ...``.

Example::

    python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
        --rounds 8 --lanes 32 --bc-steps 300 --horizon 4
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax

from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.cli.run_expert import get_expert_tables
from mansy_immersivevideostreaming_tpu.data.tianshou_compat import (
    load_demonstrations,
)
from mansy_immersivevideostreaming_tpu.models.abr_nets import MansyActorCritic
from mansy_immersivevideostreaming_tpu.rl import dagger, runner
from mansy_immersivevideostreaming_tpu.rl import ppo as ppo_mod
from mansy_immersivevideostreaming_tpu.sim.env import (
    generate_demo_samples, observe_mansy,
)
from mansy_immersivevideostreaming_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint, save_net_config,
)
from mansy_immersivevideostreaming_tpu.utils.prng import (
    enable_compilation_cache, seed_everything,
)


def dummy_obs(config, exact_action_values: bool = False):
    import jax.numpy as jnp
    obs = {
        "throughput": jnp.zeros((2, 8)), "next_chunk_size": jnp.zeros((2, 5, 64)),
        "next_chunk_quality": jnp.zeros((2, 5, 64)),
        "pred_viewport": jnp.zeros((2, 64)), "rates_inside": jnp.zeros((2, 8)),
        "rates_outside": jnp.zeros((2, 8)), "viewport_acc": jnp.zeros((2, 8)),
        "buffer": jnp.zeros((2, 1)), "qoe_weight": jnp.zeros((2, 3)),
        "action_one_hot": jnp.zeros((2, 15)),
        "past_viewport_qualities": jnp.zeros((2, 8)),
        "past_quality_variances": jnp.zeros((2, 8)),
        "past_rebuffering": jnp.zeros((2, 8)),
    }
    if exact_action_values:
        obs["action_values"] = jnp.zeros((2, config.action_space + 1))
    return obs


def run(args, config):
    import jax.numpy as jnp

    if args.qoe_train_ids is None:
        args.qoe_train_ids = list(range(len(config.qoe_split["train"])))
    key = seed_everything(args.seed)
    qoe_weights = [config.qoe_split["train"][i] for i in args.qoe_train_ids]
    if args.pref_interp > 0:
        # preference-interpolation augmentation (VERDICT r2 item 1): train the
        # cloned policy on a smooth manifold of preferences, not 4 points;
        # the MPC expert labels interpolated preferences exactly as well as
        # base ones (choose_action reads tables.qoe_weights[qoe_id])
        rng = np.random.default_rng(args.seed)
        base = np.asarray(qoe_weights, np.float64)
        coef = rng.dirichlet(np.full(len(qoe_weights), args.pref_interp_alpha),
                             size=args.pref_interp)
        qoe_weights = qoe_weights + [[float(x) for x in np.round(c @ base, 4)]
                                     for c in coef]
    qoe_probs = None
    if args.qoe_sample_weights is not None:
        w = list(args.qoe_sample_weights)
        if len(w) == len(args.qoe_train_ids) and len(qoe_weights) > len(w):
            # pad interp preferences with the mean base weight
            w = w + [float(np.mean(w))] * (len(qoe_weights) - len(w))
        assert len(w) == len(qoe_weights), (
            f"--qoe-sample-weights needs {len(args.qoe_train_ids)} (base) or "
            f"{len(qoe_weights)} (with interp) values, got {len(w)}")
        qoe_probs = w
        print("DAgger qoe sampling weights:", [round(x, 3) for x in w])
    print("DAgger QoE weights:", qoe_weights)
    models_dir = os.path.join(
        config.bs_models_dir, "expert",
        args.train_dataset + "_" + args.network_dataset,
        "qoe" + "_".join(map(str, args.qoe_train_ids)))
    cache_path = os.path.join(config.bs_models_dir, "expert",
                              f"{args.train_dataset}_cache.pkl")

    tables, _, videos, users, traces = runner.build_split(
        config, args.train_dataset, args.network_dataset, "train", qoe_weights)
    etables = get_expert_tables(tables, cache_path, False)
    vweights = [config.qoe_split["valid"][i] for i in args.qoe_train_ids]
    if args.valid_interp > 0:
        # interp-aware selection (the v21 structural gap: a train-preference
        # valid grid cannot arbitrate mid-simplex interpolation behavior, so
        # it picks the [4,4,1]-collapse point; see BASELINE round-5 v20/v21).
        # A distinct rng stream keeps these from duplicating the training
        # interp preferences — selection must measure generalization, not
        # memorization of the augmented training points.
        vrng = np.random.default_rng(args.seed + 9973)
        vbase = np.asarray(vweights, np.float64)
        vcoef = vrng.dirichlet(
            np.full(len(vweights), args.pref_interp_alpha),
            size=args.valid_interp)
        vweights = vweights + [[float(x) for x in np.round(c @ vbase, 4)]
                               for c in vcoef]
        print("Valid-grid interp preferences:",
              vweights[len(args.qoe_train_ids):])
    vtables, vsamples, vvideos, vusers, vtraces = runner.build_split(
        config, args.train_dataset, args.network_dataset, "valid", vweights)
    acc_obs = args.acc_correct or args.acc_correct_obs
    if args.exact_action_values:
        from mansy_immersivevideostreaming_tpu.sim.expert import (
            attach_action_values)
        tables = attach_action_values(tables, etables, acc_correct=acc_obs)
        vtables = attach_action_values(
            vtables, get_expert_tables(
                vtables, cache_path.replace("_cache", "_valid_cache"), False),
            acc_correct=acc_obs)

    demos_path = args.demos_path or os.path.join(models_dir,
                                                 "train_demonstrations.pkl")
    demos = list(load_demonstrations(demos_path).values())
    dataset = dagger.flatten_demos(demos)
    print(f"Aggregate init: {dataset[1].shape[0]} expert transitions "
          f"from {len(demos)} demos")

    policy = MansyActorCritic(hidden_dim=args.hidden_dim,
                              action_space=config.action_space,
                              use_action_values=(args.obs_action_values
                                                 or args.exact_action_values),
                              av_logit_prior=args.av_logit_prior)
    params = policy.init(key, dummy_obs(config,
                                        args.exact_action_values))["params"]
    if args.init_path:
        params = restore_checkpoint(args.init_path, params)
        print("Initialized policy from", args.init_path)
    apply_fn = lambda p, o: policy.apply({"params": p}, o)
    optimizer = ppo_mod.make_optimizer(args.lr)
    opt_state = optimizer.init(params)

    pin_table = None
    if args.pin_expert:
        pin_table = np.full(len(qoe_weights), -1, np.int32)
        for spec in args.pin_expert:
            idx, act = (int(x) for x in spec.split(":"))
            assert 0 <= idx < len(qoe_weights) and 0 <= act < config.action_space
            pin_table[idx] = act
        print("Expert pins (pref idx -> fixed action):",
              {i: int(a) for i, a in enumerate(pin_table) if a >= 0})

    n_steps = runner.episode_step_bound(tables)
    if args.deployable_expert:
        from mansy_immersivevideostreaming_tpu.sim.expert import (
            deployable_etables)
        etables = deployable_etables(etables)
    acc_correct = args.acc_correct
    if args.acc_correct_prefs is not None:
        # per-preference hybrid teacher: listed prefs get accuracy-corrected
        # relabel scoring, the rest keep gt-evaluated pred_* scoring
        acc_correct = np.zeros(len(qoe_weights), bool)
        for idx in args.acc_correct_prefs:
            assert 0 <= idx < len(qoe_weights)
            acc_correct[idx] = True
        print("Corrected-scoring prefs (idx):",
              [i for i, c in enumerate(acc_correct) if c])
    with_margin = (args.relabel_margin > 0
                   or args.relabel_margin_q is not None)
    collect = dagger.make_dagger_collector(apply_fn, tables, etables,
                                           args.horizon, n_steps, pin_table,
                                           causal=args.causal_expert,
                                           acc_correct=acc_correct,
                                           with_margin=with_margin)
    eval_fn = runner.make_eval_fn(apply_fn, vtables, observe_mansy,
                                  deterministic=True)

    def valid_return(p, k):
        """Deterministic-argmax valid metrics, per-preference breakdown.

        Returns ``(grid, ret, pp)``: ``grid`` is the equal-weight mean over
        preferences of mean episode QoE — the SAME statistic the 1440-episode
        test grids report — and ``ret`` is the legacy mean episode return
        (sum of per-chunk QoE), whose magnitude is dominated by the [7,1,1]
        cell (~313 vs −6) so selecting on it optimized one preference's
        noise (VERDICT r4 item 5; misled in v11/v12/v13/v16/v17)."""
        logs, masks = runner.evaluate(apply_fn, p, vtables, vsamples,
                                      observe_mansy, k, eval_fn=eval_fn)
        rets = np.concatenate([np.asarray(l.ret)[m]
                               for l, m in zip(logs, masks)])
        qoes = np.concatenate([np.asarray(l.qoe)[m]
                               for l, m in zip(logs, masks)])
        qids = np.concatenate([np.asarray(l.qoe_id)[m]
                               for l, m in zip(logs, masks)])
        per_pref = {q: float(qoes[qids == q].mean())
                    for q in sorted(set(qids.tolist()))}
        grid = float(np.mean(list(per_pref.values())))
        pp = " ".join(f"q{q}:{v:.4f}" for q, v in per_pref.items())
        return grid, float(rets.mean()), pp

    out_path = args.output_path or os.path.join(models_dir,
                                                "dagger_policy.ckpt")
    # net/obs construction sidecar: run_mansy --test rebuilds the policy
    # from this, so the eval cannot silently drop param-free hyperparams
    # like av_logit_prior (the v16 eval collapse: trained at prior 3.0,
    # evaluated at the 0.0 default)
    netcfg = {"hidden_dim": int(args.hidden_dim),
              "obs_action_values": bool(args.obs_action_values),
              "exact_action_values": bool(args.exact_action_values),
              "av_logit_prior": float(args.av_logit_prior),
              "acc_correct_obs": bool(acc_obs)}
    for p in (out_path, out_path + ".last"):
        save_net_config(p, netcfg)

    def balanced(ds):
        """Apply --class-balance multipliers on top of the aggregate's
        relabel weights (sampling-level, so the CE loss itself is
        unchanged); no-op at beta 0."""
        if not args.class_balance:
            return ds
        w = (np.asarray(ds[2], np.float32) if len(ds) > 2
             else np.ones(ds[1].shape[0], np.float32))
        mult = dagger.class_balance_weights(ds[0], ds[1], args.class_balance)
        return (ds[0], ds[1], w * mult)

    key, k0 = jax.random.split(key)
    # round 0: fit the initial aggregate
    params, opt_state, losses = dagger.bc_on_aggregate(
        apply_fn, optimizer, params, opt_state, balanced(dataset),
        args.bc_steps, args.batch_size, k0, args.ent_coef)
    best, ret0, pp = valid_return(params, jax.random.PRNGKey(args.seed))
    best_round, best_ret, best_ret_round = 0, ret0, 0
    save_checkpoint(out_path, params)
    print(f"Round 0 (BC fit): ce {losses[0]:.4f} -> {losses[-1]:.4f} | "
          f"valid grid {best:.4f} return {ret0:.3f} [{pp}] | saved {out_path}")

    for r in range(1, args.rounds + 1):
        t0 = time.time()
        key, k_s, k_c, k_b = jax.random.split(key, 4)
        samples = jnp.asarray(generate_demo_samples(
            len(videos), len(users), len(traces), len(qoe_weights),
            args.lanes, args.seed + r, qoe_probs=qoe_probs))
        extra_keep, mstats = None, ""
        if with_margin:
            obs, expert_act, done, margin = collect(params, samples, k_c)
            mg = np.asarray(margin)
            finite = np.isfinite(mg)  # pinned prefs are +inf: always kept
            thr = args.relabel_margin
            if args.relabel_margin_q is not None and finite.any():
                thr = float(np.quantile(mg[finite], args.relabel_margin_q))
            extra_keep = mg >= thr
            if finite.any():
                p25, p50, p75 = np.percentile(mg[finite], [25, 50, 75])
                mstats = (f" | margin thr {thr:.4f} kept "
                          f"{float(extra_keep[finite].mean()):.2f} "
                          f"(p25/50/75 {p25:.4f}/{p50:.4f}/{p75:.4f})")
        else:
            obs, expert_act, done = collect(params, samples, k_c)
        dataset = dagger.aggregate(dataset, jax.device_get(obs),
                                   np.asarray(expert_act), np.asarray(done),
                                   weight=args.relabel_weight,
                                   extra_keep=extra_keep)
        params, opt_state, losses = dagger.bc_on_aggregate(
            apply_fn, optimizer, params, opt_state, balanced(dataset),
            args.bc_steps, args.batch_size, k_b, args.ent_coef)
        grid, ret, pp = valid_return(params, jax.random.PRNGKey(args.seed + r))
        if ret > best_ret:
            best_ret, best_ret_round = ret, r
        marker = ""
        if grid > best:
            best, best_round = grid, r
            save_checkpoint(out_path, params)
            marker = " *best*"
        print(f"Round {r}/{args.rounds}: +{args.lanes} episodes -> "
              f"{dataset[1].shape[0]} transitions | ce {losses[-1]:.4f} | "
              f"valid grid {grid:.4f} return {ret:.3f} [{pp}] "
              f"(best {best:.4f}){marker}{mstats} [{time.time() - t0:.1f}s]")
    # the valid split still cannot see everything the test grid measures
    # (different videos/traces; --valid-interp closes the preference axis
    # but not those) — always keep the final-round params too so the test
    # grid can arbitrate
    save_checkpoint(out_path + ".last", params)
    print(f"Best valid grid qoe {best:.4f} at round {best_round} "
          f"(legacy return metric would have picked round {best_ret_round}, "
          f"{best_ret:.3f}) | policy at {out_path} | last-round params at "
          f"{out_path}.last")


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rounds", type=int, default=8)
    parser.add_argument("--lanes", type=int, default=32,
                        help="policy episodes labeled by the expert per round")
    parser.add_argument("--bc-steps", type=int, default=300,
                        help="CE minibatch steps per round")
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--ent-coef", type=float, default=0.1,
                        help="BC entropy bonus (reference uses 0.1; 0 = "
                             "sharpest conditional fit)")
    parser.add_argument("--horizon", type=int, default=4)
    parser.add_argument("--pref-interp", type=int, default=0,
                        help="(extension) append this many random convex "
                             "combinations of the train preferences")
    parser.add_argument("--pref-interp-alpha", type=float, default=1.0,
                        help="Dirichlet concentration for --pref-interp")
    parser.add_argument("--valid-interp", type=int, default=0,
                        help="(extension) append this many random convex "
                             "combinations of the VALID preferences to the "
                             "checkpoint-selection grid, so selection can "
                             "arbitrate mid-simplex interpolation behavior "
                             "(the v20/v21 collapse-point pick); drawn from "
                             "a distinct rng stream than --pref-interp")
    parser.add_argument("--qoe-sample-weights", type=float, nargs="*",
                        default=None,
                        help="relative sampling weights per preference for "
                             "DAgger rollouts (focus weak cells); base-pref "
                             "count or full count with interp")
    parser.add_argument("--pin-expert", type=str, nargs="*", default=None,
                        metavar="PREF_IDX:ACTION",
                        help="pin a preference's expert label to a fixed "
                             "action (e.g. '1:10' = always min-rate for the "
                             "2nd preference) instead of the MPC search")
    parser.add_argument("--causal-expert", action="store_true",
                        help="relabel with the causal harmonic-bandwidth MPC "
                             "expert (imitable labels) instead of the "
                             "privileged true-future-trace expert")
    parser.add_argument("--acc-correct", action="store_true",
                        help="score relabel searches (and the exact "
                             "action-value obs field) with the accuracy-"
                             "corrected deployable estimate "
                             "(sim.expert.corrected_scores)")
    parser.add_argument("--acc-correct-prefs", type=int, nargs="*",
                        default=None, metavar="PREF_IDX",
                        help="apply --acc-correct relabel scoring ONLY to "
                             "these preference indices; the rest keep gt-"
                             "evaluated scoring — a per-preference hybrid "
                             "teacher in one vmapped collector")
    parser.add_argument("--acc-correct-obs", action="store_true",
                        help="accuracy-correct ONLY the exact action-value "
                             "obs field, leaving relabel scoring as selected "
                             "by --deployable-expert/--causal-expert (hybrid "
                             "recipes: corrected deployable features + "
                             "gt-scored teacher)")
    parser.add_argument("--deployable-expert", action="store_true",
                        help="score relabel searches on the fully deployable "
                             "profiling tables (pred-allocated AND "
                             "pred-evaluated) — with --causal-expert the "
                             "teacher is a pure function of causally "
                             "available state, so its labels are consistent")
    parser.add_argument("--class-balance", type=float, default=0.0,
                        metavar="BETA",
                        help="within-preference inverse-class-frequency "
                             "CE sampling exponent (0 = off, 1 = full "
                             "balance); counters rare-label underfit of "
                             "the causal expert's burst decisions")
    parser.add_argument("--relabel-weight", type=float, default=1.0,
                        help="CE sampling weight for expert-relabeled policy "
                             "states relative to the initial demo aggregate")
    parser.add_argument("--relabel-margin", type=float, default=0.0,
                        help="drop relabeled transitions whose teacher "
                             "decision margin (best minus second-best first-"
                             "action value, weight-sum-normalized QoE units) "
                             "is below this — confident-teacher filtering of "
                             "the causally-ambiguous boundary labels the "
                             "clone-gap analysis found unlearnable; pinned "
                             "preferences are always kept")
    parser.add_argument("--relabel-margin-q", type=float, default=None,
                        metavar="Q",
                        help="like --relabel-margin but self-calibrating: "
                             "per round, drop the fraction Q of non-pinned "
                             "relabels with the smallest margins")
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
    parser.add_argument("--exact-action-values", action="store_true",
                        help="(extension) env-computed EXACT causal one-step "
                             "action values as an observation field "
                             "(sim.env.exact_action_values) — demos must be "
                             "generated with the same flag")
    parser.add_argument("--seed", type=int, default=5)
    parser.add_argument("--train-dataset", type=str, default="Jin2022")
    parser.add_argument("--network-dataset", type=str, default="4G")
    parser.add_argument("--qoe-train-ids", type=int, nargs="*")
    parser.add_argument("--demos-path", type=str, default=None)
    parser.add_argument("--init-path", type=str, default=None,
                        help="warm-start policy checkpoint (e.g. BC best)")
    parser.add_argument("--output-path", type=str, default=None)
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--config-yml", type=str, default=None)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    config = load_config(args.config_yml)
    if args.qoe_train_ids is None:
        args.qoe_train_ids = list(range(len(config.qoe_split["train"])))
    if args.device:
        jax.config.update("jax_platforms", args.device)
    enable_compilation_cache()
    print(args)
    run(args, config)


if __name__ == "__main__":
    main()
