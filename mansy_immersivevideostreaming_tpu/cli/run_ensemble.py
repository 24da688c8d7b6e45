"""Preference-routed ensemble: validation-routed deployment of K policies.

Extension beyond the reference (which deploys ONE preference-conditioned
net, ``run_mansy.py:25-136``).  At deploy time the QoE weight vector is an
*input* the controller reads before the episode starts, so a deployable
controller may hold K trained policies and, per preference, serve the one
with the best measured valid-split QoE at that exact preference — pure
validation-based model selection, decided before any test data is touched.

Motivation (BASELINE round-5 "unseen ceiling analysis"): the per-cell best
behaviors live in *different* training lineages — the all-pins lineage is
const-exact on quality-dominant preferences, the a3-interp lineage owns the
mid-simplex cells — and no single policy combines them (six controlled
recipe axes each failed; the seen/unseen trade is a converged frontier).
Their composition, however, is a deployable controller: this CLI measures
each component on the VALID videos at each deploy preference, routes each
preference by that evidence, then runs the routed controller over the
standard 1440-episode test grid and writes one reference-format
``results.csv`` plus a ``route.json`` evidence file recording every valid
score behind every routing decision.

Routing is significance-gated by default (``--route-gate sig``): the
first-listed component is the deployment default, and a preference is
routed away from it only when the paired per-episode valid edge exceeds
``--route-z`` (2.0) standard errors over the full-cartesian valid grid
(``--route-grid full``, 1080 episodes/pref).  The unconditional
per-preference argmax over the reference's 48-sample round-robin schedule
(``--route-gate argmax --route-grid roundrobin``) was the v24a controlled
negative: 12 episodes/pref rank the mid-simplex cells essentially inversely
to the test videos, so ungated routing chases valid noise (BASELINE
round-5 v24 section).

Run on the same grids as ``run_mansy --test`` (reference test loop
``run_mansy.py:161-175``); per-preference means match
``benchmarks/per_preference.py`` over the emitted CSV.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax

from mansy_immersivevideostreaming_tpu.config import load_config
from mansy_immersivevideostreaming_tpu.models.abr_nets import MansyActorCritic
from mansy_immersivevideostreaming_tpu.rl import runner
from mansy_immersivevideostreaming_tpu.sim.env import observe_mansy
from mansy_immersivevideostreaming_tpu.utils.checkpoint import (
    load_net_config, restore_checkpoint)
from mansy_immersivevideostreaming_tpu.utils.prng import (
    enable_compilation_cache, seed_everything)


def build_component(config, ckpt_path, key):
    """Reconstruct (apply_fn, params, netcfg) from a checkpoint + sidecar.

    The ``.netcfg.json`` sidecar is authoritative for every param-free
    net-construction flag (the v16 eval-collapse lesson); checkpoints
    predating it get the defaults.
    """
    from mansy_immersivevideostreaming_tpu.cli.run_mansy import dummy_obs

    netcfg = load_net_config(ckpt_path) or {}
    exact_av = bool(netcfg.get("exact_action_values", False))
    policy = MansyActorCritic(
        hidden_dim=int(netcfg.get("hidden_dim", 128)),
        action_space=config.action_space,
        use_action_values=(bool(netcfg.get("obs_action_values", False))
                           or exact_av),
        av_logit_prior=float(netcfg.get("av_logit_prior", 0.0)))
    params = policy.init(key, dummy_obs(
        config, exact_action_values=exact_av))["params"]
    params = restore_checkpoint(ckpt_path, params)
    apply_fn = lambda p, o: policy.apply({"params": p}, o)
    return apply_fn, params, netcfg


def per_pref_qoe(logs, masks):
    """Deterministic grid statistic: mean episode QoE per preference id —
    the same number the test grids and ``run_dagger``'s valid grid report."""
    qoes = np.concatenate([np.asarray(l.qoe)[m] for l, m in zip(logs, masks)])
    qids = np.concatenate([np.asarray(l.qoe_id)[m]
                           for l, m in zip(logs, masks)])
    return {int(q): float(qoes[qids == q].mean())
            for q in sorted(set(qids.tolist()))}


def per_sample_qoe(logs, masks):
    """Per-episode QoE aligned to SAMPLE order (lane-major across chunks).

    ``masks`` select each lane's first finished episode from [T, N] logs;
    flattening ``qoe[mask]`` would be time-major and break cross-component
    pairing, so gather each lane's first-done row explicitly.
    """
    vals = []
    for l, m in zip(logs, masks):
        m = np.asarray(m)
        qoe = np.asarray(l.qoe)
        vals.append(qoe[m.argmax(axis=0), np.arange(m.shape[1])])
    return np.concatenate(vals)


def route_table(valid_scores):
    """``valid_scores`` [K][Q] -> per-preference argmax component index.

    Ties go to the EARLIEST listed component (list your default first), so
    preferences the components solve identically don't churn the routing.
    """
    arr = np.asarray(valid_scores, np.float64)
    best = arr.max(axis=0)
    return [int(np.argmax(arr[:, q] >= best[q] - 1e-12))
            for q in range(arr.shape[1])]


def route_table_gated(per_sample, qids, z: float = 2.0):
    """Significance-gated routing: deviate from the default (component 0)
    only when the valid evidence is decisive.

    ``per_sample`` [K][S] per-episode valid QoE, paired across components
    (identical episode schedule); ``qids`` [S] preference ids.  For each
    preference the argmax-mean candidate replaces the default only if the
    PAIRED mean difference vs the default exceeds ``z`` standard errors —
    a parameter-free two-sigma rule, so preferences the valid split cannot
    decide (the mid-simplex cells, whose valid ordering is noise — see the
    v24a controlled negative, BASELINE round 5) stay on the deployment
    default instead of chasing valid noise.  Returns (route, evidence)
    where evidence[q] = (edge, se, gated_bool).
    """
    arr = np.asarray(per_sample, np.float64)
    qids = np.asarray(qids)
    route, evidence = [], []
    for q in sorted(set(qids.tolist())):
        m = qids == q
        means = arr[:, m].mean(axis=1)
        cand = int(np.argmax(means))
        d = arr[cand, m] - arr[0, m]
        n = int(m.sum())
        se = float(d.std(ddof=1) / np.sqrt(n)) if n > 1 else float("inf")
        edge = float(d.mean())
        take = cand != 0 and edge > z * se
        route.append(cand if take else 0)
        evidence.append({"candidate": cand, "edge": edge, "se": se,
                         "n": n, "routed": bool(take or cand == 0)})
    return route, evidence


def run(args, config):
    names = args.names or [os.path.basename(p) for p in args.ckpts]
    assert len(names) == len(args.ckpts), "--names must match --ckpts"
    split = "train" if args.test_on_seen else "test"
    if args.qoe_test_ids is None:
        args.qoe_test_ids = list(range(len(config.qoe_split[split])))
    qoe_weights = [config.qoe_split[split][i] for i in args.qoe_test_ids]
    print("Routing QoE weights:", qoe_weights)

    key = seed_everything(args.seed)
    components = []
    for path in args.ckpts:
        apply_fn, params, netcfg = build_component(config, path, key)
        if netcfg.get("exact_action_values"):
            raise SystemExit(
                f"{path}: exact_action_values components need per-split AV "
                "tables; route plain-observation policies only")
        components.append((apply_fn, params))
        print(f"Loaded {path} ({netcfg or 'pre-sidecar defaults'})")

    # ---- Phase 1: routing evidence — deterministic valid grid per component
    vtables, vsamples, *_ = runner.build_split(
        config, args.test_dataset, args.network_dataset, "valid", qoe_weights,
        test_grid=(args.route_grid == "full"))
    vqids = np.asarray(vsamples)[:, 3]
    print(f"Routing evidence: {vsamples.shape[0]} valid episodes "
          f"({args.route_grid} schedule), gate={args.route_gate}")
    valid_scores, valid_samples = [], []
    for name, (apply_fn, params) in zip(names, components):
        t0 = time.time()
        logs, masks = runner.evaluate(apply_fn, params, vtables, vsamples,
                                      observe_mansy, key, deterministic=True)
        pp = per_pref_qoe(logs, masks)
        valid_scores.append([pp[q] for q in range(len(qoe_weights))])
        valid_samples.append(per_sample_qoe(logs, masks))
        print(f"valid {name}: " + " ".join(
            f"q{q}:{v:.4f}" for q, v in pp.items())
            + f" | mean {np.mean(list(pp.values())):.4f}"
            + f" [{time.time() - t0:.1f}s]")
    if args.route_gate == "sig":
        route, gate_evidence = route_table_gated(valid_samples, vqids,
                                                 z=args.route_z)
        for q, ev in enumerate(gate_evidence):
            print(f"gate q{q}: candidate {names[ev['candidate']]} edge "
                  f"{ev['edge']:+.4f} se {ev['se']:.4f} n {ev['n']} -> "
                  f"{names[route[q]]}")
    else:
        route, gate_evidence = route_table(valid_scores), None
    for q, w in enumerate(qoe_weights):
        print(f"route {w} -> {names[route[q]]}")

    # ---- Phase 2: routed test grid (each preference's lanes run on its
    #      valid-chosen component; identical episodes to run_mansy --test)
    tables, samples, videos, users, traces = runner.build_split(
        config, args.test_dataset, args.network_dataset, "test", qoe_weights,
        test_grid=True)
    samples_np = np.asarray(samples)
    all_rows = []
    per_pref = {}
    for c, (apply_fn, params) in enumerate(components):
        ids = [q for q in range(len(qoe_weights)) if route[q] == c]
        if not ids:
            continue
        sub = samples[np.isin(samples_np[:, 3], ids)]
        t0 = time.time()
        logs, masks = runner.evaluate(apply_fn, params, tables, sub,
                                      observe_mansy, key, deterministic=True)
        all_rows.extend(runner.masked_log_rows(logs, masks, videos, users,
                                               traces, qoe_weights))
        pp = per_pref_qoe(logs, masks)
        per_pref.update(pp)
        print(f"test {names[c]} (prefs {ids}): " + " ".join(
            f"q{q}:{v:.4f}" for q, v in pp.items())
            + f" [{time.time() - t0:.1f}s]")

    os.makedirs(os.path.dirname(os.path.abspath(args.output_csv)),
                exist_ok=True)
    if os.path.exists(args.output_csv):
        os.remove(args.output_csv)
    runner.append_episode_logs(args.output_csv, all_rows)
    grid = float(np.mean([per_pref[q] for q in range(len(qoe_weights))]))
    print(f"Routed ensemble grid mean qoe: {grid:.4f} "
          f"({len(all_rows)} episodes) -> {args.output_csv}")

    if args.route_json:
        with open(args.route_json, "w") as f:
            json.dump({
                "split": "seen" if args.test_on_seen else "unseen",
                "qoe_weights": [list(map(float, w)) for w in qoe_weights],
                "components": {n: p for n, p in zip(names, args.ckpts)},
                "route_grid": args.route_grid,
                "route_gate": args.route_gate,
                "gate_evidence": gate_evidence,
                "valid_scores": {n: s for n, s in zip(names, valid_scores)},
                "route": {str([float(x) for x in qoe_weights[q]]):
                          names[route[q]]
                          for q in range(len(qoe_weights))},
                "test_per_pref": per_pref,
                "test_grid_mean": grid,
            }, f, indent=1, sort_keys=True)
        print("Routing evidence saved at:", args.route_json)
    runner.read_log_file(args.output_csv)
    return grid


def build_parser():
    parser = argparse.ArgumentParser(
        description="Validation-routed preference ensemble over trained "
                    "policies")
    parser.add_argument("--ckpts", type=str, nargs="+", required=True,
                        help="component checkpoints (netcfg sidecars "
                             "honored); list the default/tie-break "
                             "component first")
    parser.add_argument("--names", type=str, nargs="*", default=None)
    parser.add_argument("--test-on-seen", action="store_true")
    parser.add_argument("--test-dataset", type=str, default="Jin2022")
    parser.add_argument("--network-dataset", type=str, default="4G")
    parser.add_argument("--qoe-test-ids", type=int, nargs="*", default=None)
    parser.add_argument("--route-grid", choices=["full", "roundrobin"],
                        default="full",
                        help="valid-episode schedule behind the routing: "
                             "'full' = cartesian videos x users x traces "
                             "per preference (1080 episodes/pref on "
                             "Jin2022), 'roundrobin' = the reference's "
                             "48-sample train/valid schedule (12/pref — "
                             "too noisy to route on; kept for the v24a "
                             "reproduction)")
    parser.add_argument("--route-gate", choices=["sig", "argmax"],
                        default="sig",
                        help="'sig' deviates from the first-listed default "
                             "component only when the paired valid edge "
                             "exceeds --route-z standard errors; 'argmax' "
                             "takes the per-preference valid argmax "
                             "unconditionally")
    parser.add_argument("--route-z", type=float, default=2.0)
    parser.add_argument("--seed", type=int, default=5)
    parser.add_argument("--output-csv", type=str, required=True)
    parser.add_argument("--route-json", type=str, default=None)
    parser.add_argument("--config", type=str, default=None)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    enable_compilation_cache()
    config = load_config(args.config)
    run(args, config)


if __name__ == "__main__":
    main()
