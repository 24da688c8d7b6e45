"""Preference-routed ensemble (``cli/run_ensemble.py``).

Unit-tests the routing rule and runs the CLI end-to-end on the hermetic
synthetic tree with two random-init components: routing must follow the
valid-grid argmax, and the routed test CSV must cover the exact episode
grid ``run_mansy --test`` covers (reference ``run_mansy.py:161-175``).
"""

import json
import os

import numpy as np

from synthetic_tree import build_synthetic_tree


def test_route_table_argmax_and_ties():
    from mansy_immersivevideostreaming_tpu.cli.run_ensemble import route_table

    scores = [[0.1, 0.5, -0.2, 0.0],   # component 0 (default)
              [0.3, 0.5, -0.4, 0.0]]   # component 1
    # q0: 1 wins; q1 exact tie -> earliest (0); q2: 0 wins; q3 tie -> 0
    assert route_table(scores) == [1, 0, 0, 0]


def test_route_table_gated_two_sigma():
    from mansy_immersivevideostreaming_tpu.cli.run_ensemble import (
        route_table_gated)

    rng = np.random.default_rng(0)
    n = 200
    qids = np.repeat([0, 1, 2], n)
    base = rng.normal(0.0, 0.1, size=3 * n)
    comp = base.copy()
    # q0: decisive paired edge (+0.05 >> 2 se of 0.01-noise diffs)
    comp[:n] += 0.05 + rng.normal(0, 0.01, n)
    # q1: tiny edge buried in paired noise -> must stay on the default
    # (exact construction: mean +0.01, std 0.2 -> se 0.0142, 2se > edge)
    comp[n:2 * n] += 0.01 + 0.2 * np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    # q2: candidate is WORSE -> default
    comp[2 * n:] -= 0.05
    route, ev = route_table_gated([base, comp], qids, z=2.0)
    assert route == [1, 0, 0]
    assert ev[0]["edge"] > 2 * ev[0]["se"]
    assert ev[1]["candidate"] == 1 and route[1] == 0  # gated out
    assert ev[2]["candidate"] == 0


def test_run_ensemble_end_to_end(tmp_path):
    cfg = build_synthetic_tree(str(tmp_path))
    from mansy_immersivevideostreaming_tpu.cli import run_ensemble
    from mansy_immersivevideostreaming_tpu.cli.run_mansy import dummy_obs
    from mansy_immersivevideostreaming_tpu.models.abr_nets import (
        MansyActorCritic)
    from mansy_immersivevideostreaming_tpu.utils.checkpoint import (
        save_checkpoint, save_net_config)
    import jax

    ckpts = []
    for seed in (0, 1):
        policy = MansyActorCritic(hidden_dim=16,
                                  action_space=cfg.action_space)
        params = policy.init(jax.random.PRNGKey(seed),
                             dummy_obs(cfg))["params"]
        path = os.path.join(str(tmp_path), f"comp{seed}.ckpt")
        save_checkpoint(path, params)
        save_net_config(path, {"hidden_dim": 16})
        ckpts.append(path)

    out_csv = os.path.join(str(tmp_path), "ens_results.csv")
    out_json = os.path.join(str(tmp_path), "route.json")
    args = run_ensemble.build_parser().parse_args(
        ["--ckpts", *ckpts, "--names", "a", "b", "--test-on-seen",
         "--route-gate", "argmax", "--route-grid", "roundrobin",
         "--output-csv", out_csv, "--route-json", out_json])
    run_ensemble.run(args, cfg)

    route = json.load(open(out_json))
    # routing must be the valid-score argmax (ties -> earliest listed)
    scores = np.asarray([route["valid_scores"]["a"],
                         route["valid_scores"]["b"]])
    for q, w in enumerate(route["qoe_weights"]):
        want = "a" if scores[0, q] >= scores[1, q] - 1e-12 else "b"
        assert route["route"][str(w)] == want

    rows = open(out_csv).read().strip().splitlines()
    # header + full test grid: 1 video x 1 user x 1 trace x 4 qoe
    assert len(rows) == 1 + 4
    qoe = np.asarray([float(r.split(",")[6]) for r in rows[1:]])
    assert np.all(np.isfinite(qoe))
    assert np.isclose(route["test_grid_mean"],
                      float(np.mean([route["test_per_pref"][str(q)]
                                     for q in range(4)])))

    # default mode: full-cartesian valid grid + two-sigma gate
    args = run_ensemble.build_parser().parse_args(
        ["--ckpts", *ckpts, "--names", "a", "b", "--test-on-seen",
         "--output-csv", out_csv, "--route-json", out_json])
    run_ensemble.run(args, cfg)
    route = json.load(open(out_json))
    assert route["route_gate"] == "sig" and route["route_grid"] == "full"
    for q, ev in enumerate(route["gate_evidence"]):
        if ev["edge"] <= 2.0 * ev["se"]:  # undecided -> deployment default
            assert route["route"][str(route["qoe_weights"][q])] == "a"
