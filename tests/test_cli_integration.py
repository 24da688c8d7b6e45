"""Miniature end-to-end CLI integration tests on a synthetic dataset tree.

Exercises the full 400-line training loops the arg-surface tests can't
(VERDICT round-1 item 9): 2-epoch ``run_models --train --test``, 2-epoch
``run_mansy --train --test``, and ``run_expert --test`` — all CPU, tiny
shapes, hermetic tree from :mod:`synthetic_tree`.
"""

import glob
import re
import os

import numpy as np
import pytest

from synthetic_tree import build_synthetic_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    base = tmp_path_factory.mktemp("synth")
    cfg = build_synthetic_tree(str(base))
    return str(base), cfg


def test_run_models_train_test_end_to_end(tree):
    base, cfg = tree
    from mansy_immersivevideostreaming_tpu.cli import run_models

    args = run_models.build_parser().parse_args([
        "--train", "--test", "--model", "mtio", "--hidden-dim", "16",
        "--block-num", "1", "--his-window", "3", "--fut-window", "5",
        "--trim-head", "5", "--trim-tail", "5", "--sample-step", "2",
        "--epochs", "2", "--epochs-per-valid", "1", "--bs", "16",
        "--lr", "1e-3", "--device", "cpu"])
    run_models.run(args, cfg)

    ckpts = glob.glob(os.path.join(
        base, "models", "viewport_prediction", "**", "*_best_model.ckpt"),
        recursive=True)
    assert ckpts, "best model checkpoint not written"
    csvs = glob.glob(os.path.join(
        base, "results", "viewport_prediction", "**", "*_results.csv"),
        recursive=True)
    assert len(csvs) >= 2  # seen + unseen
    assert os.path.getsize(csvs[0]) > 0


def test_run_mansy_train_test_end_to_end(tree):
    base, cfg = tree
    from mansy_immersivevideostreaming_tpu.cli import run_mansy

    common = [
        "--use-identifier", "--train-identifier", "--id-reward-center",
        "--lamb-warmup", "1", "--epochs", "2",
        "--step-per-epoch", "64", "--step-per-collect", "64",
        "--train-lanes", "8", "--batch-size", "64", "--hidden-dim", "16",
        "--save-interval", "1"]
    args = run_mansy.build_parser().parse_args(["--train"] + common)
    run_mansy.run(args, cfg)
    ckpts = glob.glob(os.path.join(
        base, "models", "bitrate_selection", "mansy", "**",
        "best_policy.ckpt"), recursive=True)
    assert ckpts, "best policy not written"

    args = run_mansy.build_parser().parse_args(
        ["--test", "--test-on-seen", "--deterministic-eval"] + common)
    run_mansy.run(args, cfg)
    results = glob.glob(os.path.join(
        base, "results", "bitrate_selection", "mansy", "**", "results.csv"),
        recursive=True)
    assert results
    rows = open(results[0]).read().strip().splitlines()
    # header + test grid: 1 video x 1 user x 1 trace x 4 qoe = 4 episodes
    assert len(rows) == 1 + 4
    qoe = np.asarray([float(r.split(",")[6]) for r in rows[1:]])
    assert np.all(np.isfinite(qoe))


def test_run_mansy_per_pref_kl_anchor(tree):
    """--bc-kl-per-pref: per-preference KL anchor coefficients through the
    real CLI loop, warm-started from the checkpoint the previous test wrote
    (round-4 extension for the conditioning-preserving fine-tune)."""
    base, cfg = tree
    from mansy_immersivevideostreaming_tpu.cli import run_mansy

    ckpts = glob.glob(os.path.join(
        base, "models", "bitrate_selection", "mansy", "**",
        "best_policy.ckpt"), recursive=True)
    assert ckpts, "run the train test first"
    args = run_mansy.build_parser().parse_args([
        "--train", "--init-path", ckpts[0],
        "--bc-kl-per-pref", "2.0", "1.0", "0.1", "0.1",
        "--epochs", "1", "--step-per-epoch", "64",
        "--step-per-collect", "64", "--train-lanes", "8",
        "--batch-size", "64", "--hidden-dim", "16", "--seed", "21",
        "--save-interval", "1"])
    run_mansy.run(args, cfg)
    logs = [p for p in glob.glob(os.path.join(
        base, "models", "bitrate_selection", "mansy", "**", "console.log"),
        recursive=True) if "seed_21" in p]
    assert logs
    text = open(logs[0]).read()
    assert "KL anchor enabled (coef [2.0, 1.0, 0.1, 0.1])" in text
    m = re.findall(r"valid mean return ([0-9.eE+-]+)", text)
    assert m and np.isfinite(float(m[-1]))


def test_run_expert_test_end_to_end(tree):
    base, cfg = tree
    from mansy_immersivevideostreaming_tpu.cli import run_expert

    args = run_expert.build_parser().parse_args([
        "--test", "--test-on-seen", "--horizon", "2", "--lane-chunk", "8"])
    run_expert.run(args, cfg)
    results = glob.glob(os.path.join(
        base, "results", "bitrate_selection", "expert", "**", "results.csv"),
        recursive=True)
    assert results
    rows = open(results[0]).read().strip().splitlines()
    assert len(rows) == 1 + 4


def test_run_simple_rl_train_test_end_to_end(tree):
    base, cfg = tree
    from mansy_immersivevideostreaming_tpu.cli import run_simple_rl

    common = [
        "--qoe-train-id", "0", "--epochs", "2", "--step-per-epoch", "64",
        "--step-per-collect", "64", "--train-lanes", "8",
        "--batch-size", "64"]
    args = run_simple_rl.build_parser().parse_args(["--train"] + common)
    run_simple_rl.run(args, cfg)
    args = run_simple_rl.build_parser().parse_args(
        ["--test", "--test-on-seen"] + common)
    run_simple_rl.run(args, cfg)
    results = glob.glob(os.path.join(
        base, "results", "bitrate_selection", "simple_rl", "**",
        "results.csv"), recursive=True)
    assert results
    rows = open(results[0]).read().strip().splitlines()
    assert len(rows) == 1 + 4


def test_predict_export_end_to_end(tree):
    """predict CLI writes reference-schema pkls readable by the sim loader;
    reuses the best model trained by the run_models test (file ordering)."""
    import pickle

    base, cfg = tree
    from mansy_immersivevideostreaming_tpu.cli import predict as predict_cli

    ckpts = glob.glob(os.path.join(
        base, "models", "viewport_prediction", "**", "*_best_model.ckpt"),
        recursive=True)
    if not ckpts:
        pytest.skip("needs the run_models integration test's checkpoint")
    out_dir = os.path.join(base, "pred_out")
    args = predict_cli.build_parser().parse_args([
        "--model", "mtio", "--model-path", ckpts[0], "--hidden-dim", "16",
        "--block-num", "1", "--his-window", "3", "--fut-window", "5",
        "--trim-head", "5", "--trim-tail", "5", "--sample-step", "2",
        "--bs", "64", "--output-dir", out_dir])
    predict_cli.run(args, cfg)
    pkls = glob.glob(os.path.join(out_dir, "video*", "user*.pkl"))
    assert pkls
    entries = pickle.load(open(pkls[0], "rb"))
    chunk, gt, pred, acc = entries[0]
    assert gt.shape == (64,) and pred.shape == (64,)
    assert 0.0 <= acc <= 1.0


def test_run_expert_demos_and_dagger_end_to_end(tree, capsys):
    """run_expert --train writes demos the DAgger CLI can aggregate and
    improve on (1 round, tiny shapes).

    The DAgger leg runs the full round-4 conditioning flag combo
    (preference interpolation + per-pref sample weights incl. interp slots +
    pinned fixed-action experts + relabel weighting + interp-aware
    checkpoint selection) so the unattended at-scale runs exercise only
    tested paths."""
    base, cfg = tree
    from mansy_immersivevideostreaming_tpu.cli import run_dagger, run_expert

    args = run_expert.build_parser().parse_args([
        "--train", "--horizon", "1", "--lane-chunk", "8",
        "--exact-action-values", "--acc-correct-obs"])
    run_expert.run(args, cfg)
    demos = glob.glob(os.path.join(
        base, "models", "bitrate_selection", "expert", "**",
        "train_demonstrations.pkl"), recursive=True)
    assert demos

    # pin a preference's demo labels with the committed tool, then feed the
    # pinned aggregate to DAgger (round-4 hybrid-core workflow)
    import pickle
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    import pin_demo_labels
    pinned_path = demos[0] + ".pinned"
    pin_demo_labels.main([demos[0], pinned_path, "--pin", "1:10"], config=cfg)
    raw = pickle.load(open(pinned_path, "rb"))
    pin_qoe = tuple(int(w) for w in cfg.qoe_split["train"][1])
    for key, demo in raw.items():
        if tuple(int(w) for w in key[3]) == pin_qoe:
            assert (demo["act"] == 10).all()

    args = run_dagger.build_parser().parse_args([
        "--demos-path", pinned_path,
        "--rounds", "1", "--lanes", "4", "--bc-steps", "10",
        "--batch-size", "64", "--horizon", "1", "--hidden-dim", "16",
        "--pref-interp", "2", "--pref-interp-alpha", "1.0",
        "--qoe-sample-weights", "0.5", "0.5", "4", "4", "2", "2",
        "--relabel-weight", "4", "--pin-expert", "0:14", "1:10",
        "--causal-expert", "--class-balance", "0.5",
        "--relabel-margin-q", "0.5",
        "--valid-interp", "2",
        "--exact-action-values", "--acc-correct-obs",
        "--av-logit-prior", "3.0"])
    run_dagger.run(args, cfg)
    out = glob.glob(os.path.join(
        base, "models", "bitrate_selection", "expert", "**",
        "dagger_policy.ckpt"), recursive=True)
    assert out
    # final-round params are always kept alongside the valid-best checkpoint
    assert glob.glob(out[0] + ".last")
    # --valid-interp widens the selection grid: 4 base + 2 interp valid
    # preferences, all present in the per-preference breakdown (q0..q5)
    stdout = capsys.readouterr().out
    assert "Valid-grid interp preferences:" in stdout
    assert "q5:" in stdout
