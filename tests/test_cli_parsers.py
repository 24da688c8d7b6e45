"""CLI arg surface: every reference flag parses and defaults match."""

from mansy_immersivevideostreaming_tpu.cli import (
    predict, preprocess_hmdtrace, preprocess_network, preprocess_video,
    run_expert, run_mansy, run_models, run_simple_rl,
)


def test_run_models_defaults():
    a = run_models.build_parser().parse_args([])
    assert a.his_window == 5 and a.fut_window == 15
    assert a.epochs == 200 and a.lr == 1e-4 and a.bs == 512 and a.seed == 5
    # reference example flags all parse (run_models.py:196)
    a = run_models.build_parser().parse_args(
        "--model mtio --train --test --train-dataset Jin2022 --test-dataset "
        "Jin2022 --his-window 5 --fut-window 15 --bs 512 --seed 5 "
        "--dataset-frequency 5 --sample-step 5 --hidden-dim 512 --block-num 2 "
        "--lr 0.0001 --epochs 200 --epochs-per-valid 3".split())
    assert a.train and a.test and a.hidden_dim == 512


def test_run_mansy_defaults():
    a = run_mansy.build_parser().parse_args([])
    assert a.lr == 5e-4 and a.gamma == 0.95 and a.ent_coef == 0.02
    assert a.epochs == 1000 and a.step_per_epoch == 4096
    assert a.lamb == 0.5 and a.identifier_lr == 1e-4
    a = run_mansy.build_parser().parse_args(
        "--train --test --epochs 1000 --step-per-epoch 4096 "
        "--step-per-collect 4096 --lr 0.0005 --batch-size 512 "
        "--qoe-test-ids 0 1 2 3 --test-on-seen --lamb 0.5 --train-identifier "
        "--identifier-lr 0.0001 --gamma 0.95 --ent-coef 0.02 --seed 5 "
        "--use-identifier".split())
    assert a.qoe_test_ids == [0, 1, 2, 3] and a.use_identifier


def test_run_simple_rl_defaults():
    a = run_simple_rl.build_parser().parse_args(["--qoe-train-id", "0"])
    assert a.lr == 1e-4 and a.gamma == 0.99 and a.epochs == 100
    assert a.qoe_train_id == 0


def test_run_expert_defaults():
    a = run_expert.build_parser().parse_args(
        "--train-dataset Jin2022 --train --valid --horizon 4 --proc-num 8".split())
    assert a.horizon == 4 and a.train and a.valid
    a = run_expert.build_parser().parse_args(
        "--test-dataset Jin2022 --test --horizon 2 --qoe-test-ids 3 "
        "--test-on-seen".split())
    assert a.horizon == 2 and a.qoe_test_ids == [3]


def test_predict_and_preprocess_parsers():
    a = predict.build_parser().parse_args(
        "--model regression --dataset Jin2022 --bs 64 --seed 1".split())
    assert a.model == "regression" and a.bs == 64
    import argparse
    for mod in (preprocess_network,):
        pa = mod.main  # importable
    # hmdtrace/video parse inside main; just check module import surface
    assert hasattr(preprocess_hmdtrace, "simplify_hmd_trace")
    assert hasattr(preprocess_video, "preprocess_video")
