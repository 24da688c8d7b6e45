#!/bin/bash
# Round-3 v7 (RECONSTRUCTED in round 5 — the original /root/runs/item1_v7.sh
# was wiped).  Result: seen +0.1253 / unseen +0.1047 — the round-3 flagship
# (artifacts/round3/dagger_v7.ckpt, dagger_v7_{seen,unseen}_results.csv).
#
# EXACT from BASELINE.md's round-3 finale section: DAgger from the round-2
# kl2 start (artifacts/round2/mansy_kl2_policy.ckpt) with fixed-action
# expert pins [7,1,1]->14 (const-max) and [1,7,1]->10 (const-min),
# privileged MPC h3 relabels elsewhere, 10 rounds, demo core = the pinned
# privileged h4 aggregate.  ASSUMED (copied from the committed v8 script,
# v7's direct descendant): bc-steps 600, batch 4096, lr 1.5e-4, ent 0,
# relabel-weight 4, seed 31 (unrecorded; v8 used 41).
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rl7/models
export MANSY_RESULTS_DIR=/root/runs/rl7/results
OUT=/root/repo/artifacts/round3
RUN=/root/runs/rl7
mkdir -p $RUN
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_v7.ckpt

# ---- Phase A0: privileged h4 demo core + pins (as in dagger_v9_run.sh) ----
timeout 7200 python -m mansy_immersivevideostreaming_tpu.cli.run_expert \
  --train --horizon 4 --demo-samples 1427 --lane-chunk 32 \
  --seed 7 > $RUN/demo_gen.log 2>&1
DEMOS=$RUN/models/bitrate_selection/expert/Jin2022_4G/qoe0_1_2_3/train_demonstrations.pkl
timeout 600 python benchmarks/pin_demo_labels.py $DEMOS \
  $RUN/demos_pinned.pkl --pin 0:14 1:10

# ---- Phase A: pinned-expert DAgger from the kl2 policy ----
timeout 7200 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 10 --lanes 32 --horizon 3 --bc-steps 600 --batch-size 4096 \
  --lr 1.5e-4 --ent-coef 0 \
  --relabel-weight 4 \
  --pin-expert 0:14 1:10 \
  --demos-path $RUN/demos_pinned.pkl \
  --init-path artifacts/round2/mansy_kl2_policy.ckpt \
  --output-path $DAGGER --seed 31 > $RUN/dagger_v7.log 2>&1

# ---- Phases B/C: grid evals ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER --seed 31
cp $SEEN/*seed_31*/results.csv $OUT/dagger_v7_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER --seed 31
cp $UNSEEN/*seed_31*/results.csv $OUT/dagger_v7_unseen_results.csv
echo V7_ALL_DONE
