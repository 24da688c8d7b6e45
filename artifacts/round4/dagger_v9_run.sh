#!/bin/bash
# Round-4 v9 (RECONSTRUCTED in round 5 — the original script was wiped with
# /root/runs).  Result: seen +0.1258 / unseen +0.0951 — the committed
# FLAGSHIP policy (artifacts/round4/dagger_v9.ckpt,
# dagger_v9cpu_{seen,unseen}_results.csv), first cell above its bang-bang
# pin ([7,1,1] +0.6334 > +0.6253).
#
# EXACT from BASELINE.md's v9 section: 18 rounds, causal-h3 relabels
# (--causal-expert --horizon 3), init dagger_v8, pin 1:10, sampling
# 3/0.5/4/4, relabel-weight 5, seed 51, demo core = the round-3 pinned
# PRIVILEGED aggregate (demos_pinned.pkl — regenerate with Phase A0 below;
# the pickle itself was wiped).  ASSUMED (copied from the committed v8
# script, v9's direct ancestor): bc-steps 600, batch 4096, lr 1.5e-4,
# ent 0.  v9 ran on CPU during the round-4 TPU-tunnel outage; on-TPU
# reruns will differ at run-noise level.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rl9/models
export MANSY_RESULTS_DIR=/root/runs/rl9/results
OUT=/root/repo/artifacts/round4
RUN=/root/runs/rl9
mkdir -p $RUN
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_v9.ckpt

# ---- Phase A0: regenerate the privileged h4 demo core + pins ----
# (round-2 wide demo grid: privileged MPC, horizon 4, 1427 demos; then the
# round-3 pins 0:14 1:10 applied — BASELINE round-3 finale section)
timeout 7200 python -m mansy_immersivevideostreaming_tpu.cli.run_expert \
  --train --horizon 4 --demo-samples 1427 --lane-chunk 32 \
  --seed 7 > $RUN/demo_gen.log 2>&1
DEMOS=$RUN/models/bitrate_selection/expert/Jin2022_4G/qoe0_1_2_3/train_demonstrations.pkl
timeout 600 python benchmarks/pin_demo_labels.py $DEMOS \
  $RUN/demos_pinned.pkl --pin 0:14 1:10

# ---- Phase A: causal-h3 relabel DAgger from dagger_v8 ----
timeout 7200 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 18 --lanes 32 --horizon 3 --bc-steps 600 --batch-size 4096 \
  --lr 1.5e-4 --ent-coef 0 \
  --causal-expert \
  --qoe-sample-weights 3 0.5 4 4 --relabel-weight 5 \
  --pin-expert 1:10 \
  --demos-path $RUN/demos_pinned.pkl \
  --init-path artifacts/round4/dagger_v8.ckpt \
  --output-path $DAGGER --seed 51 > $RUN/dagger_v9.log 2>&1

# ---- Phases B/C: grid evals ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER --seed 51
cp $SEEN/*seed_51*/results.csv $OUT/dagger_v9_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER --seed 51
cp $UNSEEN/*seed_51*/results.csv $OUT/dagger_v9_unseen_results.csv
echo V9_ALL_DONE
