#!/bin/bash
# Round-4 item 2: win the dynamic cells ([3,3,3], [1,1,7]).
# v8 = pinned DAgger continued from dagger_v7 with the relabel budget
# concentrated on the two dynamic preferences and horizon-4 expert labels:
#   pins kept:  [7,1,1]->14 (const-max), [1,7,1]->10 (const-min) — per-cell optimal
#   dynamic:    [3,3,3] (oracle +0.0750, v7 +0.0203), [1,1,7] (oracle 0.0000, v7 -0.0157)
#   sampling:   0.5 0.5 5 5  (~91% of relabel lanes on the dynamic cells)
# Targets (VERDICT r3 item 2): seen mean >= +0.135, [3,3,3] >= +0.05,
# [1,1,7] >= -0.005, no regressions, distinct [1,7,1]/[1,1,7] histograms.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_DATA_DIR=/root/runs/data
export MANSY_MODELS_DIR=/root/runs/rl/models
export MANSY_RESULTS_DIR=/root/runs/rl/results
OUT=/root/repo/artifacts/round4
mkdir -p $OUT
SEEN=/root/runs/rl/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=/root/runs/rl/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=/root/runs/rl/dagger_v8.ckpt

# ---- Phase A: h4 dynamic-cell DAgger from dagger_v7 ----
timeout 7200 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 16 --lanes 32 --horizon 4 --bc-steps 600 --batch-size 4096 \
  --lr 1.5e-4 --ent-coef 0 \
  --qoe-sample-weights 0.5 0.5 5 5 --relabel-weight 4 \
  --pin-expert 0:14 1:10 \
  --demos-path /root/runs/rl/demos_pinned.pkl \
  --init-path artifacts/round3/dagger_v7.ckpt \
  --output-path $DAGGER --seed 41 || exit 1

# ---- Phase B: seen grid eval ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER --seed 41 || exit 1
cp $SEEN/epochs_1000_bs_512_lr_0.0005_gamma_0.95_seed_41_ent_0.02_useid_False_lambda_0.5_ilr_0.0001_iur_2_bc_False/results.csv \
   $OUT/dagger_v8_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v8_seen_results.csv

# ---- Phase C: unseen grid eval ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER --seed 41 || exit 1
cp $UNSEEN/epochs_1000_bs_512_lr_0.0005_gamma_0.95_seed_41_ent_0.02_useid_False_lambda_0.5_ilr_0.0001_iur_2_bc_False/results.csv \
   $OUT/dagger_v8_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v8_unseen_results.csv

# ---- Phase D: per-pref action histograms (distinctness criterion) ----
timeout 1800 python benchmarks/action_histogram.py $DAGGER \
  --other artifacts/round3/dagger_v7.ckpt \
  > /root/runs/v8_histogram.log 2>&1 || true
cat /root/runs/v8_histogram.log
echo ITEM2_V8_DONE
