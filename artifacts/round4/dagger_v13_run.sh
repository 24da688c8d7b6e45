#!/bin/bash
# Round-4 v13 (RECONSTRUCTED in round 5 — the original /root/runs/rl_v13.sh
# was wiped).  Result: seen +0.1045 / unseen +0.0676, record valid return
# 74.107 (artifacts/round4/dagger_v13{,last}_{seen,unseen}_results.csv) —
# the run that isolated the DERIVED action-value features as lossy
# (BASELINE.md round-4 v13 section).
#
# EXACT from BASELINE.md: fresh init, causal-h1 demo core with the
# [1,7,1]->10 pin, derived --obs-action-values + --av-logit-prior 3.0,
# h1 causal relabels, class-balance 0.5, pref-interp 6, 20 rounds, seed 83.
# ASSUMED (copied from the v15 Namespace, the sibling recipe):
# bc-steps 800, batch 4096, lr 3e-4, ent 0, sampling 2/0.5/4/4,
# relabel-weight 2.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rl13/models
export MANSY_RESULTS_DIR=/root/runs/rl13/results
OUT=/root/repo/artifacts/round4
RUN=/root/runs/rl13
mkdir -p $RUN
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_v13.ckpt

# ---- Phase A: causal-h1 demo core ----
timeout 2400 python -m mansy_immersivevideostreaming_tpu.cli.run_expert \
  --train --causal-bw --horizon 1 --demo-samples 1427 --lane-chunk 32 \
  --seed 7 > $RUN/demo_gen.log 2>&1
DEMOS=$RUN/models/bitrate_selection/expert/Jin2022_4G/qoe0_1_2_3/train_demonstrations.pkl
timeout 600 python benchmarks/pin_demo_labels.py $DEMOS \
  $RUN/demos_h1_pinned.pkl --pin 1:10

# ---- Phase B: DAgger with derived AV features, h1 causal relabels ----
timeout 5400 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 20 --lanes 32 --horizon 1 --bc-steps 800 --batch-size 4096 \
  --lr 3e-4 --ent-coef 0 \
  --causal-expert --obs-action-values --av-logit-prior 3.0 \
  --class-balance 0.5 --pref-interp 6 --relabel-weight 2 \
  --qoe-sample-weights 2 0.5 4 4 \
  --pin-expert 1:10 \
  --demos-path $RUN/demos_h1_pinned.pkl \
  --output-path $DAGGER --seed 83 > $RUN/dagger_v13.log 2>&1

# ---- Phases C-F: grid evals (best + last; sidecar restores net flags) ----
for CKPT_SEED in "$DAGGER 83" "$DAGGER.last 84"; do
  set -- $CKPT_SEED
  timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
    --test --test-on-seen --deterministic-eval \
    --obs-action-values --av-logit-prior 3.0 --policy-path $1 --seed $2
  timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
    --test --deterministic-eval \
    --obs-action-values --av-logit-prior 3.0 --policy-path $1 --seed $2
done
cp $SEEN/*seed_83*/results.csv $OUT/dagger_v13_seen_results.csv
cp $UNSEEN/*seed_83*/results.csv $OUT/dagger_v13_unseen_results.csv
cp $SEEN/*seed_84*/results.csv $OUT/dagger_v13last_seen_results.csv
cp $UNSEEN/*seed_84*/results.csv $OUT/dagger_v13last_unseen_results.csv
echo V13_ALL_DONE
