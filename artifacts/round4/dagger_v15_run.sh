#!/bin/bash
# Round-4 v15 (RECONSTRUCTED in round 5 — the original /root/runs/rl_v15.sh
# was wiped with /root/runs).  Result: seen +0.0922 / unseen +0.0621
# (artifacts/round4/dagger_v15{,last}_{seen,unseen}_results.csv) — the
# "clone gap closed" mechanism run: exact action-value obs put the policy
# ON its fully-deployable teacher family (BASELINE.md round-4 v15 section).
#
# Phase C flags are EXACT: run_dagger prints its args Namespace and the
# training log is committed (artifacts/round4/dagger_v15_training.log:1).
# Phase A/B and the eval phases are reconstructed from the committed v16
# script (dagger_v16_run.sh), which BASELINE describes as "v15 recipe with
# --acc-correct" — knobs marked ASSUMED were not recorded for v15 itself.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rl15/models
export MANSY_RESULTS_DIR=/root/runs/rl15/results
OUT=/root/repo/artifacts/round4
RUN=/root/runs/rl15
mkdir -p $RUN
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_v15.ckpt

# ---- Phase A: deployable-scored causal-h3 demo core with exact-AV obs ----
# (ASSUMED: --seed 7 and --lane-chunk 32 copied from the v16 script)
timeout 2400 python -m mansy_immersivevideostreaming_tpu.cli.run_expert \
  --train --causal-bw --horizon 3 --demo-samples 1427 --lane-chunk 32 \
  --deployable-eval --exact-action-values \
  --seed 7 > $RUN/demo_gen.log 2>&1

# ---- Phase B: pin [1,7,1] -> 10 in the core ----
DEMOS=$RUN/models/bitrate_selection/expert/Jin2022_4G/qoe0_1_2_3/train_demonstrations.pkl
timeout 600 python benchmarks/pin_demo_labels.py $DEMOS \
  $RUN/demos_dep_h3_pinned.pkl --pin 1:10

# ---- Phase C: DAgger (EXACT — dagger_v15_training.log:1 Namespace) ----
timeout 5400 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 20 --lanes 32 --horizon 3 --bc-steps 800 --batch-size 4096 \
  --lr 3e-4 --ent-coef 0 \
  --causal-expert --deployable-expert --exact-action-values \
  --class-balance 0.5 --pref-interp 6 --relabel-weight 2 \
  --qoe-sample-weights 2 0.5 4 4 \
  --av-logit-prior 3.0 \
  --pin-expert 1:10 \
  --demos-path $RUN/demos_dep_h3_pinned.pkl \
  --output-path $DAGGER --seed 101 > $RUN/dagger_v15.log 2>&1
cp $RUN/dagger_v15.log $OUT/dagger_v15_training.log

# ---- Phases D-G: grid evals (best + last ckpt, seen + unseen) ----
# run_mansy now restores the net/obs flags (incl. --av-logit-prior 3.0 and
# the exact-AV obs wiring) from the checkpoint's .netcfg.json sidecar, so
# no policy-construction flags are repeated here (the v16 eval omitted
# --av-logit-prior and evaluated a different policy — BASELINE v16 section).
for CKPT_SEED in "$DAGGER 101" "$DAGGER.last 102"; do
  set -- $CKPT_SEED
  timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
    --test --test-on-seen --deterministic-eval \
    --exact-action-values --policy-path $1 --seed $2
  timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
    --test --deterministic-eval \
    --exact-action-values --policy-path $1 --seed $2
done
cp $SEEN/*seed_101*/results.csv $OUT/dagger_v15_seen_results.csv
cp $UNSEEN/*seed_101*/results.csv $OUT/dagger_v15_unseen_results.csv
cp $SEEN/*seed_102*/results.csv $OUT/dagger_v15last_seen_results.csv
cp $UNSEEN/*seed_102*/results.csv $OUT/dagger_v15last_unseen_results.csv
echo V15_ALL_DONE
