#!/bin/bash
# Round-4 v16: the hybrid prescribed by BASELINE.md's corrected-oracle section:
#   * demo core + relabels: gt-scored causal-h3 MPC (--causal-expert) — the
#     right imitation target (policy stays deployable; labels may use gt)
#   * observation: exact accuracy-corrected action values
#     (--exact-action-values --acc-correct-obs) — the strongest
#     causally-computable decision variable (+0.1059-with-pin controller)
#   * [1,7,1] -> action 10 pin (per-cell optimal const-min)
# Single changed variable vs v15: teacher scoring deployable -> gt-causal,
# demo core rebuilt from the same gt-causal teacher (v9's consistency lesson).
#
# POST-MORTEM (round 5): the eval phases below are what produced the
# collapsed committed grids (seen -0.1413 / unseen -0.2751): they omit
# --av-logit-prior 3.0, so run_mansy rebuilt the policy WITHOUT the
# +3.0*standardized-AV logit term it was trained with.  run_mansy now
# restores net flags from the checkpoint's .netcfg.json sidecar; the
# corrected re-eval is artifacts/round5/dagger_v16_reeval.sh.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rl16/models
export MANSY_RESULTS_DIR=/root/runs/rl16/results
OUT=/root/repo/artifacts/round4
RUN=/root/runs/rl16
mkdir -p $RUN
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_v16.ckpt

# ---- Phase A: gt-scored causal-h3 demo core with exact corrected-AV obs ----
timeout 2400 python -m mansy_immersivevideostreaming_tpu.cli.run_expert \
  --train --causal-bw --horizon 3 --demo-samples 1427 --lane-chunk 32 \
  --exact-action-values --acc-correct-obs \
  --seed 7 > $RUN/demo_gen.log 2>&1 || exit 1
echo PHASE_A_DONE

# ---- Phase B: pin [1,7,1] -> 10 in the core ----
DEMOS=$RUN/models/bitrate_selection/expert/Jin2022_4G/qoe0_1_2_3/train_demonstrations.pkl
timeout 600 python benchmarks/pin_demo_labels.py $DEMOS \
  $RUN/demos_causal_h3_pinned.pkl --pin 1:10 || exit 1
echo PHASE_B_DONE

# ---- Phase C: DAgger (v15 recipe, gt-causal teacher) ----
timeout 2700 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 10 --lanes 32 --horizon 3 --bc-steps 800 --batch-size 4096 \
  --lr 3e-4 --ent-coef 0 \
  --causal-expert --exact-action-values --acc-correct-obs \
  --class-balance 0.5 --pref-interp 6 --relabel-weight 2 \
  --qoe-sample-weights 2 0.5 4 4 \
  --av-logit-prior 3.0 \
  --pin-expert 1:10 \
  --demos-path $RUN/demos_causal_h3_pinned.pkl \
  --output-path $DAGGER --seed 111 > $RUN/dagger_v16.log 2>&1 || exit 1
cp $RUN/dagger_v16.log $OUT/dagger_v16_training.log
echo PHASE_C_DONE

# ---- Phase D: seen grid eval (best-valid ckpt) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --exact-action-values --acc-correct \
  --policy-path $DAGGER --seed 111 > $RUN/eval_seen.log 2>&1 || exit 1
cp $SEEN/*seed_111*/results.csv $OUT/dagger_v16_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v16_seen_results.csv
echo PHASE_D_DONE

# ---- Phase E: unseen grid eval ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --exact-action-values --acc-correct \
  --policy-path $DAGGER --seed 111 > $RUN/eval_unseen.log 2>&1 || exit 1
cp $UNSEEN/*seed_111*/results.csv $OUT/dagger_v16_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v16_unseen_results.csv
echo PHASE_E_DONE

# ---- Phase F: last-round ckpt evals ----
# (seed 112 exists ONLY to route outputs into distinct *seed_112* results
# dirs; with --deterministic-eval the seed does not affect the results)
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --exact-action-values --acc-correct \
  --policy-path $DAGGER.last --seed 112 > $RUN/eval_seen_last.log 2>&1 || exit 1
cp $SEEN/*seed_112*/results.csv $OUT/dagger_v16last_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --exact-action-values --acc-correct \
  --policy-path $DAGGER.last --seed 112 > $RUN/eval_unseen_last.log 2>&1 || exit 1
cp $UNSEEN/*seed_112*/results.csv $OUT/dagger_v16last_unseen_results.csv
echo V16_ALL_DONE
