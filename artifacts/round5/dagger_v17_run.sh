#!/bin/bash
# Round-5 v17: per-preference hybrid teacher, warm-started from v9.
#
# Teacher per train preference (BASELINE round-4/5 per-cell evidence):
#   * [7,1,1] (idx 0): gt-causal-h3 relabels — v9 proved the clone realizes
#     the above-bang-bang gain there (+0.6334 > +0.6253 pin)
#   * [1,7,1] (idx 1): pin -> action 10 (per-cell optimal const-min)
#   * [1,1,7] (idx 2): pin -> action 10 (const-min -0.0157 beats every
#     causally-scored controller: corrected-h3 is -0.0269)
#   * [3,3,3] (idx 3): accuracy-corrected causal-h3 relabels — the only
#     causally-consistent teacher above the clone's +0.0140 (+0.0201)
#   * interp prefs: gt-causal-h3 (default False in --acc-correct-prefs)
# Demo core merged the same way (benchmarks/merge_demos.py), so labels are
# consistent per preference across core and relabels (v9's lesson: relabel
# weight cannot outvote an inconsistent core).
# Policy: v9's net (hidden 128, NO action-value obs -> core obs strip the
# action_values field the v16-era core carries).
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rl17/models
export MANSY_RESULTS_DIR=/root/runs/rl17/results
OUT=/root/repo/artifacts/round5
RUN=/root/runs/rl17
mkdir -p $RUN/models/bitrate_selection/expert $OUT
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_v17.ckpt

# warm expert caches from the v16 run (profiling tables are identical)
cp -n /root/runs/rl16/models/bitrate_selection/expert/Jin2022_cache.pkl \
      /root/runs/rl16/models/bitrate_selection/expert/Jin2022_valid_cache.pkl \
      $RUN/models/bitrate_selection/expert/ || true

# ---- Phase A: corrected-h3 demo core (same seed-7 sample grid as v16's
#      gt core, so merge keys line up) ----
timeout 2400 python -m mansy_immersivevideostreaming_tpu.cli.run_expert \
  --train --causal-bw --horizon 3 --demo-samples 1427 --lane-chunk 32 \
  --acc-correct \
  --seed 7 > $RUN/demo_gen_corr.log 2>&1 || exit 1
echo PHASE_A_DONE

# ---- Phase B: merge gt core (idx 0,1,2 + interp) with corrected core
#      (idx 3), strip the AV obs field, pin idx 1 and 2 -> 10 ----
CORR=$RUN/models/bitrate_selection/expert/Jin2022_4G/qoe0_1_2_3/train_demonstrations.pkl
timeout 600 python benchmarks/merge_demos.py \
  /root/runs/rl16/demos_causal_h3_pinned.pkl $CORR \
  $RUN/demos_v17_merged.pkl --take-other 3 --strip-obs action_values || exit 1
timeout 600 python benchmarks/pin_demo_labels.py $RUN/demos_v17_merged.pkl \
  $RUN/demos_v17_hybrid.pkl --pin 1:10 2:10 || exit 1
echo PHASE_B_DONE

# ---- Phase C: DAgger, warm from v9, per-pref relabel scoring ----
timeout 3300 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 16 --lanes 32 --horizon 3 --bc-steps 800 --batch-size 4096 \
  --lr 3e-4 --ent-coef 0 \
  --causal-expert --acc-correct-prefs 3 \
  --class-balance 0.5 --pref-interp 6 --relabel-weight 2 \
  --qoe-sample-weights 4 0.5 0.5 4 \
  --pin-expert 1:10 2:10 \
  --init-path artifacts/round4/dagger_v9.ckpt \
  --demos-path $RUN/demos_v17_hybrid.pkl \
  --output-path $DAGGER --seed 121 > $RUN/dagger_v17.log 2>&1 || exit 1
cp $RUN/dagger_v17.log $OUT/dagger_v17_training.log
echo PHASE_C_DONE

# ---- Phase D: seen/unseen grids (best-valid ckpt; net flags restored
#      from the .netcfg.json sidecar) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER --seed 121 > $RUN/eval_seen.log 2>&1 || exit 1
cp $SEEN/*seed_121*/results.csv $OUT/dagger_v17_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v17_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER --seed 121 > $RUN/eval_unseen.log 2>&1 || exit 1
cp $UNSEEN/*seed_121*/results.csv $OUT/dagger_v17_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v17_unseen_results.csv
echo PHASE_D_DONE

# ---- Phase E: last-round ckpt grids (seed 122 exists ONLY to route
#      outputs into distinct results dirs; deterministic eval) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER.last --seed 122 > $RUN/eval_seen_last.log 2>&1 || exit 1
cp $SEEN/*seed_122*/results.csv $OUT/dagger_v17last_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER.last --seed 122 > $RUN/eval_unseen_last.log 2>&1 || exit 1
cp $UNSEEN/*seed_122*/results.csv $OUT/dagger_v17last_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v17last_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v17last_unseen_results.csv
echo V17_DONE
