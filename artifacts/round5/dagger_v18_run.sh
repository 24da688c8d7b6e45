#!/bin/bash
# Round-5 v18/v19: the capacity experiment (VERDICT r4 item 4).
#
# Identical fresh-init recipes differing ONLY in --hidden-dim: v18 = 256,
# v19 = 128 (the controlled pair; every earlier run inherited the
# reference's width 128, /root/reference/bitrate_selection/models/mansy.py:14-51,
# and every failure analysis since v11 ends at "the 128-hidden clone can't
# place the teacher's burst boundary").  Teacher/core = the v17
# per-preference hybrid (gt-causal-h3 on [7,1,1] + interp, corrected-h3 on
# [3,3,3], const-10 pins on [1,7,1]/[1,1,7]) — see dagger_v17_run.sh; the
# merged core is reused from the v17 run dir.
#
# Usage: HIDDEN=256 SEED=131 NAME=v18 bash dagger_v18_run.sh
#        HIDDEN=128 SEED=141 NAME=v19 bash dagger_v18_run.sh
set -euxo pipefail
HIDDEN=${HIDDEN:?set HIDDEN}
SEED=${SEED:?set SEED}
NAME=${NAME:?set NAME}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rl$NAME/models
export MANSY_RESULTS_DIR=/root/runs/rl$NAME/results
OUT=/root/repo/artifacts/round5
RUN=/root/runs/rl$NAME
mkdir -p $RUN/models/bitrate_selection/expert $OUT
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_$NAME.ckpt
SEED2=$((SEED + 1))

cp -n /root/runs/rl16/models/bitrate_selection/expert/Jin2022_cache.pkl \
      /root/runs/rl16/models/bitrate_selection/expert/Jin2022_valid_cache.pkl \
      $RUN/models/bitrate_selection/expert/ || true

# ---- Phase C: DAgger, fresh init, per-pref relabel scoring ----
# 16 rounds, not 20: v17 ran ~145 s/round at width 128 and was cut by its
# 3300 s timeout at 15/16; a wider net is slower still.  Checkpoint
# selection is the deterministic valid-grid statistic (run_dagger d77feac).
timeout 5400 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 16 --lanes 32 --horizon 3 --bc-steps 800 --batch-size 4096 \
  --lr 3e-4 --ent-coef 0 \
  --causal-expert --acc-correct-prefs 3 \
  --class-balance 0.5 --pref-interp 6 --relabel-weight 2 \
  --qoe-sample-weights 4 0.5 0.5 4 \
  --pin-expert 1:10 2:10 \
  --hidden-dim $HIDDEN \
  --demos-path /root/runs/rl17/demos_v17_hybrid.pkl \
  --output-path $DAGGER --seed $SEED > $RUN/dagger_$NAME.log 2>&1 || exit 1
cp $RUN/dagger_$NAME.log $OUT/dagger_${NAME}_training.log
echo PHASE_C_DONE

# ---- Phase D: seen/unseen grids (best-valid ckpt; sidecar restores net) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER --seed $SEED > $RUN/eval_seen.log 2>&1 || exit 1
cp $SEEN/*seed_${SEED}*/results.csv $OUT/dagger_${NAME}_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_${NAME}_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER --seed $SEED > $RUN/eval_unseen.log 2>&1 || exit 1
cp $UNSEEN/*seed_${SEED}*/results.csv $OUT/dagger_${NAME}_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_${NAME}_unseen_results.csv
echo PHASE_D_DONE

# ---- Phase E: last-round ckpt grids (SEED2 routes outputs only) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER.last --seed $SEED2 > $RUN/eval_seen_last.log 2>&1 || exit 1
cp $SEEN/*seed_${SEED2}*/results.csv $OUT/dagger_${NAME}last_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER.last --seed $SEED2 > $RUN/eval_unseen_last.log 2>&1 || exit 1
cp $UNSEEN/*seed_${SEED2}*/results.csv $OUT/dagger_${NAME}last_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_${NAME}last_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_${NAME}last_unseen_results.csv
echo ${NAME}_DONE
