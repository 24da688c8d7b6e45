#!/bin/bash
# Round-5 v20: protect what transfers, attack the one open cell.
#
# Mechanism evidence (BASELINE rounds 3-5): v7's unseen mean (+0.1047) sits
# 0.0006 under the unseen bang-bang ceiling because its pinned const
# behavior transfers exactly ([5,1,3] -> const-max = that cell's optimum);
# every run that made [7,1,1] dynamic (v9/v17/v18) paid more on unseen
# [5,1,3] than it gained on seen.  The only seen cell with unclaimed
# headroom that does NOT trade against unseen transfer is [3,3,3]
# (+0.0203 clone vs +0.0757 teacher).  So v20 = warm start from v7, pin
# ALL THREE constant-optimal cells in core AND relabels (0:14, 1:10, 2:10),
# and spend ~97% of the rollout budget on [3,3,3] + interpolated
# preferences with corrected-h3 relabels on [3,3,3] (matching the v17
# hybrid core, so core/relabel labels stay consistent per preference).
# Upside case: [3,3,3] climbs past +0.0203 -> seen mean > v9's +0.1258
# with no cell regressing below v7; unseen keeps v7's transfer, and if the
# [2,4,3] region inherits mild variance-aware dynamics (v18 scored -0.0642
# there vs const-min's -0.0690), unseen clears the +0.1053 bang-bang
# ceiling for the first time.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rlv20/models
export MANSY_RESULTS_DIR=/root/runs/rlv20/results
OUT=/root/repo/artifacts/round5
RUN=/root/runs/rlv20
mkdir -p $RUN/models/bitrate_selection/expert $OUT
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_v20.ckpt

cp -n /root/runs/rl16/models/bitrate_selection/expert/Jin2022_cache.pkl \
      /root/runs/rl16/models/bitrate_selection/expert/Jin2022_valid_cache.pkl \
      $RUN/models/bitrate_selection/expert/ || true

# ---- Phase B: add the [7,1,1]->14 pin on top of the v17 hybrid core
#      (which already pins 1:10 2:10 and carries corrected-[3,3,3] labels) ----
timeout 600 python benchmarks/pin_demo_labels.py \
  /root/runs/rl17/demos_v17_hybrid.pkl $RUN/demos_v20.pkl --pin 0:14 || exit 1
echo PHASE_B_DONE

# ---- Phase C: DAgger, warm from v7, all-constant cells pinned ----
timeout 5400 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 16 --lanes 32 --horizon 3 --bc-steps 800 --batch-size 4096 \
  --lr 3e-4 --ent-coef 0 \
  --causal-expert --acc-correct-prefs 3 \
  --class-balance 0.5 --pref-interp 6 --relabel-weight 2 \
  --qoe-sample-weights 0.5 0.5 0.5 5 2 2 2 2 2 2 \
  --pin-expert 0:14 1:10 2:10 \
  --init-path artifacts/round3/dagger_v7.ckpt \
  --demos-path $RUN/demos_v20.pkl \
  --output-path $DAGGER --seed 151 > $RUN/dagger_v20.log 2>&1 || exit 1
cp $RUN/dagger_v20.log $OUT/dagger_v20_training.log
echo PHASE_C_DONE

# ---- Phase D: seen/unseen grids (best valid-grid ckpt) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER --seed 151 > $RUN/eval_seen.log 2>&1 || exit 1
cp $SEEN/*seed_151*/results.csv $OUT/dagger_v20_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v20_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER --seed 151 > $RUN/eval_unseen.log 2>&1 || exit 1
cp $UNSEEN/*seed_151*/results.csv $OUT/dagger_v20_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v20_unseen_results.csv
echo PHASE_D_DONE

# ---- Phase E: last-round ckpt grids (seed 152 routes outputs only;
#      --deterministic-eval makes the seed irrelevant to results) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER.last --seed 152 > $RUN/eval_seen_last.log 2>&1 || exit 1
cp $SEEN/*seed_152*/results.csv $OUT/dagger_v20last_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER.last --seed 152 > $RUN/eval_unseen_last.log 2>&1 || exit 1
cp $UNSEEN/*seed_152*/results.csv $OUT/dagger_v20last_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v20last_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v20last_unseen_results.csv
echo V20_DONE
