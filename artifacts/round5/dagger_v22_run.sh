#!/bin/bash
# Round-5 v22: margin-filtered relabels — confident-teacher distillation.
#
# The five-round clone-gap conclusion (BASELINE v18/v19) is that the
# residual gap is a property of the OBJECTIVE: CE on causally-ambiguous
# boundary states, where the causal-h3 teacher's argmax is effectively a
# coin flip given the observation (near-tied action values), so the labels
# look stochastic and the clone smooths/misplaces the burst boundary.
# v22 attacks that objective directly: `run_dagger --relabel-margin-q 0.5`
# drops, each round, the half of the non-pinned relabels with the smallest
# teacher decision margin (best minus second-best first-action value,
# weight-sum-normalized; pins are +inf = always kept).  On ambiguous states
# the policy keeps its prior — which the teacher itself says is
# near-equivalent — and the CE signal concentrates on the confident
# dips/bursts that carry the QoE.
#
# Controlled pair: everything else is IDENTICAL to dagger_v21_run.sh
# (init from v20's last-round params = the all-pins recipe's fixed point,
# same demos/flags/rounds), so v22 vs v21 isolates the filter.  Upside
# case: the filtered aggregate shifts the fixed point — [3,3,3] and the
# [4,4,1]-like interp behavior improve without the pinned cells moving,
# pushing unseen above v7's +0.1047 frontier (bang-bang ceiling +0.1053).
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rlv22/models
export MANSY_RESULTS_DIR=/root/runs/rlv22/results
OUT=/root/repo/artifacts/round5
RUN=/root/runs/rlv22
mkdir -p $RUN/models/bitrate_selection/expert $OUT
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_v22.ckpt

cp -n /root/runs/rl16/models/bitrate_selection/expert/Jin2022_cache.pkl \
      /root/runs/rl16/models/bitrate_selection/expert/Jin2022_valid_cache.pkl \
      $RUN/models/bitrate_selection/expert/ || true

# ---- Phase C: DAgger, v21 recipe + the margin filter ----
timeout 5400 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 16 --lanes 32 --horizon 3 --bc-steps 800 --batch-size 4096 \
  --lr 3e-4 --ent-coef 0 \
  --causal-expert --acc-correct-prefs 3 \
  --class-balance 0.5 --pref-interp 6 --relabel-weight 2 \
  --qoe-sample-weights 0.5 0.5 0.5 5 2 2 2 2 2 2 \
  --pin-expert 0:14 1:10 2:10 \
  --relabel-margin-q 0.5 \
  --init-path artifacts/round5/dagger_v20.ckpt.last \
  --demos-path /root/runs/rlv20/demos_v20.pkl \
  --output-path $DAGGER --seed 171 > $RUN/dagger_v22.log 2>&1 || exit 1
cp $RUN/dagger_v22.log $OUT/dagger_v22_training.log
echo PHASE_C_DONE

# ---- Phase D: seen/unseen grids (best valid-grid ckpt) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER --seed 171 > $RUN/eval_seen.log 2>&1 || exit 1
cp $SEEN/*seed_171*/results.csv $OUT/dagger_v22_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v22_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER --seed 171 > $RUN/eval_unseen.log 2>&1 || exit 1
cp $UNSEEN/*seed_171*/results.csv $OUT/dagger_v22_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v22_unseen_results.csv
echo PHASE_D_DONE

# ---- Phase E: last-round ckpt grids (seed 172 routes outputs only;
#      --deterministic-eval makes the seed irrelevant to results) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER.last --seed 172 > $RUN/eval_seen_last.log 2>&1 || exit 1
cp $SEEN/*seed_172*/results.csv $OUT/dagger_v22last_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER.last --seed 172 > $RUN/eval_unseen_last.log 2>&1 || exit 1
cp $UNSEEN/*seed_172*/results.csv $OUT/dagger_v22last_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v22last_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v22last_unseen_results.csv
echo V22_DONE
