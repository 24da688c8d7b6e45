#!/bin/bash
# Round-5 v23: the selection-fix demonstration — v21's EXACT trajectory,
# re-selected with an interp-aware valid grid.
#
# v20/v21 exposed a structural selection gap: the valid split's preferences
# are the train preferences, so the deterministic-argmax valid grid cannot
# see mid-simplex interpolation behavior and picks the round-2 point both
# times — exactly where the round-0 BC refit has collapsed [4,4,1] to
# const-max (unseen +0.0774/+0.0825); only the committed `.last` convention
# exposes the recovered policy (+0.0961/+0.0959).  `--valid-interp 6`
# (b78a8ed) appends 6 Dirichlet convex combinations of the valid
# preferences to the selection grid, drawn from a distinct rng stream than
# the training interpolation so selection measures generalization.
#
# Controlled replay: every training flag, the seed (161), the init
# (v20.ckpt.last), and the demos are IDENTICAL to dagger_v21_run.sh —
# --valid-interp changes no training rng stream (separate
# default_rng(seed+9973)), so the parameter trajectory replays v21
# round-for-round (modulo TPU float nondeterminism; verify: the q0..q3
# valid entries should match dagger_v21_training.log) and the ONLY live
# variable is the selection statistic.  Success = the best-valid checkpoint
# is picked late (recovered [4,4,1]) and its unseen grid lands near
# v21-last's +0.0959 instead of v21-best's +0.0825, i.e. selection now
# finds on its own the compromise point that previously required the
# `.last` escape hatch.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rlv23/models
export MANSY_RESULTS_DIR=/root/runs/rlv23/results
OUT=/root/repo/artifacts/round5
RUN=/root/runs/rlv23
mkdir -p $RUN/models/bitrate_selection/expert $OUT
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3
DAGGER=$RUN/dagger_v23.ckpt

cp -n /root/runs/rl16/models/bitrate_selection/expert/Jin2022_cache.pkl \
      /root/runs/rl16/models/bitrate_selection/expert/Jin2022_valid_cache.pkl \
      $RUN/models/bitrate_selection/expert/ || true

# ---- Phase C: DAgger, v21 replay + interp-aware selection ----
timeout 5400 python -m mansy_immersivevideostreaming_tpu.cli.run_dagger \
  --rounds 16 --lanes 32 --horizon 3 --bc-steps 800 --batch-size 4096 \
  --lr 3e-4 --ent-coef 0 \
  --causal-expert --acc-correct-prefs 3 \
  --class-balance 0.5 --pref-interp 6 --relabel-weight 2 \
  --qoe-sample-weights 0.5 0.5 0.5 5 2 2 2 2 2 2 \
  --pin-expert 0:14 1:10 2:10 \
  --valid-interp 6 \
  --init-path artifacts/round5/dagger_v20.ckpt.last \
  --demos-path /root/runs/rlv20/demos_v20.pkl \
  --output-path $DAGGER --seed 161 > $RUN/dagger_v23.log 2>&1 || exit 1
cp $RUN/dagger_v23.log $OUT/dagger_v23_training.log
cp -r $DAGGER $DAGGER.netcfg.json $DAGGER.last $DAGGER.last.netcfg.json $OUT/
git -C /root/repo add artifacts/round5/dagger_v23_training.log \
  artifacts/round5/dagger_v23.ckpt artifacts/round5/dagger_v23.ckpt.netcfg.json \
  artifacts/round5/dagger_v23.ckpt.last artifacts/round5/dagger_v23.ckpt.last.netcfg.json \
  && git -C /root/repo commit -q -m "v23 training artifacts: v21 replay under interp-aware selection

No-Verification-Needed: training artifacts only (log + checkpoints)" || true
echo PHASE_C_DONE

# ---- Phase D: seen/unseen grids (interp-aware best-valid ckpt) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER --seed 161 > $RUN/eval_seen.log 2>&1 || exit 1
cp $SEEN/*seed_161*/results.csv $OUT/dagger_v23_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v23_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER --seed 161 > $RUN/eval_unseen.log 2>&1 || exit 1
cp $UNSEEN/*seed_161*/results.csv $OUT/dagger_v23_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v23_unseen_results.csv
git -C /root/repo add artifacts/round5/dagger_v23_seen_results.csv \
  artifacts/round5/dagger_v23_unseen_results.csv \
  && git -C /root/repo commit -q -m "v23 grids: interp-aware best-valid checkpoint

No-Verification-Needed: result CSVs only" || true
echo PHASE_D_DONE

# ---- Phase E: last-round ckpt grids, replay check (seed 162 routes
#      outputs only; --deterministic-eval makes it irrelevant to results) ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path $DAGGER.last --seed 162 > $RUN/eval_seen_last.log 2>&1 || exit 1
cp $SEEN/*seed_162*/results.csv $OUT/dagger_v23last_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path $DAGGER.last --seed 162 > $RUN/eval_unseen_last.log 2>&1 || exit 1
cp $UNSEEN/*seed_162*/results.csv $OUT/dagger_v23last_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v23last_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v23last_unseen_results.csv
git -C /root/repo add artifacts/round5/dagger_v23last_seen_results.csv \
  artifacts/round5/dagger_v23last_unseen_results.csv \
  && git -C /root/repo commit -q -m "v23 last-ckpt grids: trajectory-replay check vs v21-last

No-Verification-Needed: result CSVs only" || true
echo V23_DONE
