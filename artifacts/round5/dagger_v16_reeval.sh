#!/bin/bash
# Round-5 item 2 (v16 post-mortem): re-evaluate the landed v16 checkpoints
# with the policy constructed EXACTLY as trained.  The round-4 eval omitted
# --av-logit-prior 3.0 (dagger_v16_run.sh phases D-F), evaluating a policy
# whose logits lack the +3.0*standardized-AV term it was trained with —
# the committed "collapse" grids (seen -0.1413 / unseen -0.2751) measured
# that different policy, not the trained one.  run_mansy --test now
# restores net/obs flags from the checkpoint's .netcfg.json sidecar, so no
# construction flags appear below at all; --exact-action-values/--acc-correct
# (obs wiring) also come from the sidecar.
# Seeds 113/114 exist ONLY to route outputs into distinct results dirs;
# with --deterministic-eval the seed does not affect results.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export MANSY_MODELS_DIR=/root/runs/rl16fix/models
export MANSY_RESULTS_DIR=/root/runs/rl16fix/results
OUT=/root/repo/artifacts/round5
RUN=/root/runs/rl16fix
mkdir -p $RUN $OUT
SEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/seen_qoe0_1_2_3
UNSEEN=$RUN/results/bitrate_selection/mansy/Jin2022_4G/unseen_qoe0_1_2_3

# ---- best-valid ckpt ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path artifacts/round4/dagger_v16.ckpt --seed 113 \
  > $RUN/eval_seen.log 2>&1
cp $SEEN/*seed_113*/results.csv $OUT/dagger_v16fix_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v16fix_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path artifacts/round4/dagger_v16.ckpt --seed 113 \
  > $RUN/eval_unseen.log 2>&1
cp $UNSEEN/*seed_113*/results.csv $OUT/dagger_v16fix_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v16fix_unseen_results.csv

# ---- last-round ckpt ----
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --test-on-seen --deterministic-eval \
  --policy-path artifacts/round4/dagger_v16.ckpt.last --seed 114 \
  > $RUN/eval_seen_last.log 2>&1
cp $SEEN/*seed_114*/results.csv $OUT/dagger_v16fixlast_seen_results.csv
timeout 1800 python -m mansy_immersivevideostreaming_tpu.cli.run_mansy \
  --test --deterministic-eval \
  --policy-path artifacts/round4/dagger_v16.ckpt.last --seed 114 \
  > $RUN/eval_unseen_last.log 2>&1
cp $UNSEEN/*seed_114*/results.csv $OUT/dagger_v16fixlast_unseen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v16fixlast_seen_results.csv
python benchmarks/per_preference.py $OUT/dagger_v16fixlast_unseen_results.csv
echo V16_REEVAL_DONE
