#!/bin/bash
# Round-5 v24: the preference-routed ensemble — the ceiling analysis's
# composite, made deployable.
#
# The unseen ceiling analysis (BASELINE round 5) proved the per-cell best
# behaviors live in DIFFERENT training lineages (all-pins const-exact on
# quality-dominant prefs; a3-interp on mid-simplex; width-256 variance-aware
# on rebuffer-leaning) and that six controlled recipe axes each failed to
# combine them in one net: the seen/unseen trade is a converged frontier.
# But the deploy-time QoE weight vector is an INPUT: a controller holding
# all four lineage checkpoints can route each preference to the component
# with the best deterministic valid-grid QoE at that exact preference —
# validation-based model selection, decided with zero test information
# (valid videos only; the test grids differ in videos/users/traces).
#
# Components (one per lineage, default-first for tie-breaks):
#   v7       a3-interp flagship        (artifacts/round3, unseen +0.1047)
#   v9       dynamic-burst flagship    (artifacts/round4, seen  +0.1258)
#   v18      width-256 variance-aware  (artifacts/round5, only-above-const [2,4,3])
#   v21.last all-pins recovered        (artifacts/round5, const-exact [5,1,3])
#
# Success = routed unseen grid > +0.1053 (the bang-bang ceiling no single
# policy cleared) with routed seen >= v9's +0.1258.  Composite-from-
# committed-grids upper reference: seen +0.1273 / unseen +0.1069 — reached
# only if the valid videos rank components the way the test videos do.
set -euxo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/artifacts/round5
RUN=/root/runs/ens24
mkdir -p $RUN
CKPTS="artifacts/round3/dagger_v7.ckpt artifacts/round4/dagger_v9.ckpt artifacts/round5/dagger_v18.ckpt artifacts/round5/dagger_v21.ckpt.last"
NAMES="v7 v9 v18 v21last"

timeout 2700 python -m mansy_immersivevideostreaming_tpu.cli.run_ensemble \
  --ckpts $CKPTS --names $NAMES --test-on-seen \
  --output-csv $OUT/ensemble_v24_seen_results.csv \
  --route-json $OUT/ensemble_v24_seen_route.json \
  > $RUN/ens_seen.log 2>&1 || exit 1
python benchmarks/per_preference.py $OUT/ensemble_v24_seen_results.csv

timeout 2700 python -m mansy_immersivevideostreaming_tpu.cli.run_ensemble \
  --ckpts $CKPTS --names $NAMES \
  --output-csv $OUT/ensemble_v24_unseen_results.csv \
  --route-json $OUT/ensemble_v24_unseen_route.json \
  > $RUN/ens_unseen.log 2>&1 || exit 1
python benchmarks/per_preference.py $OUT/ensemble_v24_unseen_results.csv

git -C /root/repo add artifacts/round5/ensemble_v24_seen_results.csv \
  artifacts/round5/ensemble_v24_seen_route.json \
  artifacts/round5/ensemble_v24_unseen_results.csv \
  artifacts/round5/ensemble_v24_unseen_route.json \
  && git -C /root/repo commit -q -m "v24 routed-ensemble grids + routing evidence

No-Verification-Needed: result CSVs and routing-evidence JSON only" || true
echo V24_DONE
