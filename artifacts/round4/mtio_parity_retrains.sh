#!/bin/bash
# Round-4: accuracy-parity retrains for the two claimed MTIO speedups
# (VERDICT r3 item 5 / BASELINE "round-4 item").  AR-f32 baseline (round 2,
# same code path, seed 5): seen 86.64 / unseen 84.86 @0.2s.
# Three 200-epoch retrains on the real chip: AR-bf16, TF-f32, TF-bf16.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/root/repo/artifacts/round4
mkdir -p $OUT /root/runs/vp

run_variant () {
  NAME=$1; shift
  export MANSY_MODELS_DIR=/root/runs/vp/models_$NAME
  export MANSY_RESULTS_DIR=/root/runs/vp/results_$NAME
  mkdir -p $MANSY_MODELS_DIR $MANSY_RESULTS_DIR
  timeout 4000 python -m mansy_immersivevideostreaming_tpu.cli.run_models \
    --model mtio --train --test --epochs 200 --bs 512 --lr 1e-4 --seed 5 \
    "$@" > /root/runs/vp/$NAME.log 2>&1 || { echo "FAIL $NAME"; return 1; }
  RD=$MANSY_RESULTS_DIR/mtio/Jin2022/5Hz
  for side in seen unseen; do
    cp $RD/*_${side}_accuracy_result.csv $OUT/mtio_${NAME}_${side}_accuracy.csv
  done
  grep -m1 -A3 "samples/s" /root/runs/vp/$NAME.log | head -2
  echo "DONE $NAME"
}

run_variant ar_bf16 --bf16
run_variant tf_f32 --teacher-forcing
run_variant tf_bf16 --teacher-forcing --bf16
echo ALL_RETRAINS_DONE
