#!/bin/bash
# Round-4 final sequencer (replaces the r4g tail + r4h chain, reordered
# so the quick cells land before the multi-hour one):
#   1. wait for the in-flight ex3_clean_150ep python (pid passed as $1)
#   2. 500ep_fullres + 500ep_fullres_data4x (quick, novel capability rows)
#   3. ex4_4096 (NS data lever)
#   4. ex3_baseline_8192 LAST (multi-hour; fine to lose to round end)
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r4_queue eval/r4_accuracy

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  sleep 15   # let the TPU client tear down cleanly
fi

step () {  # step <dir> <name> <timeout_s> <cmd...>
  local dir=$1 name=$2 t=$3; shift 3
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "eval/$dir/$name.log" 2>&1
  echo "--- rc=$? tail:"
  tail -2 "eval/$dir/$name.log"
}

step r4_accuracy 500ep_fullres 7200 python examples/ex1_burgers.py \
  --attention-type galerkin --subsample 1 --epochs 500 --lr 6e-4 \
  --no-cycle-momentum --rollback-on-spike 10 --epochs-per-dispatch 5 \
  --n-samples 2148

step r4_accuracy 500ep_fullres_data4x 10800 python examples/ex1_burgers.py \
  --attention-type galerkin --subsample 1 --epochs 500 --lr 6e-4 \
  --no-cycle-momentum --rollback-on-spike 10 --epochs-per-dispatch 5 \
  --n-samples 8592

step r4_accuracy ex4_4096 14400 python "examples/ex4_navier_stokes_2+1d.py" \
  --n-samples 4096 --ema-decay 0.999 --epochs 100

step r4_accuracy ex3_baseline_8192 28800 python examples/ex3_darcy_inv.py \
  --subsample-nodes 2 --subsample-attn 6 --noise 0.05 --n-samples 8192 \
  --train-len 8192 --online-noise --ema-decay 0.999 --epochs 100

echo "r4i queue done ($(date +%H:%M:%S))"
