#!/bin/bash
# Round-4 stretch queue (chained after tpu_queue_r4g.sh):
#   - 500ep_fullres: 500-epoch FULL-RESOLUTION n=8192 Burgers with the
#     long-budget recipe + 2x data — a cell the reference never
#     publishes (its 500-ep headline is n=2048); ~25 min on the device
#     epoch loop
#   - 500ep_fullres_data4x: same with 4296 train samples
#   - ex4_4096: NS rollout data lever at 4096 device-generated
#     trajectories (1.555e-3 at 2048; generation ~14 min)
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r4_queue eval/r4_accuracy

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

echo "r4h queue done ($(date +%H:%M:%S))"
