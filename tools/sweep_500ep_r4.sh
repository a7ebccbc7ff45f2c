#!/bin/bash
# Round-4 500-epoch ex1 sweep (VERDICT r3 item 1): push the long-budget
# Burgers cell toward <=1e-3.  Baseline champion: constant-beta1 lr 6e-4
# -> 1.538e-3 (docs/PERFORMANCE.md).  Levers per VERDICT: width, EMA
# decay at long budget, lr floor.  Runs sequentially (one TPU chip).
set -u
cd "$(dirname "$0")/.."
LOGDIR=eval/sweep_500ep_r4
mkdir -p "$LOGDIR"

run() {
  name=$1; shift
  log="$LOGDIR/$name.log"
  if [ -f "$log" ] && grep -q "Best model's validation metric" "$log"; then
    echo "skip $name (done)"; return
  fi
  echo "=== $name: $* ==="
  timeout 7200 python examples/ex1_burgers.py --attention-type galerkin \
    --no-cycle-momentum --epochs 500 --rollback-on-spike 10 \
    --epochs-per-dispatch 5 "$@" > "$log" 2>&1
  grep -E "Best model's validation metric|best" "$log" | tail -2
}

run lr6e4_base        --lr 6e-4
run lr6e4_ema999      --lr 6e-4 --ema-decay 0.999
run lr6e4_floor100    --lr 6e-4 --final-div 100
run lr6e4_d128        --lr 6e-4 --n-hidden 128
run lr6e4_d128_ema    --lr 6e-4 --n-hidden 128 --ema-decay 0.999
echo "sweep stage 1 done"
