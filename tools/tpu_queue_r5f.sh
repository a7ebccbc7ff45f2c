#!/bin/bash
# Round-5 TPU sequencer, part f (post-reset recovery).
# The 04:35 machine reset killed the r5e queue before any sweep arm ran
# and cut the torch anchor at epoch 441 (resumed separately on CPU).
# This queue runs the matched-budget ex1 recipe sweep the r5e queue
# intended: the torch anchor is annealing hard (1.62e-3 @ep440, falling
# toward ~1.3e-3 by extrapolation) and our controlled-row number
# (1.5577e-3, lr6e4_base) needs head-room.  The r4 EMA arm was cut at
# ep415 while still monotonically improving (1.659e-3) — finish it and
# nearby arms.  Each arm ~4 min on the chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r5

run_ex1 () {  # run_ex1 <name> <extra args...>
  local name=$1; shift
  local log="eval/r5/sweep_$name.log"
  if [ -f "$log" ] && grep -q "Best model's validation metric" "$log"; then
    echo "skip $name (done)"; return
  fi
  echo "=== sweep_$name ($(date +%H:%M:%S)) ==="
  timeout 1200 python examples/ex1_burgers.py --attention-type galerkin \
    --no-cycle-momentum --epochs 500 --rollback-on-spike 10 \
    --epochs-per-dispatch 5 "$@" > "$log" 2>&1
  echo "--- rc=$?"; grep "Best model" "$log" || tail -n 1 "$log"
}

run_ex1 ema999        --lr 6e-4 --ema-decay 0.999
run_ex1 ema9995       --lr 6e-4 --ema-decay 0.9995
run_ex1 lr8e4_ema999  --lr 8e-4 --ema-decay 0.999
run_ex1 lr4e4_ema999  --lr 4e-4 --ema-decay 0.999
run_ex1 gamma05_ema   --lr 6e-4 --gamma 0.05 --ema-decay 0.999

echo "r5f sweep done ($(date +%H:%M:%S))"
