#!/bin/bash
# Round-5 TPU sequencer, part e (session continuation).
# Supersedes r5d's tail (the r5d bash parent is killed; its in-flight
# 500ep_data32x python keeps running and this queue waits for it).
#
#   0. wait           — for the 32x data-ladder cell (pid passed as $1)
#   1. ex1 matched-budget recipe sweep — the torch 500-ep anchor is
#      annealing hard (1.62e-3 @ep440, falling); our controlled-row
#      number (1.558e-3, lr6e4_base) must stay decisively ahead.  The
#      r4 sweep's EMA arm was cut at ep415 while still monotonically
#      improving — finish it, plus nearby arms.  Each arm ~5 min.
#   2. ex3_clean_8192_200ep — r4's cell had monotone val at ep100.
#   3. ex3_baseline_8192    — noise cell at 8192 if budget remains.
# Hard TPU deadline 08:30 so the round-end driver bench gets the chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r5

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  sleep 5
fi

DEADLINE=$(date -d "2026-08-20 08:30" +%s)

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
run_ex1 lr4e4_ema999  --lr 4e-4 --ema-decay 0.999
run_ex1 lr8e4_ema999  --lr 8e-4 --ema-decay 0.999
run_ex1 gamma05_ema   --lr 6e-4 --gamma 0.05 --ema-decay 0.999

step () {  # step <name> <cmd...>
  local name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  local budget=$(( DEADLINE - $(date +%s) ))
  timeout "$budget" "$@" > "eval/r5/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -n 2 "eval/r5/$name.log"
}

BUDGET=$(( DEADLINE - $(date +%s) ))
if [ "$BUDGET" -ge 7200 ]; then
  step ex3_clean_8192_200ep python examples/ex3_darcy_inv.py \
    --noise 0.0 --n-samples 8192 --train-len 8192 --ema-decay 0.999 \
    --epochs 200
else
  echo "skip ex3_clean_8192_200ep: only ${BUDGET}s left"
fi

BUDGET=$(( DEADLINE - $(date +%s) ))
if [ "$BUDGET" -ge 3600 ]; then
  step ex3_baseline_8192 python examples/ex3_darcy_inv.py \
    --subsample-nodes 2 --subsample-attn 6 --noise 0.05 --n-samples 8192 \
    --train-len 8192 --online-noise --ema-decay 0.999 --epochs 100
else
  echo "skip ex3_baseline_8192: only ${BUDGET}s left"
fi

echo "r5e queue done ($(date +%H:%M:%S))"
