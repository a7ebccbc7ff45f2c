#!/bin/bash
# Round-5 TPU sequencer, part g (reprioritized tail of part f).
# The torch anchor's every-epoch tail validation reached best-clean
# 1.5528e-3 @ep453 — within 1% of our 1.538e-3 matched-budget number —
# and the EMA arm measured neutral (1.5610e-3).  The 500-ep champion
# recipe ran with ZERO dropout while its train/val gap (6.4e-4 vs
# 1.56e-3) says regularization binds at this budget; score-dropout 0.1
# is the measured 100-ep winner and is untested at 500 ep with constant
# beta1.  Run those cells first, keep one lr variation, drop the rest.
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r5

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  sleep 3
fi

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

run_ex1 sd01          --lr 6e-4 --score-dropout 0.1
run_ex1 sd01_ema999   --lr 6e-4 --score-dropout 0.1 --ema-decay 0.999
run_ex1 sd005         --lr 6e-4 --score-dropout 0.05
run_ex1 lr8e4_ema999  --lr 8e-4 --ema-decay 0.999
run_ex1 sd01_s42      --lr 6e-4 --score-dropout 0.1 --seed 42

echo "r5g sweep done ($(date +%H:%M:%S))"
