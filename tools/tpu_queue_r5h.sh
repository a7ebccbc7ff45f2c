#!/bin/bash
# Round-5 TPU sequencer, part h (final arms).
# Score dropout measured WORSE at 500 ep (sd01_ema999 1.7413e-3 vs
# ema999 1.5610e-3) — the 100-ep regularization win does not transfer.
# Last untried matched-budget lever: batch size 4 (2x optimizer steps,
# more gradient noise — the classic small-data generalization lever;
# all prior 500-ep cells used bsz 8).
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r5

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  sleep 3
fi

run_ex1 () {
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

run_ex1 bsz4_lr6e4  --lr 6e-4 --batch-size 4
run_ex1 bsz4_lr4e4  --lr 4e-4 --batch-size 4

echo "r5h sweep done ($(date +%H:%M:%S))"
