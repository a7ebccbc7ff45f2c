#!/bin/bash
# Round-5 TPU follow-up: waits for tools/tpu_queue_r5.sh (pid $1), then
# runs the bonus cells:
#   1. super_res_reverse — train full-res n=8192, eval zero-shot on the
#      subsampled n=2048 grid (VERDICT r4 item 6 bonus direction)
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r5

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
  sleep 5
fi

step () {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "eval/r5/$name.log" 2>&1
  echo "--- rc=$? tail:"
  tail -2 "eval/r5/$name.log"
}

step super_res_reverse 7200 python examples/ex1_burgers_super_res.py \
  --train-subsample 1 --eval-subsample 4 --score-dropout 0.1 --epochs 100

echo "r5b queue done ($(date +%H:%M:%S))"
