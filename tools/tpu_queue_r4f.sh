#!/bin/bash
# Round-4 third TPU pass: gradient-accumulation experiment for the
# bsz-64 copy penalty, and a bsz-64 re-trace with the op-category
# rollup.  Run after tpu_queue_r4e.sh drains.
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r4_queue

step () {
  local dir=$1 name=$2 t=$3; shift 3
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "eval/$dir/$name.log" 2>&1
  echo "--- rc=$? tail:"
  tail -2 "eval/$dir/$name.log"
}

step r4_queue accum_bsz64 2400 python eval/bench_accum.py
step r4_queue trace_bsz64_cats 2400 python eval/trace_ex1_step.py \
  --task ex1 --bf16 --batches 64 --trace-batch 64 \
  --out eval/trace_ex1_bsz64_cats.json
echo "r4f queue done ($(date +%H:%M:%S))"
