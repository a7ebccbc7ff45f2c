#!/bin/bash
# Round-4 consolidated TPU queue (restarted after the machine reset wiped
# the first two passes and every dataset cache).  Order: bounded
# measurements (VERDICT r3 items 2/3/6) first, then the accuracy runs
# (items 1/5/8) longest-last so a mid-queue reset loses the least.
# Logs under eval/r4_queue/ and eval/r4_accuracy/.
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

# --- measurements (items 2, 3, 6) ---
step r4_queue bench 2400 python bench.py
step r4_queue width_mfu 4500 python eval/bench_width_mfu.py
step r4_queue trace_ex2 1800 python eval/trace_ex1_step.py --task ex2 \
  --bf16 --batches 4 8
step r4_queue trace_bsz64 1800 python eval/trace_ex1_step.py --task ex1 \
  --bf16 --batches 8 16 32 64 --trace-batch 64 --out eval/trace_ex1_bsz64.json
step r4_queue memprof_ex1_8192 2400 python examples/ex1_memory_profile.py \
  --seq-len 8192 --batch-size 4 \
  --attention-types galerkin fourier linear softmax
step r4_queue memprof_ex2 2400 python examples/ex2_memory_profile.py \
  --n-grid 211 --n-grid-coarse 71 --batch-size 4

# --- accuracy (items 1, 5, 8); caches regenerate inside each run ---
step r4_accuracy 500ep_data2x 5400 python examples/ex1_burgers.py \
  --attention-type galerkin --epochs 500 --lr 6e-4 --no-cycle-momentum \
  --rollback-on-spike 10 --epochs-per-dispatch 5 --n-samples 4296
step r4_accuracy 500ep_data2x_ema 5400 python examples/ex1_burgers.py \
  --attention-type galerkin --epochs 500 --lr 6e-4 --no-cycle-momentum \
  --rollback-on-spike 10 --epochs-per-dispatch 5 --n-samples 4296 \
  --ema-decay 0.999
step r4_accuracy ex3_clean_8192 18000 python examples/ex3_darcy_inv.py \
  --noise 0.0 --n-samples 8192 --train-len 8192 --ema-decay 0.999 \
  --epochs 100
step r4_accuracy ex2_4096 10800 python examples/ex2_darcy.py \
  --n-samples 4096 --train-len 4096 --ema-decay 0.999 --epochs 100
step r4_accuracy 500ep_data4x 9000 python examples/ex1_burgers.py \
  --attention-type galerkin --epochs 500 --lr 6e-4 --no-cycle-momentum \
  --rollback-on-spike 10 --epochs-per-dispatch 5 --n-samples 8592
step r4_accuracy 500ep_data2x_w128 9000 python examples/ex1_burgers.py \
  --attention-type galerkin --epochs 500 --lr 6e-4 --no-cycle-momentum \
  --rollback-on-spike 10 --epochs-per-dispatch 5 --n-samples 4296 \
  --n-hidden 128
echo "r4d queue done ($(date +%H:%M:%S))"
