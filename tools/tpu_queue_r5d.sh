#!/bin/bash
# Round-5 TPU sequencer, part d (post-reset continuation).
# The machine reset cut the r5c queue during its bench step; this queue
# finishes the remaining TPU work for the round:
#   1. bench_r5        — refresh all three bench records (cut by the reset)
#   2. 500ep_data32x   — next frontier point on the data ladder:
#                        --n-samples 68736 => 34368 TRAIN samples (cache is
#                        built inline on first use, ~50 min, then ~11 s/ep)
#   3. ex3_clean_8192  — the r5c bonus cell that never ran, at 200 epochs
#                        (val was still monotone at epoch 100 in r4)
# A deadline guard frees the TPU before the round-end driver bench.
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r5

step () {  # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "eval/r5/$name.log" 2>&1
  echo "--- rc=$? tail:"
  tail -2 "eval/r5/$name.log"
}

step bench_r5 5400 python bench.py

step 500ep_data32x 14400 python examples/ex1_burgers.py \
  --attention-type galerkin --epochs 500 --lr 6e-4 --no-cycle-momentum \
  --rollback-on-spike 10 --epochs-per-dispatch 5 --n-samples 68736

DEADLINE=$(date -d "2026-08-20 07:30" +%s)
BUDGET=$(( DEADLINE - $(date +%s) ))
if [ "$BUDGET" -ge 5400 ]; then
  step ex3_clean_8192_200ep "$BUDGET" python examples/ex3_darcy_inv.py \
    --noise 0.0 --n-samples 8192 --train-len 8192 --ema-decay 0.999 \
    --epochs 200
else
  echo "skip ex3_clean_8192_200ep: only ${BUDGET}s of TPU budget left"
fi

BUDGET=$(( DEADLINE - $(date +%s) ))
if [ "$BUDGET" -ge 10800 ]; then
  step ex3_baseline_8192 "$BUDGET" python examples/ex3_darcy_inv.py \
    --subsample-nodes 2 --subsample-attn 6 --noise 0.05 --n-samples 8192 \
    --train-len 8192 --online-noise --ema-decay 0.999 --epochs 100
else
  echo "skip ex3_baseline_8192: only ${BUDGET}s of TPU budget left"
fi

echo "r5d queue done ($(date +%H:%M:%S))"
