#!/bin/bash
# Round-4 follow-up TPU queue (after tpu_queue_r4d.sh's measurement phase
# and the first two 500-ep cells).  New this pass:
#   - width_mfu rerun (the fused-kernel bf16 rsqrt Mosaic abort is fixed)
#   - bench + ex2 trace with the bf16 conv-scaler path (2D optimization)
#   - PRNG/dropout cost isolation for the bsz-64 per-sample regression
#   - ex2 f32-vs-bf16 accuracy pair (is the 2D bf16 path accuracy-neutral?)
# then the remaining r4d accuracy cells (ex3 clean 8192, ex2 4096, 500-ep
# data4x / w128).  Logs under eval/r4_queue/ and eval/r4_accuracy/.
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

# --- measurements ---
step r4_queue width_mfu 4500 python eval/bench_width_mfu.py
step r4_queue bench_bf16scalers 2400 python bench.py
step r4_queue trace_ex2_bf16scalers 1800 python eval/trace_ex1_step.py \
  --task ex2 --bf16 --batches 4 8 --out eval/trace_ex2_bf16scalers.json
step r4_queue prng_dropout 2400 python eval/bench_prng_dropout.py

# --- ex2 bf16 accuracy-neutrality pair (same data, same seed) ---
step r4_accuracy ex2_f32_100ep 7200 python examples/ex2_darcy.py \
  --epochs 100 --ema-decay 0.999
step r4_accuracy ex2_bf16_100ep 7200 python examples/ex2_darcy.py \
  --epochs 100 --ema-decay 0.999 --bf16

# --- remaining r4d accuracy cells ---
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
echo "r4e queue done ($(date +%H:%M:%S))"
