#!/bin/bash
# Round-4 late queue (after the accum-bench refresh):
#   - accum2d: does microbatching help the copy-bound ex2 2D step?
#   - 500ep_data8x: data scaling unsaturated (2148->4296 train cut 33%);
#     8592 train is another ~40-min cell
#   - ex3_clean_150ep: the 8192-sample clean cell was still improving
#     monotonically at epoch 100 (1.961e-2) — give it 150
#   - ex3_baseline_8192: the BASELINE-config cell (5.072e-2 at 4096) at
#     8192 MG samples; longest, last, may not finish before round end
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

step r4_queue accum_ex2 2400 python eval/bench_accum2d.py

step r4_accuracy 500ep_data8x 9000 python examples/ex1_burgers.py \
  --attention-type galerkin --epochs 500 --lr 6e-4 --no-cycle-momentum \
  --rollback-on-spike 10 --epochs-per-dispatch 5 --n-samples 17184

step r4_accuracy ex3_clean_150ep 18000 python examples/ex3_darcy_inv.py \
  --noise 0.0 --n-samples 8192 --train-len 8192 --ema-decay 0.999 \
  --epochs 150

step r4_accuracy ex3_baseline_8192 28800 python examples/ex3_darcy_inv.py \
  --subsample-nodes 2 --subsample-attn 6 --noise 0.05 --n-samples 8192 \
  --train-len 8192 --online-noise --ema-decay 0.999 --epochs 100

echo "r4g queue done ($(date +%H:%M:%S))"
