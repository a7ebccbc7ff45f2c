#!/bin/bash
# Round-5 TPU sequencer (VERDICT r4 next-round items), quick cells first:
#   1. ex2_trace_bsz16    — device trace at the measured 2D batch optimum
#   2. ex2_samedata_8ep   — our side of the controlled ex2 row (same .mat
#                           as the torch run in tools/cpu_queue_r5.sh)
#   3. super_res_refresh  — current-recipe super-res cell (stale 4.14e-3)
#   4. 500ep_data16x      — one more data-ladder doubling (17184 train)
#   5. ex4_4096           — NS data lever (retry: the HTTP-413 compile
#                           failure is fixed — valid data no longer an
#                           HLO constant)
#   6. ex3_baseline_1024_150ep — equal-data push (online noise + 150 ep)
#   7. bench_r5           — refresh all three bench records
#   8. ex3_baseline_8192  — bonus, multi-hour, fine to lose to round end
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

step ex2_trace_bsz16 3600 python eval/trace_ex1_step.py --task ex2 --bf16 \
  --batches 16 --trace-batch 16 --out eval/trace_ex2_bsz16.json

step ex2_samedata_8ep 7200 python examples/ex2_darcy.py \
  --train-path /tmp/calib/piececonst_r421_N1024_smooth1.mat \
  --valid-path /tmp/calib/piececonst_r421_N1024_smooth2.mat \
  --subsample-nodes 3 --subsample-attn 6 --epochs 8 --batch-size 4 \
  --seed 1127802

step super_res_refresh 7200 python examples/ex1_burgers_super_res.py \
  --score-dropout 0.1 --epochs 100

step 500ep_data16x 10800 python examples/ex1_burgers.py \
  --attention-type galerkin --epochs 500 --lr 6e-4 --no-cycle-momentum \
  --rollback-on-spike 10 --epochs-per-dispatch 5 --n-samples 17184

step super_res_reverse 3600 python examples/ex1_burgers_super_res.py \
  --train-subsample 1 --eval-subsample 4 --score-dropout 0.1 --epochs 100

step ex4_4096 14400 python "examples/ex4_navier_stokes_2+1d.py" \
  --n-samples 4096 --ema-decay 0.999 --epochs 100

step ex3_baseline_1024_150ep 14400 python examples/ex3_darcy_inv.py \
  --subsample-nodes 2 --subsample-attn 6 --noise 0.05 --n-samples 1024 \
  --train-len 1024 --online-noise --ema-decay 0.999 --epochs 150

step bench_r5 5400 python bench.py

# Deadline-guarded bonus cell: the round-end driver runs bench.py on this
# single TPU and two concurrent TPU processes wedge — only start if at
# least 2 h of budget remains, and cap the run to end 45 min early.
DEADLINE=$(date -d "2026-08-20 03:00" +%s)
BUDGET=$(( DEADLINE - $(date +%s) - 2700 ))
if [ "$BUDGET" -ge 7200 ]; then
  step ex3_baseline_8192 "$BUDGET" python examples/ex3_darcy_inv.py \
    --subsample-nodes 2 --subsample-attn 6 --noise 0.05 --n-samples 8192 \
    --train-len 8192 --online-noise --ema-decay 0.999 --epochs 100
else
  echo "skip ex3_baseline_8192: only ${BUDGET}s of TPU budget left"
fi

echo "r5 queue done ($(date +%H:%M:%S))"
