#!/bin/bash
# Round-4 TPU accuracy queue (runs after tools/tpu_queue_r4.sh frees the
# chip): 500-ep data/width/EMA levers toward <=1e-3 (VERDICT r3 item 1),
# the ex2 4096-sample cell (item 8), and the ex3 8192-sample clean cell
# (item 5).  Logs under eval/r4_accuracy/.
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r4_accuracy

if [ -f /tmp/queue.pid ]; then
  while kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do sleep 60; done
fi

run () {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" "$@" > "eval/r4_accuracy/$name.log" 2>&1
  grep -E "Best model|best:" "eval/r4_accuracy/$name.log" | tail -2
}

# --- 500-ep levers on the constant-beta1 lr 6e-4 champion (1.558e-3) ---
run 500ep_data2x 3600 python examples/ex1_burgers.py --epochs 500 \
  --lr 6e-4 --no-cycle-momentum --n-samples 4296
run 500ep_data2x_ema 3600 python examples/ex1_burgers.py --epochs 500 \
  --lr 6e-4 --no-cycle-momentum --n-samples 4296 --ema-decay 0.999
run 500ep_data4x 5400 python examples/ex1_burgers.py --epochs 500 \
  --lr 6e-4 --no-cycle-momentum --n-samples 8592
run 500ep_data2x_w128 5400 python examples/ex1_burgers.py --epochs 500 \
  --lr 6e-4 --no-cycle-momentum --n-samples 4296 --n-hidden 128

# --- ex2 at 4096 MG samples (cache regen included, ~25 min) ---
run ex2_4096 10800 python examples/ex2_darcy.py --n-samples 4096 \
  --train-len 4096 --ema-decay 0.999 --epochs 100

# --- ex3 clean cell at 8192 MG samples (cache regen ~55 min) ---
run ex3_clean_8192 18000 python examples/ex3_darcy_inv.py --noise 0.0 \
  --n-samples 8192 --train-len 8192 --ema-decay 0.999 --epochs 100

echo "accuracy queue done"
