#!/bin/bash
# Round-4 TPU measurement queue: runs after the 500-ep sweep frees the
# chip.  Each job bounded; logs under eval/r4_queue/.
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r4_queue

# wait for the 500-ep sweep to finish
if [ -f /tmp/sweep.pid ]; then
  while kill -0 "$(cat /tmp/sweep.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== bench.py (with new ex2 2D record) ==="
timeout 1800 python bench.py > eval/r4_queue/bench.log 2>&1
tail -1 eval/r4_queue/bench.log

echo "=== width MFU sweep ==="
timeout 3600 python eval/bench_width_mfu.py > eval/r4_queue/width_mfu.log 2>&1
tail -2 eval/r4_queue/width_mfu.log

echo "=== ex2 2D step trace ==="
timeout 1800 python eval/trace_ex1_step.py --task ex2 --bf16 --batches 4 8 \
  > eval/r4_queue/trace_ex2.log 2>&1
tail -3 eval/r4_queue/trace_ex2.log

echo "=== bsz-64 trace (batch-scaling diagnosis) ==="
timeout 1800 python eval/trace_ex1_step.py --task ex1 --bf16 \
  --batches 8 16 32 64 --trace-batch 64 \
  --out eval/trace_ex1_bsz64.json > eval/r4_queue/trace_bsz64.log 2>&1
tail -3 eval/r4_queue/trace_bsz64.log

echo "=== attention-type resource table: ex1 seq 8192 ==="
timeout 2400 python examples/ex1_memory_profile.py --seq-len 8192 \
  --batch-size 4 --attention-types galerkin fourier linear softmax \
  > eval/r4_queue/memprof_ex1_8192.log 2>&1
tail -8 eval/r4_queue/memprof_ex1_8192.log

echo "=== attention-type resource table: ex2 grid 211^2 / coarse 71^2 ==="
timeout 2400 python examples/ex2_memory_profile.py --n-grid 211 \
  --n-grid-coarse 71 --batch-size 4 \
  > eval/r4_queue/memprof_ex2.log 2>&1
tail -8 eval/r4_queue/memprof_ex2.log

echo "queue done"
