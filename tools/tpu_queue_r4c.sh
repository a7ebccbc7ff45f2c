#!/bin/bash
# Round-4 follow-on queue: after tools/tpu_queue_r4.sh frees the chip,
# re-run the two jobs that failed on the first pass (bench.py ex2 record
# shape fix; width-MFU sweep after pinning Pallas in-kernel dot precision),
# then chain the accuracy queue (tools/tpu_queue_r4b.sh).
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r4_queue

if [ -f /tmp/queue.pid ]; then
  while kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== bench.py rerun (ex2 shape fix) ==="
timeout 2400 python bench.py > eval/r4_queue/bench.log 2>&1
tail -1 eval/r4_queue/bench.log

echo "=== width MFU sweep rerun (pallas precision fix) ==="
timeout 3600 python eval/bench_width_mfu.py > eval/r4_queue/width_mfu.log 2>&1
tail -3 eval/r4_queue/width_mfu.log

rm -f /tmp/queue.pid
bash tools/tpu_queue_r4b.sh
