#!/bin/bash
# Round-5 CPU sequencer: wait for the torch 500-ep anchor (pid $1), then
# run the torch-reference ex2 same-data calibration (8 epochs on the
# exported tau=3 MG .mat — the other half of the controlled ex2 row;
# our side runs in tools/tpu_queue_r5.sh as ex2_samedata_8ep).
set -u
cd "$(dirname "$0")/.."
mkdir -p eval/r5

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  sleep 5
fi

python eval/export_darcy_mat.py --out /tmp/calib \
  --train-cache data_files/darcy_synth_n421_s1024_t3_jax_seed1127809.npz \
  --valid-cache data_files/darcy_synth_n421_s128_t3_jax_seed1127802.npz \
  >> eval/r5/torch_ex2_calibration.log 2>&1

OMP_NUM_THREADS=1 nice -n 15 timeout 28800 \
  python eval/calibrate_reference_darcy_fwd.py --epochs 8 \
  --checkpoint /tmp/torch_ex2_r5.ckpt \
  >> eval/r5/torch_ex2_calibration.log 2>&1
echo "cpu r5 queue done rc=$? ($(date +%H:%M:%S))" \
  >> eval/r5/torch_ex2_calibration.log
