#!/bin/bash
# Session pipeline 22 (chained after 21): recover pipeline 18's leg-4 —
# the f32 Lanczos-step measure of the refined 8x8 hero — which was lost
# when the zombie pipeline-16 measure and the p18 copy ran concurrently
# and wedged each other (both timed out; see runs/r2_pipeline18.out).
# Identical command, run with the chip to itself.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p21.pid) 2>/dev/null; do sleep 60; done

timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_p15b_ckpt --n-samples 6 --lanczos-step \
  --override sampler.n_walkers=2048 \
  > runs/j1j2_8x8_p15_measure_f32.json 2> runs/j1j2_8x8_p15_measure_f32.log
echo "measure8-f32-retry rc=$?"

echo "pipeline22 done"
