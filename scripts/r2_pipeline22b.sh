#!/bin/bash
# Session pipeline 22b (replaces 22; chained after 21): f32 Lanczos-step
# measures of both heroes at a budget that FITS the dispatch/timeout
# reality. The original p22 retried the 8x8 at 6 samples x M=2048, but the
# 10x10 attempt (3 x 1024) just timed out at 5000 s: the <H^3> moment is
# intrinsically K-fold the E_loc cost (E_loc must be evaluated at every
# connected state), so sample-walker budget is THE knob. 2 x 512 (8x8) and
# 2 x 256 (10x10) are ~10x cheaper than the timed-out runs; Lanczos-step
# is a refinement diagnostic, so modest MC error is acceptable.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p21.pid) 2>/dev/null; do sleep 60; done

timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_p15b_ckpt --n-samples 2 --lanczos-step \
  --override sampler.n_walkers=512 \
  > runs/j1j2_8x8_p15_measure_f32.json 2> runs/j1j2_8x8_p15_measure_f32.log
echo "measure8-f32-retry rc=$?"

timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override 'lattice.shape=[10,10]' --ckpt-dir runs/j1j2_10x10_p17_ckpt \
  --n-samples 2 --lanczos-step --override sampler.n_walkers=256 \
  > runs/j1j2_10x10_p17_measure_f32.json 2> runs/j1j2_10x10_p17_measure_f32.log
echo "measure10-f32-retry rc=$?"

echo "pipeline22b done"
