#!/bin/bash
# Round-3 pipeline 6b — depth-12 rung, attempt 5 (hypothesis: the NaN is
# CONFIG-dependent — solve_spring/e_loc/J all probed finite on typical
# walkers at the failing shift, but one sampler sweep away the step NaNs:
# rare configurations blow the 12-layer selu residual stack through the
# FRESH full-gain interior layer 10. Fix: param_scale=0.4 shrinks only
# the fresh layers (transferred leaves are overwritten), taming the
# amplification; rollback ckpts every 100 steps catch residual
# transients).
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p6b.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"
D12="--override model.channels=[10,10,10,10,10,10,10,10,10,10,10,10]"

timeout 7000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D12 --override model.param_scale=0.4 \
  --override run.init_from=runs/j1j2_8x8_d10_params.npz \
  --override optimizer.lr=0.01 \
  --override run.n_steps=1200 --override run.steps_per_dispatch=4 \
  --override run.csv_path=runs/j1j2_8x8_d12_ps04.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d12_ps04_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_8x8_d12_ps04_ckpt/heartbeat
echo "d12-ps04 rc=$?"
echo "pipeline6b done"
