#!/bin/bash
# Round-3 pipeline 6c — depth-12 rung, attempt 6, with the ROOT-CAUSE fix:
# the r3 failure chain (5 recipes, all NaN in the first dispatch; every
# component probed finite on CPU at typical walkers; failure walker-set-
# dependent) is an f32 Cholesky negative-pivot NaN on the ill-conditioned
# [2M,2M] minSR Gram of the 12-layer stack. sr.py now routes every
# sample-space solve through chol_or_eigh_solve (eigh fallback on
# non-finite, tested), and proportional_shift scales the regularization
# to the Gram's actual diagonal.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p6c.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1200 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001 --override sr.proportional_shift=true"
D12="--override model.channels=[10,10,10,10,10,10,10,10,10,10,10,10]"

timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D12 \
  --override run.init_from=runs/j1j2_8x8_d10_params.npz \
  --override optimizer.lr=0.01 \
  --override run.n_steps=1500 --override run.steps_per_dispatch=4 \
  --override run.csv_path=runs/j1j2_8x8_d12_fix.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d12_fix_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_8x8_d12_fix_ckpt/heartbeat
echo "d12-fix rc=$?"
echo "pipeline6c done"
