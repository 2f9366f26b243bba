#!/bin/bash
# Round-3 pipeline 2f — kagome arm G: the one untried ansatz family.
# MADE ARNN with EXACT ancestral sampling (zero MC autocorrelation),
# per-site phase heads (configuration-level phases by construction),
# q0 phase prior baked into the ARNN phase output, free S^z sector
# (N=27 is odd — no sz0 masking), minSR (adam mode-collapses on
# frustration, BASELINE r2), 3000 steps M=1024.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p2f.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"

timeout 5000 $SUP --config configs/kagome3x3_heis.yaml \
  --override model.kind=arnn --override model.channels=[256,256,256] \
  --override model.complex_params=true --override model.arnn_sector=none \
  --override model.param_scale=0.05 \
  --override sampler.kind=direct \
  --override sr.momentum=0.9 --override sr.diag_shift0=0.01 \
  --override sr.diag_shift_decay=0.98 --override sr.diag_shift_min=0.001 \
  --override optimizer.lr=0.01 \
  --override run.n_steps=3000 \
  --override run.csv_path=runs/kagome3x3_r3_arnn.csv \
  --override run.ckpt_dir=runs/kagome3x3_r3_arnn_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/kagome3x3_r3_arnn_ckpt/heartbeat
echo "kagome armG rc=$?"
echo "pipeline2f done"
