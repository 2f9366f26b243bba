#!/bin/bash
# Session pipeline 24 (chained after 23): size-ladder refresh on the r2
# hero recipe (depth-8 residual GCNN C=10, bf16, SPRING). The r1 ladder
# (10x10 -> 12x12 -> 16x16) used the weaker depth-6 state; pipeline 19
# refreshes 12x12 from the new 10x10, and this pipeline extends it:
#   leg 1: 16x16 (256 sites) warm from the p19 12x12 state, 400 steps;
#   leg 2: 20x20 (400 sites) warm from the 16x16 — FIRST 400-site run of
#          the framework. Auto-chunker sizes E_loc/jacobian chunks; the
#          ~80 s dispatch ceiling forces steps_per_dispatch=1 here.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p23.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"

# 1. 16x16 refresh (depth-8 r2 recipe; r1 number to beat: -0.494666(76))
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override 'lattice.shape=[16,16]' \
  --override run.init_from=runs/j1j2_12x12_p19_ckpt \
  --override sampler.n_walkers=256 --override optimizer.lr=0.012 \
  --override run.n_steps=400 --override run.steps_per_dispatch=1 \
  --override run.log_every=20 \
  --override run.csv_path=runs/j1j2_16x16_p24.csv \
  --override run.ckpt_dir=runs/j1j2_16x16_p24_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_16x16_p24_ckpt/heartbeat
echo "hero16 rc=$?"

# 2. 20x20 probe — largest frustrated system yet (400 sites)
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override 'lattice.shape=[20,20]' \
  --override run.init_from=runs/j1j2_16x16_p24_ckpt \
  --override sampler.n_walkers=256 --override optimizer.lr=0.008 \
  --override run.n_steps=200 --override run.steps_per_dispatch=1 \
  --override run.log_every=10 \
  --override run.csv_path=runs/j1j2_20x20_p24.csv \
  --override run.ckpt_dir=runs/j1j2_20x20_p24_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_20x20_p24_ckpt/heartbeat
echo "hero20 rc=$?"

echo "pipeline24 done"
