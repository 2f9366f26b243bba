#!/bin/bash
# Session pipeline 25 (chained after 24): depth-10 8x8 hero follow-through.
# The d10 rung (p18 leg 8) was at -0.4977/site by step 450 — already in
# depth-8 phase-1 territory — so it gets the same two-phase treatment that
# took depth-8 from -0.4975 to -0.4976: warm-start refine at 2x walkers,
# low lr, with EMA averaging on (one run yields both the last-iterate and
# Polyak-averaged states; measured both ways below, mirroring the p19 A/B).
# Stretch: transfer the refined depth-10 state to 10x10.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p24.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"
D10="--override model.channels=[10,10,10,10,10,10,10,10,10,10]"

# 1. d10 phase-2 refine: M=2048, low-noise tail, EMA on
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D10 --override run.init_from=runs/j1j2_8x8_d10_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.006 \
  --override optimizer.ema_decay=0.997 \
  --override run.n_steps=1000 --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_d10b.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d10b_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_8x8_d10b_ckpt/heartbeat
echo "d10-refine rc=$?"

# 2a/2b. measure last-iterate vs EMA at matched sampling budget
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  $D10 --override optimizer.ema_decay=0.997 --override sampler.n_walkers=2048 \
  --ckpt-dir runs/j1j2_8x8_d10b_ckpt --n-samples 4 \
  > runs/j1j2_8x8_d10b_last.json 2> runs/j1j2_8x8_d10b_last.log
echo "d10-measure-last rc=$?"
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  $D10 --override optimizer.ema_decay=0.997 --override sampler.n_walkers=2048 \
  --ckpt-dir runs/j1j2_8x8_d10b_ckpt --n-samples 4 --ema \
  > runs/j1j2_8x8_d10b_ema.json 2> runs/j1j2_8x8_d10b_ema.log
echo "d10-measure-ema rc=$?"

# 3. stretch: 10x10 depth-10 transfer
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D10 --override 'lattice.shape=[10,10]' \
  --override run.init_from=runs/j1j2_8x8_d10b_ckpt \
  --override optimizer.lr=0.015 --override run.n_steps=1000 \
  --override run.steps_per_dispatch=3 \
  --override run.csv_path=runs/j1j2_10x10_d10.csv \
  --override run.ckpt_dir=runs/j1j2_10x10_d10_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_10x10_d10_ckpt/heartbeat
echo "hero10-d10 rc=$?"

echo "pipeline25 done"
