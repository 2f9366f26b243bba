#!/bin/bash
# Round-3 pipeline 1b — depth-12 rung RETRY. The p1 recipe (lr 0.01,
# flat shift 1e-3 — the d10 rung's settings) NaN'd at step 2: two fresh
# interior layers on a 12-layer stack need a gentler ramp than the d8->d10
# transfer did. Changes: lr 0.008 with 100-step warmup, diag shift
# annealed 0.01 -> 0.001 (decay 0.99) so the metric is stiff while the
# fresh layers find scale, ckpt_every 100 so nan_policy=rollback has a
# recent restore point.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p1.pid.orig) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.01 --override sr.diag_shift_decay=0.99 --override sr.diag_shift_min=0.001"
D12="--override model.channels=[10,10,10,10,10,10,10,10,10,10,10,10]"

# 1. 8x8 depth-12 phase 1 (gentle ramp)
timeout 9000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D12 --override model.jastrow=true \
  --override run.init_from=runs/j1j2_8x8_d10j_params.npz \
  --override optimizer.lr=0.008 --override optimizer.warmup_steps=100 \
  --override run.n_steps=2000 --override run.steps_per_dispatch=4 \
  --override run.csv_path=runs/j1j2_8x8_d12jb.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d12jb_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_8x8_d12jb_ckpt/heartbeat
echo "d12jb-8x8 phase1 rc=$?"

# 2. phase-2 refine at 2x walkers + EMA, measured both ways
timeout 7000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D12 --override model.jastrow=true \
  --override run.init_from=runs/j1j2_8x8_d12jb_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.005 \
  --override optimizer.ema_decay=0.997 \
  --override run.n_steps=800 --override run.steps_per_dispatch=2 \
  --override run.csv_path=runs/j1j2_8x8_d12jb_refine.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d12jb_refine_ckpt --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/j1j2_8x8_d12jb_refine_ckpt/heartbeat
echo "d12jb-8x8 phase2 rc=$?"

# 3. measure both ways, f32, 4x M=2048
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  $D12 --override model.jastrow=true --override model.compute_dtype=float32 \
  --override sampler.n_walkers=2048 \
  --ckpt-dir runs/j1j2_8x8_d12jb_refine_ckpt --n-samples 4 \
  > runs/j1j2_8x8_d12jb_measure.json 2> runs/j1j2_8x8_d12jb_measure.log
echo "measure-last rc=$?"
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  $D12 --override model.jastrow=true --override model.compute_dtype=float32 \
  --override sampler.n_walkers=2048 \
  --ckpt-dir runs/j1j2_8x8_d12jb_refine_ckpt --ema --n-samples 4 \
  > runs/j1j2_8x8_d12jb_measure_ema.json 2> runs/j1j2_8x8_d12jb_measure_ema.log
echo "measure-ema rc=$?"

echo "pipeline1b done"
