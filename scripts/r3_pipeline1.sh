#!/bin/bash
# Round-3 pipeline 1 — VERDICT r2 item 3: the dropped depth-12 rung.
# Warm from the COMMITTED d10j snapshot (runs/j1j2_8x8_d10j_params.npz —
# the auto-snapshot fix that closed the VM-death checkpoint-loss class):
# 10 layers transfer, 2 fresh, jastrow carried. Phase 1 (M=1024, 2000
# cosine steps) then phase 2 refine (M=2048, EMA 0.997, 800 steps),
# measured both ways. Target: direct 8x8 <=0.15% of DMRG -0.4985
# (need <= -0.497752; current direct best -0.497685(28)).
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"
D12="--override model.channels=[10,10,10,10,10,10,10,10,10,10,10,10]"

# 1. 8x8 depth-12 phase 1
timeout 9000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D12 --override model.jastrow=true \
  --override run.init_from=runs/j1j2_8x8_d10j_params.npz \
  --override optimizer.lr=0.01 \
  --override run.n_steps=2000 --override run.steps_per_dispatch=4 \
  --override run.csv_path=runs/j1j2_8x8_d12j.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d12j_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_8x8_d12j_ckpt/heartbeat
echo "d12j-8x8 phase1 rc=$?"

# 2. phase-2 refine: 2x walkers, low lr, EMA (helps converged tails —
# p19 A/B; measured both ways below)
timeout 7000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D12 --override model.jastrow=true \
  --override run.init_from=runs/j1j2_8x8_d12j_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.005 \
  --override optimizer.ema_decay=0.997 \
  --override run.n_steps=800 --override run.steps_per_dispatch=2 \
  --override run.csv_path=runs/j1j2_8x8_d12j_refine.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d12j_refine_ckpt --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/j1j2_8x8_d12j_refine_ckpt/heartbeat
echo "d12j-8x8 phase2 rc=$?"

# 3. measure the refine both ways (last-iterate vs EMA), f32, 4x M=2048
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  $D12 --override model.jastrow=true --override model.compute_dtype=float32 \
  --override sampler.n_walkers=2048 \
  --ckpt-dir runs/j1j2_8x8_d12j_refine_ckpt --n-samples 4 \
  > runs/j1j2_8x8_d12j_measure.json 2> runs/j1j2_8x8_d12j_measure.log
echo "measure-last rc=$?"
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  $D12 --override model.jastrow=true --override model.compute_dtype=float32 \
  --override sampler.n_walkers=2048 \
  --ckpt-dir runs/j1j2_8x8_d12j_refine_ckpt --ema --n-samples 4 \
  > runs/j1j2_8x8_d12j_measure_ema.json 2> runs/j1j2_8x8_d12j_measure_ema.log
echo "measure-ema rc=$?"

echo "pipeline1 done"
