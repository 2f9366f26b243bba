#!/bin/bash
# Round-5 pipeline 3 — scale the excited-state capability past 4x4
# (VERDICT item 5a): 8x8 J1-J2 FIRST EXCITED state via exact deflation
# (optimizer.deflate_c, the r4-validated route) under SPRING-minSR, on
# the d12 residual GCNN whose ground params survive as npz
# (runs/j1j2_8x8_d12_refine.csv.params.npz, tail -0.497583(26)/site).
# c=2.0 comfortably above the gap (SMA (pi,pi) bound 0.551, r2);
# init = ground + 10% relative kick (run.init_noise — the r4 recipe).
# Report: E1 tail, gap E1-E0 vs the SMA bound, overlap trace.
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1200 --startup-timeout 3600 --max-restarts 2 --device-wait 14400"

timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override "model.channels=[10,10,10,10,10,10,10,10,10,10,10,10]" \
  --override model.activation=selu --override model.init_mode=fan_in \
  --override model.residual=true --override model.param_scale=1.0 \
  --override model.compute_dtype=bfloat16 \
  --override sampler.n_walkers=1024 \
  --override sr.solver=minsr --override sr.momentum=0.9 \
  --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 \
  --override sr.diag_shift_min=0.001 --override sr.proportional_shift=true \
  --override optimizer.lr=0.01 --override optimizer.schedule=cosine \
  --override optimizer.lr_min_ratio=0.1 --override optimizer.ema_decay=0.998 \
  --override "optimizer.orthogonalize_to=[runs/j1j2_8x8_d12_refine.csv.params.npz]" \
  --override optimizer.deflate_c=2.0 \
  --override run.init_from=runs/j1j2_8x8_d12_refine.csv.params.npz \
  --override run.init_noise=0.1 \
  --override run.n_steps=1800 --override run.steps_per_dispatch=4 \
  --override run.log_every=25 --override run.validate_against_ed=false \
  --override run.ckpt_every=500 --override run.save_settle_s=2 \
  --override run.csv_path=runs/j1j2_8x8_excited_defl.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_excited_defl_ckpt \
  --override run.heartbeat_path=runs/j1j2_8x8_excited_defl_ckpt/heartbeat
echo "8x8 E1 deflation rc=$?"
echo "r5_pipeline3 done"
