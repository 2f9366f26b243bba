#!/bin/bash
# Round-5 pipeline 1 — the WIDER direct-8x8 rung BASELINE.md r4 itself
# prescribes (VERDICT r5... item 2): the d8/d10/d12 depth ladder is flat
# within error at ~0.17% from DMRG at matched width C=10 — so widen:
# C=12 x depth-12 residual GCNN, warm-started from the d12 attempt-6
# state via the new run.init_expand (net2net width embedding,
# utils/transfer.py r5: source block + 0.1x-scaled fresh channels), same
# SPRING recipe, matched walker budget M=1024. Target: direct tail
# <= -0.49775/site (the 0.15% DMRG boundary) without extrapolation.
# Wedge forensics: ckpt_every=500 + save_settle_s=2 + heartbeat .events
# (the r4 3-for-3 save-adjacent wedge cluster, VERDICT item 6).
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1200 --startup-timeout 3600 --max-restarts 2 --device-wait 14400"

timeout 9000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override "model.channels=[12,12,12,12,12,12,12,12,12,12,12,12]" \
  --override model.activation=selu --override model.init_mode=fan_in \
  --override model.residual=true --override model.param_scale=1.0 \
  --override model.compute_dtype=bfloat16 \
  --override sampler.n_walkers=1024 \
  --override sr.solver=minsr --override sr.momentum=0.9 \
  --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 \
  --override sr.diag_shift_min=0.001 --override sr.proportional_shift=true \
  --override optimizer.lr=0.008 --override optimizer.schedule=cosine \
  --override optimizer.lr_min_ratio=0.1 --override optimizer.ema_decay=0.998 \
  --override run.init_from=runs/j1j2_8x8_d12_fix.csv.params.npz \
  --override run.init_expand=true \
  --override run.n_steps=1200 --override run.steps_per_dispatch=4 \
  --override run.log_every=25 --override run.validate_against_ed=false \
  --override run.ckpt_every=500 --override run.save_settle_s=2 \
  --override run.csv_path=runs/j1j2_8x8_w12.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_w12_ckpt \
  --override run.heartbeat_path=runs/j1j2_8x8_w12_ckpt/heartbeat
echo "w12 rung rc=$?"
echo "r5_pipeline1 done"
