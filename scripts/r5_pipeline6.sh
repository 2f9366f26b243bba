#!/bin/bash
# Round-5 pipeline 6 — the direct (pi,pi) magnon energy of 8x8 J1-J2 by
# momentum-sector OPTIMIZATION (optimizer.sector_momentum, the bounded
# ratio-estimator route built this round after the r3/r4 projected-net
# refutation). Same-family gap: an untied complex RBM trained as ground
# state, then warm-started into the q=(pi,pi) sector; gap = E_sector -
# E_ground within the family cancels the leading ansatz bias. Cross-check
# target: the SMA bound 0.551 at (pi,pi) on the GCNN hero (BASELINE r2).
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1200 --startup-timeout 3600 --max-restarts 1 --device-wait 14400"
MODEL="--config configs/j1j2_8x8_complex.yaml \
  --override model.kind=rbm --override model.rbm_alpha=4 \
  --override model.rbm_tie_translations=false \
  --override model.param_scale=0.1 --override model.init_mode=fixed \
  --override model.activation=lncosh \
  --override sr.solver=minsr --override sr.momentum=0.9 \
  --override sr.diag_shift0=0.02 --override sr.diag_shift_decay=1.0 \
  --override sr.diag_shift_min=0.02 \
  --override optimizer.schedule=cosine --override optimizer.lr_min_ratio=0.1 \
  --override run.validate_against_ed=false --override run.save_settle_s=2"

# leg 1: untied-RBM ground state (the family's own E0 reference)
timeout 4000 $SUP $MODEL \
  --override sampler.n_walkers=1024 --override optimizer.lr=0.03 \
  --override run.n_steps=800 --override run.steps_per_dispatch=10 \
  --override run.log_every=25 \
  --override run.ckpt_every=400 \
  --override run.csv_path=runs/j1j2_8x8_rbm_ground.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_rbm_ground_ckpt \
  --override run.heartbeat_path=runs/j1j2_8x8_rbm_ground_ckpt/heartbeat
echo "rbm ground rc=$?"

# leg 2: q=(pi,pi) sector, warm from leg 1 (kappa drives weight into
# the sector; effective E_loc cost is T=64 x ground, hence M=256)
timeout 8000 $SUP $MODEL \
  --override sampler.n_walkers=256 --override optimizer.lr=0.02 \
  --override 'optimizer.sector_momentum=[4,4]' \
  --override optimizer.sector_kappa=0.5 \
  --override run.init_from=runs/j1j2_8x8_rbm_ground.csv.params.npz \
  --override run.n_steps=800 --override run.steps_per_dispatch=4 \
  --override run.log_every=25 \
  --override run.ckpt_every=400 \
  --override run.csv_path=runs/j1j2_8x8_sector_pipi.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_sector_pipi_ckpt \
  --override run.heartbeat_path=runs/j1j2_8x8_sector_pipi_ckpt/heartbeat
echo "sector pipi rc=$?"
echo "r5_pipeline6 done"
