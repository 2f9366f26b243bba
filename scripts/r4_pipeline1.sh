#!/bin/bash
# Round-4 pipeline 1 — the three headline physics legs, serialized on the
# one chip (VERDICT r3 next-round items 1, 3, 7):
#  A. depth-12 refine at M=2048 (the d10-style phase-2 that closes the
#     direct 8x8 <=0.15% target off the validated d12 attempt-6 state)
#  B. 4x4 J1-J2 first excited state via EXACT DEFLATION under minSR/SPRING
#     (optimizer.deflate_c — the r3-diagnosed fix; penalty+minSR collapses)
#  C. (pi,pi) momentum-sector retry with the documented minSR+low-lr recipe
#     (the r3 pcg run diverged; SMA cross-check target 0.551)
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1200 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"
SPRING="--override sr.solver=minsr --override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001 --override sr.proportional_shift=true"
D12="--override model.channels=[10,10,10,10,10,10,10,10,10,10,10,10]"

# --- leg A: d12 refine ---------------------------------------------------
timeout 9000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D12 \
  --override run.init_from=runs/j1j2_8x8_d12_fix_ckpt \
  --override sampler.n_walkers=2048 \
  --override optimizer.lr=0.006 --override optimizer.schedule=cosine \
  --override run.n_steps=1000 --override run.steps_per_dispatch=2 \
  --override run.csv_path=runs/j1j2_8x8_d12_refine.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d12_refine_ckpt \
  --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_8x8_d12_refine_ckpt/heartbeat
echo "legA d12-refine rc=$?"

# --- leg B: 4x4 excited by deflation under SPRING-minSR ------------------
# ED (host sector Lanczos, r3): E0 -8.45792, E1 -8.13899 (same quantum
# numbers as E0 — penalty/deflation is the only route). c=1.0 ~ 3x the gap.
timeout 4500 $SUP --config configs/j1j2_8x8_complex.yaml \
  --override lattice.shape=[4,4] \
  $SPRING \
  --override "optimizer.orthogonalize_to=[runs/j1j2_4x4_ground.csv.params.npz]" \
  --override optimizer.deflate_c=1.0 \
  --override run.init_from=runs/j1j2_4x4_ground.csv.params.npz \
  --override run.init_noise=0.05 \
  --override optimizer.lr=0.02 --override optimizer.schedule=cosine \
  --override run.n_steps=3000 --override run.steps_per_dispatch=25 \
  --override run.log_every=20 \
  --override run.csv_path=runs/j1j2_4x4_excited_defl.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_excited_defl_ckpt \
  --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_4x4_excited_defl_ckpt/heartbeat
echo "legB excited-deflation rc=$?"

# --- leg C: (pi,pi) momentum sector, minSR + low lr ----------------------
timeout 9000 $SUP --config configs/j1j2_8x8_complex.yaml \
  --override model.translation_average=true \
  --override "model.momentum=[4,4]" \
  $SPRING \
  --override optimizer.lr=0.005 --override optimizer.schedule=cosine \
  --override run.n_steps=1500 --override run.steps_per_dispatch=5 \
  --override run.log_every=20 \
  --override run.csv_path=runs/j1j2_8x8_pipi_r4.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_pipi_r4_ckpt \
  --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/j1j2_8x8_pipi_r4_ckpt/heartbeat \
  --override sampler.n_walkers=256
echo "legC pipi-minsr rc=$?"
echo "r4_pipeline1 done"
