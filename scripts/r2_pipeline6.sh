#!/bin/bash
# Round-2 continuation pipeline (fresh VM — the previous session's TPU
# wedge killed pipelines 4/5 and the gitignored checkpoints died with the
# machine, so the heroes restart from scratch).
#
# Phase order: 8x8 J1-J2 hero (SPRING, probe-validated in
# runs/j1j2_8x8_spring_probe.csv: reaches the r1 recipe's step-700 energy
# by step 500) -> refine at 2x walkers -> measurements (Lanczos step,
# Renyi-2, dimer SF) -> 10x10 warm-start ladder -> its measurements.
# Capability gates (ARNN/triangular/excited/t-VMC) run in pipeline 7.
set -x
cd /root/repo

SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 3 --device-wait 7200"

# 1. 8x8 J1-J2 hero phase 1: depth-8 residual GCNN C=10 bf16 + SPRING
#    (mu=0.9, small constant shift) + cosine lr — target: beat r1's
#    -0.497206(65) and close on DMRG -0.4985.
timeout 10000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override sr.momentum=0.9 \
  --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 \
  --override sr.diag_shift_min=0.001 \
  --override optimizer.lr=0.025 \
  --override run.csv_path=runs/j1j2_8x8_spring.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_spring_ckpt \
  --override run.heartbeat_path=runs/j1j2_8x8_spring_ckpt/heartbeat \
  >> runs/j1j2_8x8_spring.log 2>&1
echo "hero1 rc=$?"

# 2. phase 2: 2x-walker low-noise refinement (VERDICT r1 item 3's lever;
#    M=4096 crashed the TPU worker last session — stay at 2048)
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override sr.momentum=0.9 \
  --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 \
  --override sr.diag_shift_min=0.001 \
  --override run.init_from=runs/j1j2_8x8_spring_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.006 \
  --override run.n_steps=1000 --override run.steps_per_dispatch=5 \
  --override run.ckpt_dir=runs/j1j2_8x8_r2r_ckpt \
  --override run.ckpt_every=250 \
  --override run.csv_path=runs/j1j2_8x8_spring_refine.csv \
  --override run.heartbeat_path=runs/j1j2_8x8_r2r_ckpt/heartbeat \
  >> runs/j1j2_8x8_spring_refine.log 2>&1
echo "hero2 rc=$?"

# 3. measurements on the refined state: Lanczos-step lower bound, Renyi-2
#    half-system entanglement, dimer structure factor (VBS probe)
timeout 6000 python -m qmcnn_tpu.measure \
  --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_r2r_ckpt --n-samples 10 \
  --lanczos-step --dimer --renyi2 half \
  --override sampler.n_walkers=2048 \
  > runs/j1j2_8x8_spring_measure.json 2>runs/j1j2_8x8_spring_measure.log
echo "measure8 rc=$?"

# 4. 10x10 warm-start from the 8x8 kernels (size-agnostic transfer, the
#    r1 ladder trick) — same depth-8 residual C=10 bf16 architecture
timeout 12000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override lattice.shape=[10,10] \
  --override sr.momentum=0.9 \
  --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 \
  --override sr.diag_shift_min=0.001 \
  --override run.init_from=runs/j1j2_8x8_r2r_ckpt \
  --override optimizer.lr=0.01 \
  --override run.n_steps=1500 --override run.steps_per_dispatch=5 \
  --override run.ckpt_dir=runs/j1j2_10x10_spring_ckpt \
  --override run.ckpt_every=250 \
  --override run.csv_path=runs/j1j2_10x10_spring.csv \
  --override run.heartbeat_path=runs/j1j2_10x10_spring_ckpt/heartbeat \
  >> runs/j1j2_10x10_spring.log 2>&1
echo "hero10 rc=$?"

# 5. 10x10 measurements
timeout 6000 python -m qmcnn_tpu.measure \
  --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override lattice.shape=[10,10] \
  --ckpt-dir runs/j1j2_10x10_spring_ckpt --n-samples 8 \
  --lanczos-step --renyi2 half \
  --override sampler.n_walkers=1024 \
  > runs/j1j2_10x10_spring_measure.json 2>runs/j1j2_10x10_spring_measure.log
echo "measure10 rc=$?"
