#!/bin/bash
# Round-2 hero pipeline, take 3.
#
# Take 2's 8x8 refinement at M=4096 reproducibly killed the TPU worker at
# the first train dispatch: with P=101k params the materialized minSR
# Jacobian (3.3 GB) + [8192]^2 Gram/Cholesky workspace + chunked E_loc
# activations exceed the 16 GB chip, and the axon worker hard-crashes
# instead of raising RESOURCE_EXHAUSTED. M=2048 keeps every buffer at half
# size (Jacobian 1.66 GB, Gram [4096]^2) — still 2x the phase-1 walkers
# (VERDICT r1 item 3 asked for 2-4x).
set -x
cd /root/repo

SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 3"

# phase 2: 8x8 refinement at 2x walkers
timeout 12000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override run.init_from=runs/j1j2_8x8_r2_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.006 \
  --override run.n_steps=800 --override run.steps_per_dispatch=5 \
  --override run.ckpt_dir=runs/j1j2_8x8_r2r_ckpt --override run.ckpt_every=200 \
  --override run.csv_path=runs/j1j2_8x8_r2_refine.csv \
  >> runs/j1j2_8x8_r2_refine.log 2>&1
echo "phase2 rc=$?"

# 10x10 warm refinement with bf16 + 2x walkers from the r1 best checkpoint
timeout 12000 $SUP --config configs/j1j2_10x10_gcnn_deep.yaml \
  --override run.init_from=runs/j1j2_10x10_refine_ckpt \
  --override model.compute_dtype=bfloat16 \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.008 \
  --override run.n_steps=1000 --override run.steps_per_dispatch=5 \
  --override run.chunk_size=null --override sr.jacobian_chunk=null \
  --override run.ckpt_dir=runs/j1j2_10x10_r2_ckpt --override run.ckpt_every=250 \
  --override run.csv_path=runs/j1j2_10x10_r2.csv \
  >> runs/j1j2_10x10_r2.log 2>&1
echo "heis10 rc=$?"

# 16x16 fully-auto chunking demo, warm-started from the fresh 10x10 best
timeout 8000 $SUP --config configs/j1j2_16x16_gcnn_deep.yaml \
  --override run.init_from=runs/j1j2_10x10_r2_ckpt \
  --override model.compute_dtype=bfloat16 \
  --override run.ckpt_dir=runs/j1j2_16x16_r2_ckpt --override run.ckpt_every=50 \
  --override run.csv_path=runs/j1j2_16x16_r2.csv \
  >> runs/j1j2_16x16_r2.log 2>&1
echo "x16 rc=$?"

# Lanczos-step refined energies on the final states
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_r2r_ckpt --n-samples 4 --lanczos-step \
  --override sampler.n_walkers=128 \
  > runs/j1j2_8x8_r2_lanczos.json 2>runs/j1j2_8x8_r2_lanczos.log
echo "lz8 rc=$?"
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_10x10_gcnn_deep.yaml \
  --ckpt-dir runs/j1j2_10x10_r2_ckpt --n-samples 4 --lanczos-step \
  --override sampler.n_walkers=128 --override model.compute_dtype=bfloat16 \
  > runs/j1j2_10x10_r2_lanczos.json 2>runs/j1j2_10x10_r2_lanczos.log
echo "lz10 rc=$?"
