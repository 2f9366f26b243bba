#!/bin/bash
# Round-2 pipeline 6b: 8x8 J1-J2 hero phase 3 + makeup measurements.
# Inserted between pipelines 6 and 7 mid-session because (a) the phase-2
# refine was still descending at its final step (-0.49772/site at step
# 1000, gap to DMRG -0.4985 = 0.157% — just above the <=0.15% VERDICT
# target), and (b) the original 8x8 measure step OOM'd (70 GB unchunked
# measure_once; fixed by reusing the training auto-chunk at measure time,
# commit 3ed453e) so Lanczos/Renyi-2/dimer numbers never landed.
set -x
cd /root/repo

SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 3 --device-wait 7200"

# 1. phase 3: low-lr polish at M=2048 from the phase-2 checkpoint
timeout 6500 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override sr.momentum=0.9 \
  --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 \
  --override sr.diag_shift_min=0.001 \
  --override run.init_from=runs/j1j2_8x8_r2r_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.003 \
  --override run.n_steps=1000 --override run.steps_per_dispatch=5 \
  --override run.ckpt_dir=runs/j1j2_8x8_r3_ckpt \
  --override run.ckpt_every=250 \
  --override run.csv_path=runs/j1j2_8x8_spring_refine2.csv \
  --override run.heartbeat_path=runs/j1j2_8x8_r3_ckpt/heartbeat \
  >> runs/j1j2_8x8_spring_refine2.log 2>&1
echo "hero3 rc=$?"

# 2. makeup measurements on the phase-3 state (chunked measure path):
#    Lanczos-step lower bound, Renyi-2 half-system, dimer SF
timeout 6000 python -m qmcnn_tpu.measure \
  --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_r3_ckpt --n-samples 10 \
  --lanczos-step --dimer --renyi2 half \
  --override sampler.n_walkers=2048 \
  > runs/j1j2_8x8_r3_measure.json 2>runs/j1j2_8x8_r3_measure.log
echo "measure8b rc=$?"
