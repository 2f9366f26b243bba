#!/bin/bash
# Round-3 pipeline 3d — 4x4 J1-J2 excited state, attempt 3: penalty off
# the GOOD complex-CNN ground (runs/j1j2_4x4_ground_ckpt, 5.26e-3) with
# minSR-SPRING (the p3 pcg attempt stalled at -5.72; the RBM pair landed
# -7.85 off a 2.6%-weak ground). Sector ED targets (host, S^z=0):
# E0 -8.45792, E1 -8.13899, E2 -7.62783.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p3d.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"
G44="--override lattice.shape=[4,4] --override sampler.n_walkers=1024 \
  --override run.steps_per_dispatch=25 \
  --override sr.solver=minsr --override sr.momentum=0.9 \
  --override sr.diag_shift0=0.01 --override sr.diag_shift_decay=0.99 \
  --override sr.diag_shift_min=0.001"

timeout 6000 $SUP --config configs/j1j2_8x8_complex.yaml $G44 \
  --override optimizer.lr=0.015 \
  --override run.n_steps=3000 \
  --override run.init_from=runs/j1j2_4x4_ground_ckpt \
  --override optimizer.orthogonalize_to=[runs/j1j2_4x4_ground_ckpt] \
  --override optimizer.orth_beta=10 \
  --override run.validate_against_ed=false \
  --override run.csv_path=runs/j1j2_4x4_excited_minsr.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_excited_minsr_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/j1j2_4x4_excited_minsr_ckpt/heartbeat
echo "cnn-excited-minsr rc=$?"
echo "pipeline3d done"
