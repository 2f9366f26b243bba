#!/bin/bash
# Session pipeline 28 (chained after 27): Jastrow A/B arms on the two
# frustrated ED-gated clusters where the plain complex CNN saturates —
# the natural payoff test for the new two-body Jastrow factor
# (models/jastrow.py; zero-initialized, so any change vs the recorded
# baseline arms is the factor's doing):
#   leg 1: triangular 6x3 J1-J2 at the spin-liquid point (baseline on
#          record: rel err 1.09e-2, BASELINE.md 2026-08-19)
#   leg 2: kagome 27-site Heisenberg with the q0 prior (baseline on
#          record: 3.02% vs the native-Lanczos exact -0.4362779624)
set -x
cd /root/repo
while kill -0 $(cat /tmp/p27.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"

# 1. triangular spin-liquid-point gate + Jastrow
timeout 4000 $SUP --config configs/tri6x3_j1j2.yaml \
  --override model.jastrow=true \
  --override run.csv_path=runs/tri6x3_j1j2_jastrow.csv \
  --override run.ckpt_dir=runs/tri6x3_j1j2_jastrow_ckpt \
  --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/tri6x3_j1j2_jastrow_ckpt/heartbeat
echo "tri-jastrow rc=$?"

# 2. kagome 27-site q0-prior gate + Jastrow
timeout 6000 $SUP --config configs/kagome3x3_heis.yaml \
  --override model.phase_bias=sublattice_120 \
  --override model.jastrow=true \
  --override run.csv_path=runs/kagome3x3_q0_jastrow.csv \
  --override run.ckpt_dir=runs/kagome3x3_q0_jastrow_ckpt \
  --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/kagome3x3_q0_jastrow_ckpt/heartbeat
echo "kagome-jastrow rc=$?"

echo "pipeline28 done"
