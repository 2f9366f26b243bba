#!/bin/bash
# Session pipeline 35 (chained after 34): learnable pair phases
# (model.jastrow_phase) on the frustrated gates — the CPU oracle showed
# the phase factor breaking the sign-free variational floor by a full
# unit on the J1-J2 chain; these arms test whether it moves the two
# ansatz-limited plateaus. Both recipes keep the 120-degree prior ON:
# the prior puts im != 0 on psi, which takes u off its documented saddle
# (models/jastrow.py) — u then refines the sign structure beyond the
# rigid 3-sublattice pattern.
#   leg 1: tri6x3 J1-J2 spin-liquid gate (on record: bare 1.09e-2,
#          +jastrow 9.2e-3) with jastrow + jastrow_phase.
#   leg 2: kagome 27-site q0 gate (on record: 3.02% plateau vs native-
#          Lanczos exact -0.4362779624) with jastrow + jastrow_phase.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p34.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"

# 1. triangular spin-liquid-point gate + pair phases
timeout 4000 $SUP --config configs/tri6x3_j1j2.yaml \
  --override model.jastrow=true --override model.jastrow_phase=true \
  --override run.csv_path=runs/tri6x3_j1j2_jphase.csv \
  --override run.ckpt_dir=runs/tri6x3_j1j2_jphase_ckpt \
  --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/tri6x3_j1j2_jphase_ckpt/heartbeat
echo "tri-jphase rc=$?"

# 2. kagome 27-site q0 gate + pair phases
timeout 6000 $SUP --config configs/kagome3x3_heis.yaml \
  --override model.phase_bias=sublattice_120 \
  --override model.jastrow=true --override model.jastrow_phase=true \
  --override run.csv_path=runs/kagome3x3_q0_jphase.csv \
  --override run.ckpt_dir=runs/kagome3x3_q0_jphase_ckpt \
  --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/kagome3x3_q0_jphase_ckpt/heartbeat
echo "kagome-jphase rc=$?"

echo "pipeline35 done"
