#!/bin/bash
# Round-3 pipeline 3e — 4x4 J1-J2 excited state, attempt 4: the minSR
# penalty run collapsed ONTO the ground state (final overlap 0.9989,
# E=-8.420 ~ E0): the natural-gradient metric suppresses the penalty
# direction. The r2 recipe that worked (TFIM N=16 RBM) used DENSE SR —
# repeat that solver with the CNN + the good ground reference + beta 20.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p3e.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"
G44="--override lattice.shape=[4,4] --override sampler.n_walkers=1024 \
  --override run.steps_per_dispatch=25 \
  --override sr.solver=dense --override sr.diag_shift0=0.1 \
  --override sr.diag_shift_decay=0.97 --override sr.diag_shift_min=0.01"

timeout 6000 $SUP --config configs/j1j2_8x8_complex.yaml $G44 \
  --override optimizer.lr=0.02 \
  --override run.n_steps=3000 \
  --override run.init_from=runs/j1j2_4x4_ground_ckpt \
  --override optimizer.orthogonalize_to=[runs/j1j2_4x4_ground_ckpt] \
  --override optimizer.orth_beta=20 \
  --override run.validate_against_ed=false \
  --override run.csv_path=runs/j1j2_4x4_excited_dense.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_excited_dense_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/j1j2_4x4_excited_dense_ckpt/heartbeat
echo "cnn-excited-dense rc=$?"
echo "pipeline3e done"
