#!/bin/bash
# Round-3 pipeline 3h — 4x4 J1-J2 excited, attempt 5 (final this round):
# E1 shares momentum (0,0) + even spin-flip parity with E0 (host ED), so
# no sector trick applies — penalty or nothing. The dense run moved off
# the reference (overlap 1 -> 0.41) but wandered high and NaN'd at step
# ~240. Gentler: lr 0.008, beta 30, CONSTANT shift 0.1, M=2048, pcg.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p3h.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"
G44="--override lattice.shape=[4,4] --override sampler.n_walkers=2048 \
  --override run.steps_per_dispatch=25 \
  --override sr.solver=pcg --override sr.diag_shift0=0.1 \
  --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.1"

timeout 6000 $SUP --config configs/j1j2_8x8_complex.yaml $G44 \
  --override optimizer.lr=0.008 \
  --override run.n_steps=4000 \
  --override run.init_from=runs/j1j2_4x4_ground_ckpt \
  --override optimizer.orthogonalize_to=[runs/j1j2_4x4_ground_ckpt] \
  --override optimizer.orth_beta=30 \
  --override run.validate_against_ed=false \
  --override run.csv_path=runs/j1j2_4x4_excited_pcg2.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_excited_pcg2_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_4x4_excited_pcg2_ckpt/heartbeat
echo "cnn-excited-pcg2 rc=$?"
echo "pipeline3h done"
