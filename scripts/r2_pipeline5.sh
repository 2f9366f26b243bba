#!/bin/bash
# Round-2 pipeline 5: the new-capability hero runs, queued behind
# pipeline 4 (8x8/10x10/16x16 J1-J2 refinements). Everything sits under
# the wedge-recovery supervisor with device-wait gating (the chip spent
# most of this evening in a crashed-worker wedge).
set -x
cd /root/repo

SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 3 --device-wait 14400"

# 1. ARNN gate: TFIM N=16 vs ED with EXACT ancestral sampling
timeout 8000 $SUP --config configs/tfim16_arnn.yaml \
  --override run.csv_path=runs/tfim16_arnn.csv \
  --override run.ckpt_dir=runs/tfim16_arnn_ckpt --override run.ckpt_every=1000 \
  >> runs/tfim16_arnn.log 2>&1
echo "arnn-tfim rc=$?"

# 2. ARNN gate: Heisenberg N=40 vs Bethe, sz0-constrained conditionals
timeout 10000 $SUP --config configs/heis40_arnn.yaml \
  --override run.csv_path=runs/heis40_arnn.csv \
  --override run.ckpt_dir=runs/heis40_arnn_ckpt --override run.ckpt_every=500 \
  >> runs/heis40_arnn.log 2>&1
echo "arnn-heis40 rc=$?"

# 3. Triangular-lattice Heisenberg 6x6 (geometric frustration hero)
timeout 10000 $SUP --config configs/tri6x6_heis.yaml \
  --override run.csv_path=runs/tri6x6.csv \
  --override run.ckpt_dir=runs/tri6x6_ckpt --override run.ckpt_every=500 \
  >> runs/tri6x6.log 2>&1
echo "tri6x6 rc=$?"

# 4. Excited-state demo: TFIM N=16 with an untied complex RBM (can carry
# finite momentum, unlike the k=0-locked CNN). Ground run -> penalized
# run orthogonal to it -> ED eigenvalue #1 comparison offline.
RBM_OV="--override model.kind=rbm --override model.rbm_tie_translations=false \
  --override model.complex_params=true --override model.param_scale=0.1 \
  --override sr.enabled=true --override sr.solver=dense \
  --override sr.diag_shift0=0.1 --override sr.diag_shift_decay=1.0 \
  --override sr.diag_shift_min=0.1 \
  --override optimizer.lr=0.03 --override optimizer.schedule=cosine \
  --override sampler.n_walkers=1024 --override run.steps_per_dispatch=25"
timeout 6000 $SUP --config configs/tfim16_sgd.yaml $RBM_OV \
  --override run.n_steps=1000 \
  --override run.csv_path=runs/tfim16_rbm_ground.csv \
  --override run.ckpt_dir=runs/tfim16_rbm_ground_ckpt --override run.ckpt_every=500 \
  >> runs/tfim16_rbm_ground.log 2>&1
echo "rbm-ground rc=$?"
timeout 8000 $SUP --config configs/tfim16_sgd.yaml $RBM_OV \
  --override run.n_steps=2500 \
  --override run.init_from=runs/tfim16_rbm_ground_ckpt \
  --override optimizer.orthogonalize_to=[runs/tfim16_rbm_ground_ckpt] \
  --override optimizer.orth_beta=10 \
  --override run.csv_path=runs/tfim16_excited.csv \
  --override run.ckpt_dir=runs/tfim16_excited_ckpt --override run.ckpt_every=500 \
  >> runs/tfim16_excited.log 2>&1
echo "excited rc=$?"

# 5. <S^2> on the excited state (sector diagnostic)
timeout 4000 python -m qmcnn_tpu.measure --config configs/tfim16_sgd.yaml $RBM_OV \
  --ckpt-dir runs/tfim16_excited_ckpt --n-samples 4 --total-spin \
  --override sampler.n_walkers=256 \
  > runs/tfim16_excited_measure.json 2>runs/tfim16_excited_measure.log
echo "s2 rc=$?"
