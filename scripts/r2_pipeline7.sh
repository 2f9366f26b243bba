#!/bin/bash
# Round-2 continuation pipeline 7: capability-gate hero runs for the
# round-2 additions (these were queued as pipeline 5 last session but the
# TPU worker wedge ate the whole evening — none of them ever ran).
# Launch AFTER pipeline 6 (the J1-J2 heroes) finishes.
set -x
cd /root/repo

SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 3 --device-wait 7200"

# 1. ARNN gate: TFIM N=16 vs ED with EXACT ancestral sampling
timeout 8000 $SUP --config configs/tfim16_arnn.yaml \
  --override run.csv_path=runs/tfim16_arnn.csv \
  --override run.ckpt_dir=runs/tfim16_arnn_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/tfim16_arnn_ckpt/heartbeat \
  >> runs/tfim16_arnn.log 2>&1
echo "arnn-tfim rc=$?"

# 2. ARNN gate: Heisenberg N=40 vs Bethe, sz0-constrained conditionals
timeout 10000 $SUP --config configs/heis40_arnn.yaml \
  --override run.csv_path=runs/heis40_arnn.csv \
  --override run.ckpt_dir=runs/heis40_arnn_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/heis40_arnn_ckpt/heartbeat \
  >> runs/heis40_arnn.log 2>&1
echo "arnn-heis40 rc=$?"

# 2b. ARNN 2D gate: J1-J2 4x4 with the PixelCNN trunk + complex phases
#     + sector conditionals + exact sampling, vs ED
timeout 8000 $SUP --config configs/j1j2_4x4_arnn.yaml \
  --override run.csv_path=runs/j1j2_4x4_arnn.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_arnn_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_4x4_arnn_ckpt/heartbeat \
  >> runs/j1j2_4x4_arnn.log 2>&1
echo "arnn-j1j2 rc=$?"

# 3. Triangular-lattice Heisenberg 6x6 (geometric frustration hero)
timeout 10000 $SUP --config configs/tri6x6_heis.yaml \
  --override run.csv_path=runs/tri6x6.csv \
  --override run.ckpt_dir=runs/tri6x6_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/tri6x6_ckpt/heartbeat \
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
  --override run.heartbeat_path=runs/tfim16_rbm_ground_ckpt/heartbeat \
  >> runs/tfim16_rbm_ground.log 2>&1
echo "rbm-ground rc=$?"
timeout 8000 $SUP --config configs/tfim16_sgd.yaml $RBM_OV \
  --override run.n_steps=2500 \
  --override run.init_from=runs/tfim16_rbm_ground_ckpt \
  --override optimizer.orthogonalize_to=[runs/tfim16_rbm_ground_ckpt] \
  --override optimizer.orth_beta=10 \
  --override run.csv_path=runs/tfim16_excited.csv \
  --override run.ckpt_dir=runs/tfim16_excited_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/tfim16_excited_ckpt/heartbeat \
  >> runs/tfim16_excited.log 2>&1
echo "excited rc=$?"

# 5. <S^2> on the excited state (sector diagnostic)
timeout 4000 python -m qmcnn_tpu.measure --config configs/tfim16_sgd.yaml $RBM_OV \
  --ckpt-dir runs/tfim16_excited_ckpt --n-samples 4 --total-spin \
  --override sampler.n_walkers=256 \
  > runs/tfim16_excited_measure.json 2>runs/tfim16_excited_measure.log
echo "s2 rc=$?"

# 6. t-VMC at production scale: real-time quench of 2D TFIM 8x8 (64
# sites, far beyond full-sum reach) from |+x>^64, MC sampling — energy
# conservation is the integrator/sampling diagnostic recorded per step.
timeout 6000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override lattice.shape=[8,8] --override hamiltonian.h=3.0 \
  --override model.complex_params=true --override model.channels=[8,8] \
  --override sampler.n_walkers=1024 --override sampler.move=flip \
  --mode real --init-zero --dt 0.005 --steps 200 --sampling mc \
  --csv runs/tvmc_tfim8x8_quench.csv \
  > runs/tvmc_tfim8x8_quench.log 2>&1
echo "tvmc rc=$?"

# 7. driver bench sanity
timeout 4000 python bench.py > runs/bench_r2b.json 2>runs/bench_r2b.log
echo "bench rc=$?"
