#!/bin/bash
# Round-3 pipeline 3b — fixes for the two failed p3 legs:
#   * the d4 pre-quench used configs/tfim16_sgd.yaml's PLAIN-SGD recipe
#     (sr disabled, lr 0.08) — the deep residual net stalled at -2.79/site
#     (ground -3.1968) with accept 0.17, and the quench's first minSR
#     solve NaN'd on the garbage state (the new halt guard stopped it at
#     step 1). Fix: train the pre-quench with SPRING-minSR.
#   * the 4x4 J1-J2 excited-state penalty used the k=0-locked CNN + pcg
#     and stalled at -5.72 (E1 sector target -8.13899, host sector ED).
#     Fix: the r2 TFIM recipe — UNTIED complex RBM + dense SR, ground
#     then penalty-orthogonal run (the RBM carries any momentum).
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p3b.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"
SPRING="--override sr.enabled=true --override sr.solver=minsr --override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"
DEEP="--override model.complex_params=true --override model.channels=[16,16,16,16] \
  --override model.kernel_size=3 --override model.residual=true \
  --override model.activation=selu --override model.init_mode=fan_in \
  --override model.param_scale=1.0"

# 1. d4 pre-quench, proper optimizer
timeout 5000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 $DEEP $SPRING \
  --override optimizer.lr=0.02 \
  --override sampler.n_walkers=2048 --override run.n_steps=800 \
  --override run.steps_per_dispatch=10 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3d4b_ckpt --override run.ckpt_every=400 \
  --override run.csv_path=runs/tfim8x8_h3d4b.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3d4b_ckpt/heartbeat
echo "prequench-d4b rc=$?"

# 2. depth-4 quench (matched protocol: h 3.0 -> 1.5, dt 2.5e-3, shift 1e-3)
timeout 7000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 $DEEP \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3d4b_ckpt --dt 0.0025 --steps 280 \
  --diag-shift 0.001 --sampling mc --csv runs/tvmc_tfim8x8_quench_d4b.csv \
  > runs/tvmc_tfim8x8_quench_d4b.out 2>&1
echo "tvmc-d4b rc=$?"

# 3-4. 4x4 J1-J2 excited state via untied complex RBM + dense SR
RBM_OV="--override model.kind=rbm --override model.rbm_tie_translations=false \
  --override model.rbm_alpha=4 --override model.complex_params=true \
  --override model.param_scale=0.1 \
  --override sr.enabled=true --override sr.solver=dense \
  --override sr.diag_shift0=0.1 --override sr.diag_shift_decay=1.0 \
  --override sr.diag_shift_min=0.1 \
  --override optimizer.lr=0.03 --override optimizer.schedule=cosine \
  --override lattice.shape=[4,4] --override sampler.n_walkers=1024 \
  --override run.steps_per_dispatch=25"
timeout 5000 $SUP --config configs/j1j2_8x8_complex.yaml $RBM_OV \
  --override run.n_steps=1500 --override run.validate_against_ed=true \
  --override run.csv_path=runs/j1j2_4x4_rbm_ground.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_rbm_ground_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_4x4_rbm_ground_ckpt/heartbeat
echo "rbm-ground rc=$?"
timeout 7000 $SUP --config configs/j1j2_8x8_complex.yaml $RBM_OV \
  --override run.n_steps=3000 \
  --override run.init_from=runs/j1j2_4x4_rbm_ground_ckpt \
  --override optimizer.orthogonalize_to=[runs/j1j2_4x4_rbm_ground_ckpt] \
  --override optimizer.orth_beta=10 \
  --override run.csv_path=runs/j1j2_4x4_rbm_excited.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_rbm_excited_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/j1j2_4x4_rbm_excited_ckpt/heartbeat
echo "rbm-excited rc=$?"
echo "pipeline3b done"
