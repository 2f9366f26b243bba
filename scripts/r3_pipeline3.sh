#!/bin/bash
# Round-3 pipeline 3 — VERDICT r2 items 5 (t-VMC depth hypothesis) and 7
# (excited states beyond TFIM).
#
# Leg 1-2: the depth A/B the r2 width-null left untested. The failed
#   width arm was [16,16] k=5 complex (6800 complex params, radius-4
#   receptive field). The depth arm here is [16,16,16,16] k=3 residual
#   selu/fan_in (7056 params, SAME radius-4 receptive field) — matched
#   params AND receptive field, so depth/structure is the only variable.
#   Same protocol as quench5: h 3.0 -> 1.5, M=2048, dt 2.5e-3, shift 1e-3,
#   280 steps to t=0.7 (the [8,8]/[16,16] horizon was t~0.3).
# Leg 3-4: 4x4 J1-J2 ground + penalty-orthogonal excited state (two-chain
#   overlap estimator, ops/penalty.py) — ED sector comparison offline.
# Leg 5: 8x8 J1-J2 (pi,pi) momentum-sector CNN (translation_average +
#   model.momentum=[4,4]): the direct magnon gap estimate to cross-check
#   the hero's SMA bound omega(pi,pi)=0.551 (Feynman upper bound).
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p2.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"

DEEP="--override model.complex_params=true --override model.channels=[16,16,16,16] \
  --override model.kernel_size=3 --override model.residual=true \
  --override model.activation=selu --override model.init_mode=fan_in \
  --override model.param_scale=1.0"

# 1. pre-quench ground state at depth 4
timeout 4000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 $DEEP \
  --override sampler.n_walkers=2048 --override run.n_steps=600 \
  --override run.steps_per_dispatch=25 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3d4_ckpt --override run.ckpt_every=300 \
  --override run.csv_path=runs/tfim8x8_h3d4.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3d4_ckpt/heartbeat
echo "prequench-d4 rc=$?"

# 2. depth-4 quench
timeout 6000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 $DEEP \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3d4_ckpt --dt 0.0025 --steps 280 \
  --diag-shift 0.001 --sampling mc --csv runs/tvmc_tfim8x8_quench_d4.csv \
  > runs/tvmc_tfim8x8_quench_d4.out 2>&1
echo "tvmc-d4 rc=$?"

# 3. 4x4 J1-J2 ground (the ED-gated complex-CNN recipe)
G44="--override lattice.shape=[4,4] --override sampler.n_walkers=1024 \
  --override run.steps_per_dispatch=25"
timeout 4000 $SUP --config configs/j1j2_8x8_complex.yaml $G44 \
  --override run.n_steps=1500 --override run.validate_against_ed=true \
  --override run.csv_path=runs/j1j2_4x4_ground.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_ground_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_4x4_ground_ckpt/heartbeat
echo "j1j2-ground rc=$?"

# 4. 4x4 J1-J2 first excited state in the S^z=0 sector (penalty)
timeout 6000 $SUP --config configs/j1j2_8x8_complex.yaml $G44 \
  --override run.n_steps=3000 \
  --override run.init_from=runs/j1j2_4x4_ground_ckpt \
  --override optimizer.orthogonalize_to=[runs/j1j2_4x4_ground_ckpt] \
  --override optimizer.orth_beta=10 \
  --override run.validate_against_ed=false \
  --override run.csv_path=runs/j1j2_4x4_excited.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_excited_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/j1j2_4x4_excited_ckpt/heartbeat
echo "j1j2-excited rc=$?"

# 5. 8x8 J1-J2 (pi,pi) momentum sector: direct magnon gap vs SMA bound
timeout 8000 $SUP --config configs/j1j2_8x8_complex.yaml \
  --override model.translation_average=true --override 'model.momentum=[4,4]' \
  --override sampler.n_walkers=256 --override run.n_steps=1200 \
  --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_pipi.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_pipi_ckpt --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/j1j2_8x8_pipi_ckpt/heartbeat
echo "j1j2-pipi rc=$?"

echo "pipeline3 done"
