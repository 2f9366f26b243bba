#!/bin/bash
# Session pipeline 15 (4th round-2 VM): quick legs first — the queued
# pipeline-13/14 work whose checkpoints died with the previous VM.
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"

# 1. heis40 ARNN TPU rerun under the re-pointed adam recipe (pipeline-13
#    leg 1; the CPU probe reached 2.85% where minSR plateaued at 9.3%)
timeout 4500 $SUP --config configs/heis40_arnn.yaml \
  --override run.csv_path=runs/heis40_arnn2.csv \
  --override run.ckpt_dir=runs/heis40_arnn2_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/heis40_arnn2_ckpt/heartbeat
echo "arnn40-adam rc=$?"

# 2. pre-quench ground state: TFIM 8x8 at h=3.0 (rebuild — ckpt died)
timeout 4000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 \
  --override model.complex_params=true --override 'model.channels=[8,8]' \
  --override sampler.n_walkers=1024 --override run.n_steps=600 \
  --override run.steps_per_dispatch=25 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3_ckpt --override run.ckpt_every=300 \
  --override run.csv_path=runs/tfim8x8_h3.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3_ckpt/heartbeat
echo "prequench rc=$?"

# 3. quench retry with MC-mode regularization (pipeline-14 leg): the
#    first leg moved real physics (sx 0.88 -> 0.41) but the shift-1e-4
#    minSR solve blew up at t~0.5 (solver_residual 14 -> NaN);
#    10x shift + half dt
timeout 6000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
  --override model.complex_params=true --override 'model.channels=[8,8]' \
  --override sampler.n_walkers=1024 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3_ckpt --dt 0.0025 --steps 240 \
  --diag-shift 0.001 --sampling mc --csv runs/tvmc_tfim8x8_quench3.csv \
  > runs/tvmc_tfim8x8_quench3.out 2>&1
echo "tvmc3 rc=$?"
