#!/bin/bash
# Round-4 pipeline 4 — t-VMC "different ansatz class" shot (VERDICT r3
# item 8, the stretch): the t~0.3 entanglement wall is robust to width
# (r2) and depth (r3) of the plain complex CNN. The split amp/phase net
# is the remaining structural candidate — its phase trunk is exactly the
# degree of freedom a quench excites (post-quench dynamics is phase
# growth on a slowly-changing amplitude). Arm: [16,16] amplitude (the
# r3 width-control capacity) + [16]x4 phase trunk, quenched at the
# validated shift 1e-2 — directly comparable to runs/tvmc_tfim8x8_
# quench_w2f.csv (clean to t~0.3, blowup past 0.4).
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 14400"
MODEL="--override model.complex_params=true --override model.channels=[16,16] --override model.init_mode=fan_in --override model.phase_net_channels=[16,16,16,16]"

# pre-quench ground state at h=3.0 (phase trunk present, gate zero-init)
timeout 4000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 \
  $MODEL \
  --override sampler.n_walkers=2048 --override run.n_steps=600 \
  --override run.steps_per_dispatch=25 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3pn_ckpt --override run.ckpt_every=300 \
  --override run.csv_path=runs/tfim8x8_h3pn.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3pn_ckpt/heartbeat
echo "prequench-pn rc=$?"

# quench h 3.0 -> 1.5, real-time TDVP, MC sampling, shift 1e-2
timeout 8000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
  $MODEL \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3pn_ckpt --dt 0.0025 --steps 280 \
  --diag-shift 0.01 --sampling mc --csv runs/tvmc_tfim8x8_quench_pn.csv \
  > runs/tvmc_tfim8x8_quench_pn.out 2>&1
echo "tvmc-pn rc=$?"
echo "r4_pipeline4 done"
