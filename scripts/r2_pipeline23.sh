#!/bin/bash
# Session pipeline 23 (chained after 22): corrected quench-capacity legs.
# The pipeline-17 [16,16] pre-quench COLLAPSED at init: doubling the width
# at fixed param_scale=0.05 raises the init log|psi| spread 12x (measured
# 0.023 -> 0.284 over random configs), the walkers freeze on the polarized
# peak (accept 0.000 from the first row, E/site -2.0 exactly, var -> 0)
# and SGD has no signal. Fix verified on CPU: init_mode=fan_in flattens
# the init (std ~ 0) and the run descends normally (accept 1.0 -> healthy,
# E/site -2.98 by step 20 on the CPU probe). Fresh run names keep the
# collapsed artifacts as failure evidence.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p22.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"

# 1. pre-quench ground state: TFIM 8x8 h=3.0, [16,16] complex, fan_in init
timeout 4000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 \
  --override model.complex_params=true --override 'model.channels=[16,16]' \
  --override model.init_mode=fan_in \
  --override sampler.n_walkers=2048 --override run.n_steps=600 \
  --override run.steps_per_dispatch=25 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3w2_ckpt --override run.ckpt_every=300 \
  --override run.csv_path=runs/tfim8x8_h3w2.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3w2_ckpt/heartbeat
echo "prequench-w2 rc=$?"

# 2. capacity-scaled quench: h 3.0 -> 1.5, [16,16], M=2048 — does the
#    valid window extend past the [8,8] run's t~0.3?
timeout 6000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
  --override model.complex_params=true --override 'model.channels=[16,16]' \
  --override model.init_mode=fan_in \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3w2_ckpt --dt 0.0025 --steps 240 \
  --diag-shift 0.001 --sampling mc --csv runs/tvmc_tfim8x8_quench5.csv \
  > runs/tvmc_tfim8x8_quench5.out 2>&1
echo "tvmc5 rc=$?"

echo "pipeline23 done"
