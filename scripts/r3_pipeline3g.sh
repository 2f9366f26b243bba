#!/bin/bash
# Round-3 pipeline 3g — rebuild the [16,16] width pre-quench (its r2
# ckpt died with its VM) and quench it at shift 1e-2, completing the
# regularization-matched width-vs-depth A/B of pipeline 3f.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p3g.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"

timeout 4000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 \
  --override model.complex_params=true --override 'model.channels=[16,16]' \
  --override model.init_mode=fan_in \
  --override sampler.n_walkers=2048 --override run.n_steps=600 \
  --override run.steps_per_dispatch=25 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3w2g_ckpt --override run.ckpt_every=300 \
  --override run.csv_path=runs/tfim8x8_h3w2g.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3w2g_ckpt/heartbeat
echo "prequench-w2g rc=$?"

timeout 7000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
  --override model.complex_params=true --override 'model.channels=[16,16]' \
  --override model.init_mode=fan_in \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3w2g_ckpt --dt 0.0025 --steps 280 \
  --diag-shift 0.01 --sampling mc --csv runs/tvmc_tfim8x8_quench_w2f.csv \
  > runs/tvmc_tfim8x8_quench_w2f.out 2>&1
echo "tvmc-w2f rc=$?"
echo "pipeline3g done"
