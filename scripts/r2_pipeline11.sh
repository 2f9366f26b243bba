#!/bin/bash
set -x
cd /root/repo
# wait for pipeline 10 to release the chip
while kill -0 $(cat /tmp/p10.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 3 --device-wait 7200"
# 1. pre-quench ground state: TFIM 8x8 at h=3.0 (above critical ~3.04 is
#    near-critical; quick 600-step train is plenty for a quench demo)
timeout 4000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 \
  --override model.complex_params=true --override 'model.channels=[8,8]' \
  --override sampler.n_walkers=1024 --override run.n_steps=600 \
  --override run.steps_per_dispatch=25 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3_ckpt --override run.ckpt_every=300 \
  --override run.csv_path=runs/tfim8x8_h3.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3_ckpt/heartbeat
echo "prequench rc=$?"
# 2. sudden quench h 3.0 -> 1.5, real-time TDVP with MC sampling
timeout 6000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
  --override model.complex_params=true --override 'model.channels=[8,8]' \
  --override sampler.n_walkers=1024 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3_ckpt --dt 0.005 --steps 200 \
  --sampling mc --csv runs/tvmc_tfim8x8_quench2.csv \
  > runs/tvmc_tfim8x8_quench2.out 2>&1
echo "tvmc2 rc=$?"
timeout 4000 python bench.py
echo "bench rc=$?"
