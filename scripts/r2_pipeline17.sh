#!/bin/bash
# Session pipeline 17: new-geometry ED gate, quench capacity scaling, and
# the 10x10 hero rebuild (warm from the pipeline-16 8x8 refined state).
set -x
cd /root/repo
while kill -0 $(cat /tmp/p16.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"

# 1. honeycomb 18-site ED gate (last un-gated geometry; sign-free)
timeout 4000 $SUP --config configs/honeycomb3x3_heis.yaml \
  --override run.csv_path=runs/honeycomb3x3.csv \
  --override run.ckpt_dir=runs/honeycomb3x3_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/honeycomb3x3_ckpt/heartbeat
echo "honeycomb rc=$?"

# 2. quench capacity scaling: same protocol as quench3 but [16,16] + 2x
#    walkers — does the valid window extend past t~0.3?
timeout 4000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 \
  --override model.complex_params=true --override 'model.channels=[16,16]' \
  --override sampler.n_walkers=2048 --override run.n_steps=600 \
  --override run.steps_per_dispatch=25 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3w_ckpt --override run.ckpt_every=300 \
  --override run.csv_path=runs/tfim8x8_h3w.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3w_ckpt/heartbeat
echo "prequench-w rc=$?"
timeout 6000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
  --override model.complex_params=true --override 'model.channels=[16,16]' \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3w_ckpt --dt 0.0025 --steps 240 \
  --diag-shift 0.001 --sampling mc --csv runs/tvmc_tfim8x8_quench4.csv \
  > runs/tvmc_tfim8x8_quench4.out 2>&1
echo "tvmc4 rc=$?"

# 3. 10x10 hero rebuild: depth-8 SPRING warm-started from the 8x8 phase-2
#    refined state (the r2 recipe that set -0.496263(53))
timeout 9000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override 'lattice.shape=[10,10]' \
  --override run.init_from=runs/j1j2_8x8_p15b_ckpt \
  --override optimizer.lr=0.02 --override run.n_steps=1500 \
  --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_10x10_p17.csv \
  --override run.ckpt_dir=runs/j1j2_10x10_p17_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_10x10_p17_ckpt/heartbeat
echo "hero10 rc=$?"

# 4. f32 Lanczos measure on the 10x10 state (pipeline-13 leg)
timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override 'lattice.shape=[10,10]' --ckpt-dir runs/j1j2_10x10_p17_ckpt \
  --n-samples 3 --lanczos-step --override sampler.n_walkers=1024 \
  > runs/j1j2_10x10_p17_measure_f32.json 2> runs/j1j2_10x10_p17_measure_f32.log
echo "measure10-f32 rc=$?"
