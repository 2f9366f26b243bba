#!/bin/bash
set -x
cd /root/repo
while kill -0 $(cat /tmp/p12.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
# 0. valid (f32) Lanczos re-measures of the two heroes (the bf16 moment
#    pass was noise-dominated; measure now forces f32 + validity guard)
timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_r3_ckpt --n-samples 6 --lanczos-step \
  --override sampler.n_walkers=2048 \
  > runs/j1j2_8x8_r3_measure_f32.json 2> runs/j1j2_8x8_r3_measure_f32.log
echo "measure8-f32 rc=$?"
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override 'lattice.shape=[10,10]' --ckpt-dir runs/j1j2_10x10_spring_ckpt \
  --n-samples 3 --lanczos-step --override sampler.n_walkers=1024 \
  > runs/j1j2_10x10_measure_f32.json 2> runs/j1j2_10x10_measure_f32.log
echo "measure10-f32 rc=$?"
# 1. heis40 ARNN rerun under the re-pointed adam recipe (fast: exact
#    sampling at ~245k sweeps/s)
timeout 3000 $SUP --config configs/heis40_arnn.yaml \
  --override run.csv_path=runs/heis40_arnn2.csv \
  --override run.ckpt_dir=runs/heis40_arnn2_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/heis40_arnn2_ckpt/heartbeat
echo "arnn40-adam rc=$?"
# 2. depth-10 rung of the 8x8 hero, warm-started from the depth-8 best
timeout 7000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override 'model.channels=[10,10,10,10,10,10,10,10,10,10]' \
  --override run.init_from=runs/j1j2_8x8_r3_ckpt \
  --override optimizer.lr=0.012 --override run.n_steps=1500 \
  --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_d10.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d10_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_8x8_d10_ckpt/heartbeat
echo "d10 rc=$?"
timeout 4000 python bench.py
echo "bench rc=$?"
