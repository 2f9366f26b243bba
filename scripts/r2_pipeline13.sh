#!/bin/bash
set -x
cd /root/repo
while kill -0 $(cat /tmp/p12.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
# depth-10 rung of the 8x8 hero: warm-start the first 8 layers from the
# depth-8 best (transfer keeps matching leaves, fresh-inits the new ones)
timeout 10000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override 'model.channels=[10,10,10,10,10,10,10,10,10,10]' \
  --override run.init_from=runs/j1j2_8x8_r3_ckpt \
  --override optimizer.lr=0.012 --override run.n_steps=2000 \
  --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_d10.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d10_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_8x8_d10_ckpt/heartbeat
echo "d10 rc=$?"
# short M=2048 polish
timeout 6000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override 'model.channels=[10,10,10,10,10,10,10,10,10,10]' \
  --override run.init_from=runs/j1j2_8x8_d10_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.005 \
  --override run.n_steps=600 --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_d10_refine.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d10_refine_ckpt --override run.ckpt_every=200 \
  --override run.heartbeat_path=runs/j1j2_8x8_d10_refine_ckpt/heartbeat
echo "d10-refine rc=$?"
timeout 4000 python bench.py
echo "bench rc=$?"
