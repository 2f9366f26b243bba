#!/bin/bash
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 3 --device-wait 7200"
# 1. Lanczos-refined measurement of the best 8x8 hero (fixed chunk+dispatch path)
timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_r3_ckpt --n-samples 6 --lanczos-step --dimer --renyi2 half \
  --override sampler.n_walkers=2048 > runs/j1j2_8x8_r3_measure.json 2> runs/j1j2_8x8_r3_measure.log
echo "measure8 rc=$?"
# 2. Lanczos-refined measurement of the 10x10 hero
timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override 'lattice.shape=[10,10]' --ckpt-dir runs/j1j2_10x10_spring_ckpt \
  --n-samples 3 --lanczos-step --override sampler.n_walkers=1024 \
  > runs/j1j2_10x10_spring_measure.json 2> runs/j1j2_10x10_spring_measure.log
echo "measure10 rc=$?"
# 3. Triangular D6-GCNN hero rerun (auto-chunk now OOM-safe for complex convs)
timeout 9000 $SUP --config configs/tri6x6_tgcnn.yaml \
  --override run.csv_path=runs/tri6x6_tgcnn.csv \
  --override run.ckpt_dir=runs/tri6x6_tgcnn_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/tri6x6_tgcnn_ckpt/heartbeat
echo "tgcnn rc=$?"
timeout 4000 python -m qmcnn_tpu.measure --config configs/tri6x6_tgcnn.yaml \
  --ckpt-dir runs/tri6x6_tgcnn_ckpt --n-samples 6 --chirality \
  --override sampler.n_walkers=512 > runs/tri6x6_tgcnn_measure.json 2> runs/tri6x6_tgcnn_measure.log
echo "measure-tri rc=$?"
