#!/bin/bash
# Round-2 pipeline 8: ViT-family TPU gates (launch AFTER pipeline 7).
# 1. 4x4 J1-J2 ViT vs ED (the family's accuracy gate on real hardware)
# 2. 8x8 J1-J2 ViT hero (transformer counterpart of the GCNN hero)
# 3. bench sanity rerun
set -x
cd /root/repo

SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 3 --device-wait 7200"

timeout 6000 $SUP --config configs/j1j2_4x4_vit.yaml \
  --override run.csv_path=runs/j1j2_4x4_vit.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_vit_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_4x4_vit_ckpt/heartbeat \
  >> runs/j1j2_4x4_vit.log 2>&1
echo "vit-4x4 rc=$?"

timeout 12000 $SUP --config configs/j1j2_8x8_vit.yaml \
  --override run.heartbeat_path=runs/j1j2_8x8_vit_ckpt/heartbeat \
  >> runs/j1j2_8x8_vit.log 2>&1
echo "vit-8x8 rc=$?"

timeout 4000 python bench.py > runs/bench_r2c.json 2>runs/bench_r2c.log
echo "bench rc=$?"
