#!/bin/bash
# Round-3 pipeline 4 — VERDICT r2 item 6: scale the ViT to its verdict.
# One decisive capacity step on both rungs:
#   leg 1: 4x4 gate at [48]x6 heads 6 (3.4x the shipped [32]x4 params),
#          4000 steps — either joins the CNN/GCNN <=1e-3 bar or pins the
#          capacity ceiling.
#   leg 2: 8x8 hero at [64]x8 heads 8, 3000 steps fresh (the r2 ckpt died
#          with its VM) — either beats the GCNN-family -0.4972 or the
#          "throughput alternative" framing is retired.
# Then the MFU report (VERDICT item 4) on the real chip.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p3.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"

# 1. 4x4 capacity gate
timeout 6000 $SUP --config configs/j1j2_4x4_vit.yaml \
  --override model.channels=[48,48,48,48,48,48] --override model.vit_heads=6 \
  --override run.n_steps=4000 \
  --override run.csv_path=runs/j1j2_4x4_vit_cap.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_vit_cap_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/j1j2_4x4_vit_cap_ckpt/heartbeat
echo "vit-4x4-cap rc=$?"

# 2. 8x8 hero capacity step
timeout 9000 $SUP --config configs/j1j2_8x8_vit.yaml \
  --override model.channels=[64,64,64,64,64,64,64,64] --override model.vit_heads=8 \
  --override run.n_steps=3000 --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_vit_cap.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_vit_cap_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_8x8_vit_cap_ckpt/heartbeat
echo "vit-8x8-cap rc=$?"

# 3. MFU report on the real chip (BASELINE.md table source)
timeout 4000 python scripts/mfu_report.py --out runs/mfu_report.md \
  > runs/mfu_report.log 2>&1
echo "mfu rc=$?"

echo "pipeline4 done"
