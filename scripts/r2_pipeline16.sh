#!/bin/bash
# Session pipeline 16: rebuild the 8x8 hero (checkpoints died with the
# previous VM) and run the queued pipeline-13 legs that depended on it —
# f32 Lanczos measure + the depth-10 rung — then the ViT gate extension
# and an end-of-session bench.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p15.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"

# 1. SPRING phase 1 (the measured-best recipe: momentum-minSR, lr 0.025
#    cosine, 3000 steps M=1024 — BASELINE r2 2026-08-18, -0.497476(61))
timeout 9000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override optimizer.lr=0.025 \
  --override run.csv_path=runs/j1j2_8x8_p15a.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_p15a_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_8x8_p15a_ckpt/heartbeat
echo "p1 rc=$?"

# 2. phase 2 refine: warm-start at 2x walkers, low-noise tail
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override run.init_from=runs/j1j2_8x8_p15a_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.006 \
  --override run.n_steps=1000 --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_p15b.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_p15b_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_8x8_p15b_ckpt/heartbeat
echo "p2 rc=$?"

# 3. f32 Lanczos-step measure on the refined state (pipeline-13 leg 0:
#    the bf16 moment pass was noise-dominated; measure now forces f32 +
#    validity guard + per-chunk dispatches)
timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_p15b_ckpt --n-samples 6 --lanczos-step \
  --override sampler.n_walkers=2048 \
  > runs/j1j2_8x8_p15_measure_f32.json 2> runs/j1j2_8x8_p15_measure_f32.log
echo "measure8-f32 rc=$?"

# 4. depth-10 rung, warm-started from the refined depth-8 state (the two
#    new layers keep fresh init — transfer is by key-path+shape)
timeout 9000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override 'model.channels=[10,10,10,10,10,10,10,10,10,10]' \
  --override run.init_from=runs/j1j2_8x8_p15b_ckpt \
  --override optimizer.lr=0.012 --override run.n_steps=1500 \
  --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_d10.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d10_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_8x8_d10_ckpt/heartbeat
echo "d10 rc=$?"

# 5. ViT 4x4 ED-gate extension: from scratch (old ckpt gone), 2.7x the
#    original step budget at the same recipe
timeout 6000 $SUP --config configs/j1j2_4x4_vit.yaml \
  --override run.n_steps=4000 \
  --override run.csv_path=runs/j1j2_4x4_vit2.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_vit2_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/j1j2_4x4_vit2_ckpt/heartbeat
echo "vit2 rc=$?"

timeout 4000 python bench.py
echo "bench rc=$?"
