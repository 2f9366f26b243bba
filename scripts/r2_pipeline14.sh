#!/bin/bash
set -x
cd /root/repo
while kill -0 $(cat /tmp/p13.pid) 2>/dev/null; do sleep 60; done
# skip if the round is nearly over (driver bench needs the chip free)
NOW=$(date +%s); CUTOFF=$(date -d '2026-08-19 06:30' +%s)
[ "$NOW" -lt "$CUTOFF" ] || { echo "p14 skipped: past cutoff"; exit 0; }
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 3600"
# ViT 4x4 ED-gate extension: warm-start the converged-but-offset state,
# second cosine leg at lower lr (the 1500-step run landed at 6.6e-3 with
# tiny variance — test whether it is a schedule artifact or a real
# ViT-capacity floor at this size)
timeout 5500 $SUP --config configs/j1j2_4x4_vit.yaml \
  --override run.init_from=runs/j1j2_4x4_vit_ckpt \
  --override optimizer.lr=0.004 --override run.n_steps=2500 \
  --override run.csv_path=runs/j1j2_4x4_vit2.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_vit2_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_4x4_vit2_ckpt/heartbeat
echo "vit2 rc=$?"
