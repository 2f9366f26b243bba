#!/bin/bash
# Round-3 pipeline 2e — kagome arm F: continue the new-best arm-D state
# (phase-net over converged control, 2.26%) for 3000 more steps at low lr
# with EMA — the saturation probe of the amplitude+phase ansatz.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p2e.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"

timeout 5000 $SUP --config configs/kagome3x3_phasenet.yaml \
  $SPRING --override optimizer.lr=0.004 --override optimizer.ema_decay=0.998 \
  --override run.init_from=runs/kagome3x3_r3_phasenet_warm_ckpt \
  --override run.n_steps=3000 \
  --override run.csv_path=runs/kagome3x3_r3_phasenet_ext.csv \
  --override run.ckpt_dir=runs/kagome3x3_r3_phasenet_ext_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/kagome3x3_r3_phasenet_ext_ckpt/heartbeat
echo "kagome armF rc=$?"

# measure the EMA average too (free polish on converged tails, p19 A/B)
timeout 3000 python -m qmcnn_tpu.measure --config configs/kagome3x3_phasenet.yaml \
  --ckpt-dir runs/kagome3x3_r3_phasenet_ext_ckpt --ema --n-samples 6 \
  > runs/kagome3x3_r3_phasenet_ext_ema.json 2> runs/kagome3x3_r3_phasenet_ext_ema.log
echo "kagome armF-ema rc=$?"
echo "pipeline2e done"
