#!/bin/bash
# Session pipeline 20 (chained after 19): the heis40 ARNN minSR->adam
# re-point (9.3% -> 2.24e-4) strongly suggests the 4x4 J1-J2 ARNN's 9.1%
# plateau is the same optimizer artifact — probe adam at the shipped
# capacity/step budget, vs ED.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p19.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"

timeout 4000 $SUP --config configs/j1j2_4x4_arnn.yaml \
  --override optimizer.kind=adam --override optimizer.lr=0.005 \
  --override sr.enabled=false --override run.n_steps=3000 \
  --override run.csv_path=runs/j1j2_4x4_arnn_adam.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_arnn_adam_ckpt \
  --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/j1j2_4x4_arnn_adam_ckpt/heartbeat
echo "arnn4x4-adam rc=$?"

echo "pipeline20 done"
