#!/bin/bash
# Round-3 pipeline 2b — kagome arm C: the space-group-equivariant GCNN
# (configs/kagome3x3_kgcnn.yaml) at the same matched 3000-step M=1024
# SPRING budget as arms 0/A/B of pipeline 2.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p2.pid.orig) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"

timeout 7000 $SUP --config configs/kagome3x3_kgcnn.yaml \
  --override run.csv_path=runs/kagome3x3_r3_kgcnn.csv \
  --override run.ckpt_dir=runs/kagome3x3_r3_kgcnn_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/kagome3x3_r3_kgcnn_ckpt/heartbeat
echo "kagome armC rc=$?"
echo "pipeline2b done"
