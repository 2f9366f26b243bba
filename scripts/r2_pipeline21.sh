#!/bin/bash
# Session pipeline 21 (chained after 20): honeycomb J1-J2 ED gate — the
# frustrated leg of the last new geometry (NNN shell dense-oracle-pinned
# this session).
set -x
cd /root/repo
while kill -0 $(cat /tmp/p20.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"

timeout 4500 $SUP --config configs/honeycomb3x3_j1j2.yaml \
  --override run.csv_path=runs/honeycomb3x3_j1j2.csv \
  --override run.ckpt_dir=runs/honeycomb3x3_j1j2_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/honeycomb3x3_j1j2_ckpt/heartbeat
echo "honeycomb-j1j2 rc=$?"

echo "pipeline21 done"
