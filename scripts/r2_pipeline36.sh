#!/bin/bash
# Session pipeline 36 (chained after 35): the depth ladder's next rung.
# Depth-10 beat depth-8 at every size this session (8x8/10x10/12x12/
# 16x16); this tests depth 12 on the 8x8 anchor (current direct best
# -0.497685(28), DMRG target ~-0.4985 — 0.16% gap), warm from the d10j
# best: 10 layers transfer, 2 fresh, jastrow carried. Then a final
# hardened-bench reading for the round record.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p35.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"
D12="--override model.channels=[10,10,10,10,10,10,10,10,10,10,10,10]"

# 1. 8x8 depth-12 rung
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D12 --override model.jastrow=true \
  --override run.init_from=runs/j1j2_8x8_d10j_ckpt \
  --override optimizer.lr=0.01 \
  --override run.n_steps=2000 --override run.steps_per_dispatch=4 \
  --override run.csv_path=runs/j1j2_8x8_d12j.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d12j_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_8x8_d12j_ckpt/heartbeat
echo "d12j-8x8 rc=$?"

# 2. final bench reading for the round
timeout 3000 python bench.py > runs/bench_p36.json 2> runs/bench_p36.log
echo "bench rc=$?"

echo "pipeline36 done"
