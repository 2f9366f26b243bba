#!/bin/bash
# Session pipeline 27 (chained after 26): retry of the pipeline-24 size
# ladder. p24's 16x16 leg died 3x at its FIRST dispatch with the tunnel's
# dispatch-kill signature (UNAVAILABLE device error, runs/r2_pipeline24.out):
# the single all-sweeps thermalization dispatch (100 sweeps x 256 proposals
# through the depth-8 GCNN) exceeds the ~80 s ceiling at 256 sites. Fixed by
# run.therm_sweeps_per_dispatch (train.py therm_chunks): bounded ~15-20 s
# thermalization dispatches. The 20x20 leg gets an explicit 5/dispatch
# (sweeps are ~2.5x costlier again at 400 sites).
set -x
cd /root/repo
while kill -0 $(cat /tmp/p26.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"

# 1. 16x16 refresh (depth-8 r2 recipe; r1 number to beat: -0.494666(76))
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override 'lattice.shape=[16,16]' \
  --override run.init_from=runs/j1j2_12x12_p19_ckpt \
  --override sampler.n_walkers=256 --override optimizer.lr=0.012 \
  --override run.n_steps=400 --override run.steps_per_dispatch=1 \
  --override run.therm_sweeps_per_dispatch=10 \
  --override run.log_every=20 \
  --override run.csv_path=runs/j1j2_16x16_p27.csv \
  --override run.ckpt_dir=runs/j1j2_16x16_p27_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_16x16_p27_ckpt/heartbeat
echo "hero16 rc=$?"

# 2. 20x20 probe — largest frustrated system yet (400 sites)
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override 'lattice.shape=[20,20]' \
  --override run.init_from=runs/j1j2_16x16_p27_ckpt \
  --override sampler.n_walkers=256 --override optimizer.lr=0.008 \
  --override run.n_steps=200 --override run.steps_per_dispatch=1 \
  --override run.therm_sweeps_per_dispatch=5 \
  --override run.log_every=10 \
  --override run.csv_path=runs/j1j2_20x20_p27.csv \
  --override run.ckpt_dir=runs/j1j2_20x20_p27_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_20x20_p27_ckpt/heartbeat
echo "hero20 rc=$?"

echo "pipeline27 done"
