#!/bin/bash
# Session pipeline 30 (chained after 26): Jastrow-boosted hero attempts +
# the 400-site observable map + a bench check.
#   leg 1: 8x8 J1-J2 depth-10 + Jastrow refine, warm from the d10 phase-1
#          best (-0.497662(26)). The wrapper-transparent warm-start
#          (transfer.py) makes this possible; the factor is zero-init so
#          the run starts AT the hero state — it can only move if the
#          pair correlator helps (tri gate: 1.09e-2 -> 9.2e-3).
#   leg 2: 10x10 depth-10 + Jastrow refine from the new 10x10 d10 best.
#   leg 3: measure --sma + observables on the 20x20 state (400-site
#          magnon band + Neel order/correlation-length data).
#   leg 4: bench.py sanity (records the session's chip throughput).
set -x
cd /root/repo
while kill -0 $(cat /tmp/p26real.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"
D10="--override model.channels=[10,10,10,10,10,10,10,10,10,10]"

# 1. 8x8 d10 + jastrow refine
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D10 --override model.jastrow=true \
  --override run.init_from=runs/j1j2_8x8_d10_ckpt \
  --override optimizer.lr=0.006 \
  --override run.n_steps=1000 --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_d10j.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d10j_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_8x8_d10j_ckpt/heartbeat
echo "d10j-8x8 rc=$?"

# 2. 10x10 d10 + jastrow refine
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D10 --override model.jastrow=true \
  --override 'lattice.shape=[10,10]' \
  --override run.init_from=runs/j1j2_10x10_d10_ckpt \
  --override optimizer.lr=0.006 \
  --override run.n_steps=800 --override run.steps_per_dispatch=3 \
  --override run.csv_path=runs/j1j2_10x10_d10j.csv \
  --override run.ckpt_dir=runs/j1j2_10x10_d10j_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_10x10_d10j_ckpt/heartbeat
echo "d10j-10x10 rc=$?"

# 3. 20x20 observable map (SMA band + order parameters at 400 sites)
timeout 6000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override 'lattice.shape=[20,20]' --override sampler.n_walkers=256 \
  --override run.therm_sweeps_per_dispatch=5 \
  --ckpt-dir runs/j1j2_20x20_p27_ckpt --n-samples 4 --sma \
  > runs/j1j2_20x20_sma.json 2> runs/j1j2_20x20_sma.log
echo "sma-20x20 rc=$?"

# 4. bench sanity
timeout 3000 python bench.py > runs/bench_p30.json 2> runs/bench_p30.log
echo "bench rc=$?"

echo "pipeline30 done"
