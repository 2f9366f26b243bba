#!/bin/bash
# Session pipeline 32 (chained after 31): bench recheck + the depth-10
# size ladder to 400 sites + observable maps of the new deep states.
#   leg 1: bench.py recheck with the hardened best-of-passes timing —
#          the p30 reading (136.7k) sat below the session's 240-307k
#          band on unchanged code; min-over-reps + max-over-passes
#          recovers the clean-tunnel rate.
#   leg 2: 16x16 depth-10 (+jastrow) rung, warm from the 12x12 d10j
#          state (fallback: 10x10 d10j) — current 256-site best to beat:
#          -0.495051(86) (depth-8, p27 refresh).
#   leg 3: measure --sma on the 12x12 d10j state (144-site magnon band).
#   leg 4: measure --chirality + --sma on the tri6x6 jastrow hero.
#   leg 5: 20x20 depth-10 rung, warm from leg 2 — extends the deep
#          ladder to the largest cluster (400-site best: -0.494843(69)).
set -x
cd /root/repo
while kill -0 $(cat /tmp/p31.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"
D10="--override model.channels=[10,10,10,10,10,10,10,10,10,10]"

# 1. bench recheck (hardened timing)
timeout 3000 python bench.py > runs/bench_p32.json 2> runs/bench_p32.log
echo "bench rc=$?"

# 2. 16x16 depth-10 + jastrow rung
INIT16=runs/j1j2_12x12_d10j_ckpt
[ -d "$INIT16" ] || INIT16=runs/j1j2_10x10_d10j_ckpt
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D10 --override model.jastrow=true \
  --override 'lattice.shape=[16,16]' \
  --override run.init_from=$INIT16 \
  --override sampler.n_walkers=256 --override optimizer.lr=0.012 \
  --override run.n_steps=400 --override run.steps_per_dispatch=1 \
  --override run.therm_sweeps_per_dispatch=10 \
  --override run.log_every=20 \
  --override run.csv_path=runs/j1j2_16x16_d10j.csv \
  --override run.ckpt_dir=runs/j1j2_16x16_d10j_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_16x16_d10j_ckpt/heartbeat
echo "d10j-16x16 rc=$?"

# 3. 12x12 d10j magnon band
timeout 6000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  $D10 --override model.jastrow=true \
  --override 'lattice.shape=[12,12]' --override sampler.n_walkers=256 \
  --override run.therm_sweeps_per_dispatch=10 \
  --ckpt-dir runs/j1j2_12x12_d10j_ckpt --n-samples 4 --sma \
  > runs/j1j2_12x12_sma.json 2> runs/j1j2_12x12_sma.log
echo "sma-12x12 rc=$?"

# 4. tri6x6 jastrow hero: chirality + magnon band
timeout 6000 python -m qmcnn_tpu.measure --config configs/tri6x6_heis.yaml \
  --override model.jastrow=true \
  --ckpt-dir runs/tri6x6_jastrow_ckpt --n-samples 4 --chirality --sma \
  > runs/tri6x6_jastrow_measure.json 2> runs/tri6x6_jastrow_measure.log
echo "tri6x6-measure rc=$?"

# 5. 20x20 depth-10 rung
INIT20=runs/j1j2_16x16_d10j_ckpt
[ -d "$INIT20" ] || INIT20=runs/j1j2_12x12_d10j_ckpt
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D10 --override model.jastrow=true \
  --override 'lattice.shape=[20,20]' \
  --override run.init_from=$INIT20 \
  --override sampler.n_walkers=256 --override optimizer.lr=0.008 \
  --override run.n_steps=250 --override run.steps_per_dispatch=1 \
  --override run.therm_sweeps_per_dispatch=5 \
  --override run.log_every=10 \
  --override run.csv_path=runs/j1j2_20x20_d10j.csv \
  --override run.ckpt_dir=runs/j1j2_20x20_d10j_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_20x20_d10j_ckpt/heartbeat
echo "d10j-20x20 rc=$?"

echo "pipeline32 done"
