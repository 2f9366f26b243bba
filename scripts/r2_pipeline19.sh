#!/bin/bash
# Session pipeline 19 (chained after 18): EMA polish A/B on the 8x8 hero
# (the new optimizer.ema_decay feature on real physics — one run yields
# BOTH the last-iterate and the Polyak-averaged state), the honeycomb 6x6
# hero (72 sites, first 2-site-basis hero), and a 12x12 refresh warm from
# the new 10x10 state.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p18.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"

# 1. 8x8 hero EMA polish: warm from the phase-2 refined state, M=2048,
#    low lr, ema_decay 0.997 (~330-step averaging window over a converged
#    tail)
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override run.init_from=runs/j1j2_8x8_p15b_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.004 \
  --override optimizer.ema_decay=0.997 \
  --override run.n_steps=1000 --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_ema.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_ema_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_8x8_ema_ckpt/heartbeat
echo "ema-polish rc=$?"

# 2a. measure the LAST ITERATE (control arm)
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override optimizer.ema_decay=0.997 --override sampler.n_walkers=2048 \
  --ckpt-dir runs/j1j2_8x8_ema_ckpt --n-samples 6 \
  > runs/j1j2_8x8_ema_last.json 2> runs/j1j2_8x8_ema_last.log
echo "measure-last rc=$?"

# 2b. measure the EMA average (treatment arm; same sampling budget)
timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override optimizer.ema_decay=0.997 --override sampler.n_walkers=2048 \
  --ckpt-dir runs/j1j2_8x8_ema_ckpt --n-samples 6 --ema \
  > runs/j1j2_8x8_ema_avg.json 2> runs/j1j2_8x8_ema_avg.log
echo "measure-ema rc=$?"

# 3. honeycomb 6x6 hero (72 sites, sign-free, CNN over the cell grid with
#    basis channels; literature anchor E/site ~ -0.5445)
timeout 7000 $SUP --config configs/honeycomb6x6_heis.yaml \
  --override run.csv_path=runs/honeycomb6x6.csv \
  --override run.ckpt_dir=runs/honeycomb6x6_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/honeycomb6x6_ckpt/heartbeat
echo "honeycomb6x6 rc=$?"

# 4. 12x12 J1-J2 refresh, warm-started from the NEW 10x10 state (r1 row
#    used the weaker 10x10; same 600-step M=512 recipe)
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override 'lattice.shape=[12,12]' \
  --override run.init_from=runs/j1j2_10x10_p17_ckpt \
  --override sampler.n_walkers=512 --override optimizer.lr=0.015 \
  --override run.n_steps=600 --override run.steps_per_dispatch=2 \
  --override run.csv_path=runs/j1j2_12x12_p19.csv \
  --override run.ckpt_dir=runs/j1j2_12x12_p19_ckpt --override run.ckpt_every=200 \
  --override run.heartbeat_path=runs/j1j2_12x12_p19_ckpt/heartbeat
echo "hero12 rc=$?"

echo "pipeline19 done"
