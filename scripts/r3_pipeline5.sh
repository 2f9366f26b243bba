#!/bin/bash
# Round-3 pipeline 5 — VERDICT r2 item 9 (stretch): the 24x24 = 576-site
# J1-J2 probe, the largest frustrated system the framework has produced.
# Warm from the committed 20x20 depth-8 snapshot (the size-transfer
# machinery's capstone; auto-chunker sizes the E_loc/Jacobian passes).
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p4.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1200 --startup-timeout 3600 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"

timeout 8000 $SUP --config configs/j1j2_16x16_gcnn_deep.yaml \
  $SPRING --override 'lattice.shape=[24,24]' --override model.channels=[10,10,10,10,10,10,10,10] --override model.residual=true --override model.compute_dtype=bfloat16 \
  --override run.init_from=runs/j1j2_20x20_p27_params.npz \
  --override sampler.n_walkers=256 --override optimizer.lr=0.006 \
  --override run.n_steps=200 --override run.steps_per_dispatch=1 \
  --override run.therm_sweeps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_24x24_probe.csv \
  --override run.ckpt_dir=runs/j1j2_24x24_probe_ckpt --override run.ckpt_every=100 \
  --override run.heartbeat_path=runs/j1j2_24x24_probe_ckpt/heartbeat
echo "24x24 rc=$?"

# final hardened bench reading for the round record
timeout 3600 python bench.py > runs/bench_r3.json 2> runs/bench_r3.log
echo "bench rc=$?"
echo "pipeline5 done"
