#!/bin/bash
# Session pipeline 31 (chained after 30): Jastrow where it pays + the
# depth-10 ladder extension.
#   leg 1: tri6x6 hero + Jastrow (matched shipped recipe/seed, so the
#          delta vs the recorded -0.554283(89) is the factor's doing —
#          the triangular family is where the A/B won: 1.09e-2 -> 9.2e-3
#          on the 6x3 J1-J2 gate, vs null on kagome and neutral on the
#          amplitude-saturated square GCNN heroes).
#   leg 2: 12x12 depth-10 transfer from the 10x10 d10+jastrow state —
#          extends the deeper rung up the size ladder (current 144-site
#          best: -0.495678(43) from depth-8).
set -x
cd /root/repo
while kill -0 $(cat /tmp/p30.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"
D10="--override model.channels=[10,10,10,10,10,10,10,10,10,10]"

# 1. tri6x6 + jastrow hero
timeout 8000 $SUP --config configs/tri6x6_heis.yaml \
  --override model.jastrow=true \
  --override run.csv_path=runs/tri6x6_jastrow.csv \
  --override run.ckpt_dir=runs/tri6x6_jastrow_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/tri6x6_jastrow_ckpt/heartbeat
echo "tri6x6-jastrow rc=$?"

# 2. 12x12 depth-10 (+jastrow) transfer
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D10 --override model.jastrow=true \
  --override 'lattice.shape=[12,12]' \
  --override run.init_from=runs/j1j2_10x10_d10j_ckpt \
  --override sampler.n_walkers=512 --override optimizer.lr=0.01 \
  --override run.n_steps=600 --override run.steps_per_dispatch=2 \
  --override run.therm_sweeps_per_dispatch=10 \
  --override run.csv_path=runs/j1j2_12x12_d10j.csv \
  --override run.ckpt_dir=runs/j1j2_12x12_d10j_ckpt --override run.ckpt_every=200 \
  --override run.heartbeat_path=runs/j1j2_12x12_d10j_ckpt/heartbeat
echo "d10j-12x12 rc=$?"

echo "pipeline31 done"
