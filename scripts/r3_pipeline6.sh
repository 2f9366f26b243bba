#!/bin/bash
# Round-3 pipeline 6 — depth-12 rung, plan B. Both r3 attempts (lr 0.01
# flat-shift and lr 0.008 warmup+annealed-shift) NaN'd in the first
# dispatch even at warmup-lr ~3e-4, while the warm-started state's
# forward and E_loc are FINITE on CPU at f32 AND bf16 (probe) — the
# difference from the d8->d10 rung that worked is the source (d10+jastrow
# refine) and the active jastrow. Plan B replicates the winning d10
# recipe shape exactly, one depth deeper: BARE model (no jastrow), warm
# from the bare d10 phase-1 snapshot, SPRING lr 0.012, 1500 steps.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p6.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"
D12="--override model.channels=[10,10,10,10,10,10,10,10,10,10,10,10]"

timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D12 \
  --override run.init_from=runs/j1j2_8x8_d10_params.npz \
  --override optimizer.lr=0.012 \
  --override run.n_steps=1500 --override run.steps_per_dispatch=4 \
  --override run.csv_path=runs/j1j2_8x8_d12_bare.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d12_bare_ckpt --override run.ckpt_every=300 \
  --override run.heartbeat_path=runs/j1j2_8x8_d12_bare_ckpt/heartbeat
echo "d12-bare rc=$?"
echo "pipeline6 done"
