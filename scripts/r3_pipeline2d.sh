#!/bin/bash
# Round-3 pipeline 2d — kagome follow-ups after the matched-budget arms:
# the control (SPRING + 3000 steps) landed 2.40%, beating the r2 3.02%
# plateau — part of the "ansatz limit" was optimizer/budget. Two probes:
#   arm D: phase-net ON TOP of the converged control state (warm start;
#          the gate opens over a converged amplitude — the clean test of
#          configuration-level phases where optimization is no longer the
#          binding constraint), 2000 steps lr 0.008.
#   arm E: control extension — 2000 more steps at lr 0.006 + EMA from the
#          control ckpt: where does pure optimization saturate?
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p2d.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.003 --override sr.diag_shift_decay=0.99 --override sr.diag_shift_min=0.001"

# arm D: phase net over the converged control
timeout 5000 $SUP --config configs/kagome3x3_phasenet.yaml \
  $SPRING --override optimizer.lr=0.008 \
  --override run.init_from=runs/kagome3x3_r3_control_ckpt \
  --override run.n_steps=2000 \
  --override run.csv_path=runs/kagome3x3_r3_phasenet_warm.csv \
  --override run.ckpt_dir=runs/kagome3x3_r3_phasenet_warm_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/kagome3x3_r3_phasenet_warm_ckpt/heartbeat
echo "kagome armD rc=$?"

# arm E: control extension + EMA
timeout 5000 $SUP --config configs/kagome3x3_heis.yaml \
  $SPRING --override model.phase_bias=sublattice_120 \
  --override optimizer.lr=0.006 --override optimizer.ema_decay=0.997 \
  --override run.init_from=runs/kagome3x3_r3_control_ckpt \
  --override run.n_steps=2000 \
  --override run.csv_path=runs/kagome3x3_r3_control_ext.csv \
  --override run.ckpt_dir=runs/kagome3x3_r3_control_ext_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/kagome3x3_r3_control_ext_ckpt/heartbeat
echo "kagome armE rc=$?"
echo "pipeline2d done"
