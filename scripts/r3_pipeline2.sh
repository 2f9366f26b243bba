#!/bin/bash
# Round-3 pipeline 2 — VERDICT r2 item 2: attack the kagome-27 ~3%
# plateau with configuration-level sign expressivity. Three arms on the
# 27-site gate (exact -0.4362779624/site, runs/kagome27_ed.json), all
# SPRING-minSR at the SAME 3000-step M=1024 budget so every comparison
# is matched:
#   arm 0 (control): shipped q0-prior [16,16] recipe at the r3 budget —
#          separates "longer schedule + SPRING" from "new ansatz".
#   arm A (deep amplitude): [16]x6 residual selu/fan_in complex CNN +
#          q0 prior — r2's depth scans were CPU/1200-step; this is the
#          TPU-budget version.
#   arm B (phase net): shipped amplitude + deep real phase trunk
#          (configs/kagome3x3_phasenet.yaml) — the split amp/phase
#          ansatz, the direct answer to the elimination chain.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p1.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.01 --override sr.diag_shift_decay=0.98 --override sr.diag_shift_min=0.001"

# arm 0: budget control
timeout 5000 $SUP --config configs/kagome3x3_heis.yaml \
  $SPRING --override model.phase_bias=sublattice_120 \
  --override optimizer.lr=0.02 \
  --override run.n_steps=3000 \
  --override run.csv_path=runs/kagome3x3_r3_control.csv \
  --override run.ckpt_dir=runs/kagome3x3_r3_control_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/kagome3x3_r3_control_ckpt/heartbeat
echo "kagome arm0 rc=$?"

# arm A: deep residual amplitude
timeout 5000 $SUP --config configs/kagome3x3_heis.yaml \
  $SPRING --override model.phase_bias=sublattice_120 \
  --override model.channels=[16,16,16,16,16,16] \
  --override model.activation=selu --override model.init_mode=fan_in \
  --override model.residual=true --override model.param_scale=1.0 \
  --override optimizer.lr=0.01 \
  --override run.n_steps=3000 \
  --override run.csv_path=runs/kagome3x3_r3_deep.csv \
  --override run.ckpt_dir=runs/kagome3x3_r3_deep_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/kagome3x3_r3_deep_ckpt/heartbeat
echo "kagome armA rc=$?"

# arm B: split amplitude/phase
timeout 5000 $SUP --config configs/kagome3x3_phasenet.yaml \
  --override run.csv_path=runs/kagome3x3_r3_phasenet.csv \
  --override run.ckpt_dir=runs/kagome3x3_r3_phasenet_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/kagome3x3_r3_phasenet_ckpt/heartbeat
echo "kagome armB rc=$?"

echo "pipeline2 done"
