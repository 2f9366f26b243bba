#!/bin/bash
# Round-4 pipeline 3 — kagome-27 structural rung + verdict (VERDICT r3
# item 4). The r3 elimination program left ONE structure that beats pure
# optimization: the split amp/phase net (arm D/F, 2.25-2.26% vs 2.31%).
# This pipeline scales the PHASE TRUNK ONLY — the knob the split ansatz
# was built to expose — at matched amplitude net and recipe:
#   arm H: trunk [24]x6 (~5x the arm-D trunk params), warm from the
#          SATURATED amplitude state (control-ext), arm-D protocol
#   arm I: Lanczos-step diagnostic on the arm-F 2.25% state: how much of
#          the residual gap is variational vs estimator (the r2-scoped
#          "diagnostic for under-converged states" — kagome at 2.25% is
#          exactly that)
# Exact reference: -0.4362779624/site (27-site sector Lanczos, r2).
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1200 --startup-timeout 3000 --max-restarts 1 --device-wait 14400"

# arm H: big-trunk phase net over the converged amplitude state
timeout 10000 $SUP --config configs/kagome3x3_phasenet.yaml \
  --override "model.phase_net_channels=[24,24,24,24,24,24]" \
  --override run.init_from=runs/kagome3x3_r3_control_ext.csv.params.npz \
  --override optimizer.lr=0.008 --override optimizer.schedule=cosine \
  --override optimizer.ema_decay=0.998 \
  --override run.n_steps=3000 --override run.steps_per_dispatch=10 \
  --override run.csv_path=runs/kagome3x3_r4_bigtrunk.csv \
  --override run.ckpt_dir=runs/kagome3x3_r4_bigtrunk_ckpt \
  --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/kagome3x3_r4_bigtrunk_ckpt/heartbeat
echo "armH bigtrunk rc=$?"

# arm I: Lanczos-step diagnostic of the r3 best state (f32 as required)
timeout 4000 python -m qmcnn_tpu.measure \
  --config configs/kagome3x3_phasenet.yaml \
  --ckpt-dir runs/kagome3x3_r3_phasenet_ext_ckpt \
  --lanczos-step --n-samples 4 \
  --override sampler.n_walkers=1024 \
  --override model.compute_dtype=float32 \
  > runs/kagome3x3_r3_lanczos_diag.json 2> runs/kagome3x3_r3_lanczos_diag.log
echo "armI lanczos rc=$?"
echo "r4_pipeline3 done"
