#!/bin/bash
# Round-5 pipeline 7 — kagome-27 Lanczos-ansatz REFINEMENT: the 1.19%
# direct result (r5_pipeline2, M=256) warm-continued at 4x walkers with
# a low-lr cosine + EMA polish. The pipeline-2 run annealed to lr_min at
# M=256; the refine tests how much of the remaining gap is walker-budget
# noise vs ansatz structure.
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1200 --startup-timeout 3600 --max-restarts 2 --device-wait 14400"
timeout 5000 $SUP --config configs/kagome3x3_phasenet.yaml \
  --override model.lanczos_alpha=0.146 \
  --override sampler.n_walkers=1024 \
  --override optimizer.lr=0.003 --override optimizer.schedule=cosine \
  --override optimizer.lr_min_ratio=0.1 --override optimizer.ema_decay=0.998 \
  --override run.init_from=runs/kagome3x3_r5_lanczos.csv.params.npz \
  --override run.validate_against_ed=false --override run.save_settle_s=2 \
  --override run.n_steps=1500 --override run.steps_per_dispatch=4 \
  --override run.log_every=25 --override sampler.n_therm_sweeps=100 \
  --override run.ckpt_every=500 \
  --override run.csv_path=runs/kagome3x3_r5_lanczos_refine.csv \
  --override run.ckpt_dir=runs/kagome3x3_r5_lanczos_refine_ckpt \
  --override run.heartbeat_path=runs/kagome3x3_r5_lanczos_refine_ckpt/heartbeat
echo "lanczos refine rc=$?"
echo "r5_pipeline7 done"
