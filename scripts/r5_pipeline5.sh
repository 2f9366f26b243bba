#!/bin/bash
# Round-5 pipeline 5 — re-measure the kagome-27 arm-I Lanczos-step
# diagnostic WITH the new jackknife error bar (VERDICT r4 weak #6: the
# 1.48% row shipped with "moment MC noise unquantified"). f32, M=1024,
# 6 independent snapshots (>=4 enables the delete-one-block jackknife).
set -x
cd /root/repo
timeout 6000 python -m qmcnn_tpu.measure \
  --config configs/kagome3x3_phasenet.yaml \
  --override sampler.n_walkers=1024 \
  --ckpt-dir runs/kagome3x3_r3_phasenet_ext.csv.params.npz \
  --n-samples 6 --sweeps-between 5 --lanczos-step \
  > runs/kagome3x3_r5_lanczos_err.log 2>&1
echo "lanczos err re-measure rc=$?"
echo "r5_pipeline5 done"
