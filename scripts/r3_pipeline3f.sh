#!/bin/bash
# Round-3 pipeline 3f — the depth A/B quench, properly regularized.
# CPU-verified: shift 1e-2 cures the step-1 stage-2 NaN (the deep
# residual net's minSR theta_dot at shift 1e-3 is violent enough that
# Heun's predictor leaves the manifold). Run BOTH arms at shift 1e-2 so
# the A/B is regularization-matched: depth-4 (from the d4c ckpt) and the
# [16,16] width arm (from the surviving h3w2 ckpt if present, else
# retrain quickly).
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p3f.wait) 2>/dev/null; do sleep 60; done

# arm 1: depth-4 quench at shift 1e-2
timeout 7000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
  --override model.complex_params=true --override model.channels=[16,16,16,16] \
  --override model.kernel_size=3 --override model.residual=true \
  --override model.activation=selu --override model.init_mode=fan_in \
  --override model.param_scale=1.0 \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3d4c_ckpt --dt 0.0025 --steps 280 \
  --diag-shift 0.01 --sampling mc --csv runs/tvmc_tfim8x8_quench_d4f.csv \
  > runs/tvmc_tfim8x8_quench_d4f.out 2>&1
echo "tvmc-d4f rc=$?"

# arm 2: width [16,16] quench at the SAME shift 1e-2 (matched reg)
if [ -d runs/tfim8x8_h3w2_ckpt ]; then
  timeout 7000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
    --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
    --override model.complex_params=true --override 'model.channels=[16,16]' \
    --override model.init_mode=fan_in \
    --override sampler.n_walkers=2048 --override sampler.move=flip \
    --mode real --init-from runs/tfim8x8_h3w2_ckpt --dt 0.0025 --steps 280 \
    --diag-shift 0.01 --sampling mc --csv runs/tvmc_tfim8x8_quench_w2f.csv \
    > runs/tvmc_tfim8x8_quench_w2f.out 2>&1
  echo "tvmc-w2f rc=$?"
else
  echo "tvmc-w2f skipped (no h3w2 ckpt on this VM)"
fi
echo "pipeline3f done"
