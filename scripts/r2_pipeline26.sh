#!/bin/bash
# Session pipeline 26 (chained after 23, the last queued pipeline): the
# scan driver on real physics — TFIM 8x8 swept through the 2D quantum
# critical point (h_c ~ 3.04), 7 warm-started points from deep in the
# paramagnet toward the ordered side. Shapes are identical across points,
# so the XLA compile is paid once; the whole 64-site sweep is minutes of
# chip time. Recipe = the proven pre-quench leg ([8,8] complex CNN).
set -x
cd /root/repo
while kill -0 $(cat /tmp/p23real.pid) 2>/dev/null; do sleep 60; done

timeout 6000 python -m qmcnn_tpu.scan --config configs/tfim16_sgd.yaml \
  --param hamiltonian.h --values 3.5,3.2,3.04,2.9,2.6,2.3,2.0 \
  --steps-per-point 400 --out runs/scan_tfim8x8_h \
  --override 'lattice.shape=[8,8]' --override model.complex_params=true \
  --override 'model.channels=[8,8]' --override sampler.n_walkers=1024 \
  --override run.steps_per_dispatch=25 --override run.validate_against_ed=false \
  > runs/scan_tfim8x8_h.out 2>&1
echo "scan-tfim8x8 rc=$?"

echo "pipeline26 done"
