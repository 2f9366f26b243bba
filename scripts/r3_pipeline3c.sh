#!/bin/bash
# Round-3 pipeline 3c — d4 pre-quench, third recipe: the SPRING run was
# healthy (-3.10/site, accept 0.75 at step 80) then NaN'd at step 85 —
# a late-divergence class, not a bad-init class. Changes: lr 0.01,
# shift 0.005 (stiffer metric), ckpt_every=50 so nan_policy=rollback has
# a restore point (the r2-validated recovery path), 800 steps.
set -x
cd /root/repo
while kill -0 $(cat /tmp/r3p3c.wait) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 900 --startup-timeout 3000 --max-restarts 1 --device-wait 7200"
SPRING="--override sr.enabled=true --override sr.solver=minsr --override sr.momentum=0.9 --override sr.diag_shift0=0.005 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.005"
DEEP="--override model.complex_params=true --override model.channels=[16,16,16,16] \
  --override model.kernel_size=3 --override model.residual=true \
  --override model.activation=selu --override model.init_mode=fan_in \
  --override model.param_scale=1.0"

timeout 5000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 $DEEP $SPRING \
  --override optimizer.lr=0.01 \
  --override sampler.n_walkers=2048 --override run.n_steps=800 \
  --override run.steps_per_dispatch=10 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3d4c_ckpt --override run.ckpt_every=50 \
  --override run.csv_path=runs/tfim8x8_h3d4c.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3d4c_ckpt/heartbeat
echo "prequench-d4c rc=$?"

timeout 7000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 $DEEP \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3d4c_ckpt --dt 0.0025 --steps 280 \
  --diag-shift 0.001 --sampling mc --csv runs/tvmc_tfim8x8_quench_d4c.csv \
  > runs/tvmc_tfim8x8_quench_d4c.out 2>&1
echo "tvmc-d4c rc=$?"
echo "pipeline3c done"
