#!/bin/bash
set -x
cd /root/repo
while kill -0 $(cat /tmp/p13.pid) 2>/dev/null; do sleep 60; done
NOW=$(date +%s); CUTOFF=$(date -d '2026-08-19 06:30' +%s)
[ "$NOW" -lt "$CUTOFF" ] || { echo "p14 skipped: past cutoff"; exit 0; }
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 3600"
# quench retry with MC-mode regularization: the first leg moved real
# physics (sx 0.88 -> 0.41) but the shift-1e-4 minSR solve blew up at
# t~0.5 (solver_residual 14 -> NaN); 10x shift + half dt
timeout 5000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
  --override model.complex_params=true --override 'model.channels=[8,8]' \
  --override sampler.n_walkers=1024 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3_ckpt --dt 0.0025 --steps 240 \
  --diag-shift 0.001 --sampling mc --csv runs/tvmc_tfim8x8_quench3.csv \
  > runs/tvmc_tfim8x8_quench3.out 2>&1
echo "tvmc3 rc=$?"
NOW=$(date +%s); [ "$NOW" -lt "$CUTOFF" ] || { echo "vit skipped: past cutoff"; exit 0; }
timeout 5500 $SUP --config configs/j1j2_4x4_vit.yaml \
  --override run.init_from=runs/j1j2_4x4_vit_ckpt \
  --override optimizer.lr=0.004 --override run.n_steps=2500 \
  --override run.csv_path=runs/j1j2_4x4_vit2.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_vit2_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_4x4_vit2_ckpt/heartbeat
echo "vit2 rc=$?"
