#!/bin/bash
# Session pipeline 18 (5th round-2 VM): the previous VM died at step ~1450
# of the 8x8 hero phase 1 (ckpt at 1000 survived in runs/j1j2_8x8_p15a_ckpt).
# Resume the chain and run the queued pipeline-16/17 legs in priority order:
# hero 8x8 phases 1-2, honeycomb gate, f32 Lanczos measures, 10x10 rebuild,
# ViT gate extension, bench; depth-10 + quench-capacity legs as stretch.
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
SPRING="--override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001"

# 1. SPRING phase 1 RESUME (same ckpt_dir -> supervisor resumes from 1000)
timeout 6000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override optimizer.lr=0.025 \
  --override run.csv_path=runs/j1j2_8x8_p15a.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_p15a_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/j1j2_8x8_p15a_ckpt/heartbeat
echo "p1 rc=$?"

# 2. phase 2 refine: warm-start at 2x walkers, low-noise tail
timeout 8000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override run.init_from=runs/j1j2_8x8_p15a_ckpt \
  --override sampler.n_walkers=2048 --override optimizer.lr=0.006 \
  --override run.n_steps=1000 --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_p15b.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_p15b_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_8x8_p15b_ckpt/heartbeat
echo "p2 rc=$?"

# 3. honeycomb 18-site ED gate (last un-gated geometry; sign-free)
timeout 4000 $SUP --config configs/honeycomb3x3_heis.yaml \
  --override run.csv_path=runs/honeycomb3x3.csv \
  --override run.ckpt_dir=runs/honeycomb3x3_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/honeycomb3x3_ckpt/heartbeat
echo "honeycomb rc=$?"

# 4. f32 Lanczos-step measure on the refined 8x8 state
timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_p15b_ckpt --n-samples 6 --lanczos-step \
  --override sampler.n_walkers=2048 \
  > runs/j1j2_8x8_p15_measure_f32.json 2> runs/j1j2_8x8_p15_measure_f32.log
echo "measure8-f32 rc=$?"

# 5. 10x10 hero rebuild: depth-8 SPRING warm-started from the 8x8 phase-2
#    refined state (the r2 recipe that set -0.496263(53))
timeout 9000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override 'lattice.shape=[10,10]' \
  --override run.init_from=runs/j1j2_8x8_p15b_ckpt \
  --override optimizer.lr=0.02 --override run.n_steps=1500 \
  --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_10x10_p17.csv \
  --override run.ckpt_dir=runs/j1j2_10x10_p17_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_10x10_p17_ckpt/heartbeat
echo "hero10 rc=$?"

# 6. f32 Lanczos measure on the 10x10 state
timeout 5000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --override 'lattice.shape=[10,10]' --ckpt-dir runs/j1j2_10x10_p17_ckpt \
  --n-samples 3 --lanczos-step --override sampler.n_walkers=1024 \
  > runs/j1j2_10x10_p17_measure_f32.json 2> runs/j1j2_10x10_p17_measure_f32.log
echo "measure10-f32 rc=$?"

# 7. ViT 4x4 ED-gate extension: from scratch, 2.7x the original step budget
timeout 6000 $SUP --config configs/j1j2_4x4_vit.yaml \
  --override run.n_steps=4000 \
  --override run.csv_path=runs/j1j2_4x4_vit2.csv \
  --override run.ckpt_dir=runs/j1j2_4x4_vit2_ckpt --override run.ckpt_every=1000 \
  --override run.heartbeat_path=runs/j1j2_4x4_vit2_ckpt/heartbeat
echo "vit2 rc=$?"

timeout 4000 python bench.py
echo "bench rc=$?"

# --- stretch legs ---

# 8. depth-10 rung, warm-started from the refined depth-8 state
timeout 9000 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING --override 'model.channels=[10,10,10,10,10,10,10,10,10,10]' \
  --override run.init_from=runs/j1j2_8x8_p15b_ckpt \
  --override optimizer.lr=0.012 --override run.n_steps=1500 \
  --override run.steps_per_dispatch=5 \
  --override run.csv_path=runs/j1j2_8x8_d10.csv \
  --override run.ckpt_dir=runs/j1j2_8x8_d10_ckpt --override run.ckpt_every=250 \
  --override run.heartbeat_path=runs/j1j2_8x8_d10_ckpt/heartbeat
echo "d10 rc=$?"

# 9. quench capacity scaling: same protocol as quench3 but [16,16] channels
#    + 2x walkers — does the valid window extend past t~0.3?
timeout 4000 $SUP --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.0 \
  --override model.complex_params=true --override 'model.channels=[16,16]' \
  --override sampler.n_walkers=2048 --override run.n_steps=600 \
  --override run.steps_per_dispatch=25 --override run.validate_against_ed=false \
  --override run.ckpt_dir=runs/tfim8x8_h3w_ckpt --override run.ckpt_every=300 \
  --override run.csv_path=runs/tfim8x8_h3w.csv \
  --override run.heartbeat_path=runs/tfim8x8_h3w_ckpt/heartbeat
echo "prequench-w rc=$?"
timeout 6000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=1.5 \
  --override model.complex_params=true --override 'model.channels=[16,16]' \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3w_ckpt --dt 0.0025 --steps 240 \
  --diag-shift 0.001 --sampling mc --csv runs/tvmc_tfim8x8_quench4.csv \
  > runs/tvmc_tfim8x8_quench4.out 2>&1
echo "tvmc4 rc=$?"

echo "pipeline18 done"
