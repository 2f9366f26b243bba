#!/bin/bash
# Round-4 pipeline 2 — the hero-MFU attack (VERDICT r3 item 2).
# r3 finding: GCNN hero full-step MFU 3.2% because the step is
# sweep/solve-dominated, not conv-bound. The two cheapest levers, tested
# at matched physics off the SAME converged depth-10 warm start:
#   (a) sweep-length reduction justified by measured autocorrelation
#       (tau_int of the per-step energy; scripts/tau_int.py)
#   (b) [the phase profile decides if a further lever is worth building]
# Legs: phase profile -> tau_int run (log_every=1) -> sweep_size A/B
# (64 control / 16 / 8) at matched steps.
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1200 --startup-timeout 3000 --max-restarts 1 --device-wait 10800"
SPRING="--override sr.solver=minsr --override sr.momentum=0.9 --override sr.diag_shift0=0.001 --override sr.diag_shift_decay=1.0 --override sr.diag_shift_min=0.001 --override sr.proportional_shift=true"
D10="--override model.channels=[10,10,10,10,10,10,10,10,10,10]"
WARM="--override run.init_from=runs/j1j2_8x8_d10_params.npz"

# leg 1: phase-split timing + MFU of the shipped hero
timeout 3600 python scripts/gcnn_perf.py configs/j1j2_8x8_gcnn_r2.yaml \
  --mfu --steps 5 | tee runs/r4_gcnn_phase_profile.txt
echo "leg1 profile rc=$?"

# leg 2: per-step series for tau_int (400 steps, log_every=1)
timeout 3600 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
  $SPRING $D10 $WARM \
  --override optimizer.lr=0.004 --override optimizer.schedule=constant \
  --override run.n_steps=400 --override run.steps_per_dispatch=10 \
  --override run.log_every=1 \
  --override run.csv_path=runs/r4_tau_sweep64.csv \
  --override run.ckpt_dir=null
echo "leg2 tau rc=$?"
python scripts/tau_int.py runs/r4_tau_sweep64.csv --skip 50 \
  | tee runs/r4_tau_sweep64.txt

# leg 3: sweep_size A/B at matched steps (600 each)
for SS in 64 16 8; do
  timeout 4500 $SUP --config configs/j1j2_8x8_gcnn_r2.yaml \
    $SPRING $D10 $WARM \
    --override sampler.sweep_size=$SS \
    --override optimizer.lr=0.004 --override optimizer.schedule=cosine \
    --override run.n_steps=600 --override run.steps_per_dispatch=10 \
    --override run.log_every=1 \
    --override run.csv_path=runs/r4_ss${SS}.csv \
    --override run.ckpt_dir=null
  echo "leg3 ss=$SS rc=$?"
  python scripts/tau_int.py runs/r4_ss${SS}.csv --skip 100 \
    | tee runs/r4_ss${SS}_tau.txt
done
echo "r4_pipeline2 done"
