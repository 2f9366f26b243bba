#!/bin/bash
# Round-5 pipeline 2 — the Lanczos-improved VARIATIONAL kagome ansatz the
# r4 arm-I diagnostic pointed at (VERDICT item 3): phi = (1 + alpha H) psi
# with TRAINABLE alpha (model.lanczos_alpha, ops/lanczos.lanczos_wrap),
# warm-started from the r3 amp/phase state whose frozen-theta diagnostic
# read 1.48% at alpha*=0.146. Training E_loc costs K^2 = 54^2 base
# forwards/sample, so M=256. Phase A probes the step rate (20 steps);
# phase B sizes n_steps to a ~75-min budget from the probe.
# Exact reference: -0.4362779624/site; target: direct-measured <= 1.5%.
set -x
cd /root/repo
SUP="python -m qmcnn_tpu.supervise --stall-timeout 1800 --startup-timeout 3600 --max-restarts 2 --device-wait 14400"
COMMON="--config configs/kagome3x3_phasenet.yaml \
  --override model.lanczos_alpha=0.146 \
  --override sampler.n_walkers=256 \
  --override optimizer.lr=0.005 --override optimizer.schedule=cosine \
  --override optimizer.lr_min_ratio=0.1 --override optimizer.ema_decay=0.998 \
  --override run.init_from=runs/kagome3x3_r3_phasenet_ext.csv.params.npz \
  --override run.validate_against_ed=false --override run.save_settle_s=2"

# phase A: 20-step probe (also pays the one-time compile)
timeout 4000 python -m qmcnn_tpu.train $COMMON \
  --override run.n_steps=20 --override run.steps_per_dispatch=1 \
  --override run.log_every=5 --override sampler.n_therm_sweeps=50 \
  --override run.csv_path=runs/kagome3x3_r5_lanczos_probe.csv
echo "lanczos probe rc=$?"

# phase B: budget-sized main run (tail of the probe csv -> s/step)
NSTEPS=$(python - <<'PYEOF'
import csv
rows = list(csv.DictReader(open("runs/kagome3x3_r5_lanczos_probe.csv")))
sps = float(rows[-1]["sweeps_per_sec"])  # walker-sweeps/s through the step
t_step = 256.0 / max(sps, 1e-9)
n = int(4500 / t_step)
print(max(200, min(1200, n)))
PYEOF
)
echo "sized main run: $NSTEPS steps"
timeout 8000 $SUP $COMMON \
  --override run.n_steps=$NSTEPS --override run.steps_per_dispatch=2 \
  --override run.log_every=10 --override sampler.n_therm_sweeps=100 \
  --override run.ckpt_every=300 \
  --override run.csv_path=runs/kagome3x3_r5_lanczos.csv \
  --override run.ckpt_dir=runs/kagome3x3_r5_lanczos_ckpt \
  --override run.heartbeat_path=runs/kagome3x3_r5_lanczos_ckpt/heartbeat
echo "lanczos main rc=$?"
echo "r5_pipeline2 done"
