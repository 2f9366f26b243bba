#!/bin/bash
set -x
cd /root/repo
while kill -0 $(cat /tmp/p11.pid) 2>/dev/null; do sleep 60; done
SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 2 --device-wait 7200"
# tri6x6 D6-GCNN hero rerun (3rd attempt: E_loc chunk 256 + jacobian
# chunk 512 from the fixed estimator; pipeline-10's retry predated the
# jacobian fix)
timeout 8000 $SUP --config configs/tri6x6_tgcnn.yaml \
  --override run.csv_path=runs/tri6x6_tgcnn.csv \
  --override run.ckpt_dir=runs/tri6x6_tgcnn_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/tri6x6_tgcnn_ckpt/heartbeat
echo "tgcnn rc=$?"
timeout 3000 python -m qmcnn_tpu.measure --config configs/tri6x6_tgcnn.yaml \
  --ckpt-dir runs/tri6x6_tgcnn_ckpt --n-samples 6 --chirality \
  --override sampler.n_walkers=512 > runs/tri6x6_tgcnn_measure.json 2> runs/tri6x6_tgcnn_measure.log
echo "measure-tri rc=$?"
# kagome 27-site physics A/B: sqrt3 prior vs q=0 prior (1200 steps each —
# the 18-site A/B separated the priors by step 300)
timeout 6500 $SUP --config configs/kagome3x3_heis.yaml \
  --override run.n_steps=1200 \
  --override run.csv_path=runs/kagome3x3_sqrt3.csv \
  --override run.ckpt_dir=runs/kagome3x3_sqrt3_ckpt --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/kagome3x3_sqrt3_ckpt/heartbeat
echo "kagome-sqrt3 rc=$?"
timeout 6500 $SUP --config configs/kagome3x3_heis.yaml \
  --override model.phase_bias=sublattice_120 \
  --override run.n_steps=1200 \
  --override run.csv_path=runs/kagome3x3_q0.csv \
  --override run.ckpt_dir=runs/kagome3x3_q0_ckpt --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/kagome3x3_q0_ckpt/heartbeat
echo "kagome-q0 rc=$?"
# triangular J1-J2 spin-liquid-point ED gate (18 sites, 1200 steps)
timeout 5000 $SUP --config configs/tri6x3_j1j2.yaml \
  --override run.csv_path=runs/tri6x3_j1j2.csv \
  --override run.ckpt_dir=runs/tri6x3_j1j2_ckpt --override run.ckpt_every=400 \
  --override run.heartbeat_path=runs/tri6x3_j1j2_ckpt/heartbeat
echo "tri-j1j2 rc=$?"
