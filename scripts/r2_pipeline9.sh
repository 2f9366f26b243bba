#!/bin/bash
# Round-2 pipeline 9: TPU gates for the phase-prior + D6-TriGCNN work
# (launch AFTER pipeline 8).
# 1. kagome 18-site ED gate with the sublattice_120 prior (the CPU A/B
#    measured 10.5% -> 3.4%; this is the real-hardware confirmation at
#    the full 2000-step budget)
# 2. triangular 6x6 D6-TriGCNN hero (prior on; vs the CNN+prior gate run
#    from pipeline 7)
# 3. chirality + sublattice-SzSz measurement on the trained 6x6 state
# 4. bench sanity
set -x
cd /root/repo

SUP="python -m qmcnn_tpu.supervise --stall-timeout 600 --startup-timeout 3000 --max-restarts 3 --device-wait 7200"

timeout 6000 $SUP --config configs/kagome2x3_heis.yaml \
  --override run.csv_path=runs/kagome2x3_r2.csv \
  --override run.ckpt_dir=runs/kagome2x3_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/kagome2x3_ckpt/heartbeat \
  >> runs/kagome2x3_r2.log 2>&1
echo "kagome rc=$?"

timeout 9000 $SUP --config configs/tri6x6_tgcnn.yaml \
  --override run.csv_path=runs/tri6x6_tgcnn.csv \
  --override run.ckpt_dir=runs/tri6x6_tgcnn_ckpt --override run.ckpt_every=500 \
  --override run.heartbeat_path=runs/tri6x6_tgcnn_ckpt/heartbeat \
  >> runs/tri6x6_tgcnn.log 2>&1
echo "tgcnn rc=$?"

timeout 4000 python -m qmcnn_tpu.measure --config configs/tri6x6_tgcnn.yaml \
  --ckpt-dir runs/tri6x6_tgcnn_ckpt --n-samples 6 --chirality \
  --override sampler.n_walkers=512 \
  > runs/tri6x6_tgcnn_measure.json 2>runs/tri6x6_tgcnn_measure.log
echo "measure-tri rc=$?"

timeout 4000 python bench.py > runs/bench_r2d.json 2>runs/bench_r2d.log
echo "bench rc=$?"
