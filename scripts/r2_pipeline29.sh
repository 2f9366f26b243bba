#!/bin/bash
# Session pipeline 29 (chained after 28, ahead of the re-queued 23/26):
# the new SMA (Feynman) magnon-dispersion observable on hero states.
#   leg 1: quick 10x10 Heisenberg SR rebuild (the flagship config trains
#          to the -0.67/site plateau in ~2 min; no surviving ckpt after
#          the VM deaths) -> ckpt for leg 2.
#   leg 2: measure --sma on it — the gapless AF: omega soft at (pi,pi)
#          with finite-size gap ~1/L, linear spin-wave rise near q -> 0.
#   leg 3: measure --sma on the 8x8 J1-J2 hero (p15b, J2/J1=0.5): the
#          frustrated regime's magnon band + spin-gap bound.
set -x
cd /root/repo
while kill -0 $(cat /tmp/p28.pid) 2>/dev/null; do sleep 60; done

timeout 4000 python -m qmcnn_tpu.train --config configs/heis10x10_sr.yaml \
  --override run.n_steps=500 --override run.ckpt_every=250 \
  --override run.ckpt_dir=runs/heis10x10_sma_ckpt \
  --override run.csv_path=runs/heis10x10_sma.csv \
  > runs/heis10x10_sma_train.out 2>&1
echo "sma-train rc=$?"

timeout 4000 python -m qmcnn_tpu.measure --config configs/heis10x10_sr.yaml \
  --ckpt-dir runs/heis10x10_sma_ckpt --n-samples 6 --sma \
  > runs/heis10x10_sma.json 2> runs/heis10x10_sma.log
echo "sma-heis10 rc=$?"

timeout 4000 python -m qmcnn_tpu.measure --config configs/j1j2_8x8_gcnn_r2.yaml \
  --ckpt-dir runs/j1j2_8x8_p15b_ckpt --n-samples 6 --sma \
  > runs/j1j2_8x8_sma.json 2> runs/j1j2_8x8_sma.log
echo "sma-j1j2-8x8 rc=$?"

echo "pipeline29 done"
