#!/bin/bash
# Session pipeline 34 (chained after 33): end-to-end bf16 CNN A/B on the
# real chip. The r1 A/B tried per-layer cast-backs (no speedup: the conv
# is HBM-bound at VMC shapes and the f32 round trips restore the
# traffic); the GCNN later measured +19% full-step from the END-TO-END
# form with no energy bias. models/cnn.py now implements end-to-end bf16
# (f32 activation math fused into the elementwise kernel — the pure-bf16
# lncosh cancellation bias is tested away in tests/test_ansatz.py).
#   leg 1: phase-split step timing, flagship heis10x10_sr, f32 vs bf16
#   leg 2: bench sweep-rate A/B (exchange sampler forward)
#   leg 3: energy-bias A/B — 400 matched-seed SR steps each way
set -x
cd /root/repo
while kill -0 $(cat /tmp/p33.pid) 2>/dev/null; do sleep 60; done

# 1. phase-split timing A/B
timeout 3000 python scripts/gcnn_perf.py configs/heis10x10_sr.yaml \
  > runs/cnn_perf_f32.txt 2>&1
echo "perf-f32 rc=$?"
timeout 3000 python scripts/gcnn_perf.py configs/heis10x10_sr.yaml \
  --override model.compute_dtype=bfloat16 \
  > runs/cnn_perf_bf16.txt 2>&1
echo "perf-bf16 rc=$?"

# 2. bench sweep-rate A/B
timeout 3000 python bench.py --no-baseline \
  > runs/bench_ab_f32.json 2> runs/bench_ab_f32.log
echo "bench-f32 rc=$?"
timeout 3000 python bench.py --no-baseline --compute-dtype bfloat16 \
  > runs/bench_ab_bf16.json 2> runs/bench_ab_bf16.log
echo "bench-bf16 rc=$?"

# 3. energy-bias A/B (matched seeds, 400 SR steps on the flagship)
for DT in float32 bfloat16; do
  timeout 4000 python -m qmcnn_tpu.train --config configs/heis10x10_sr.yaml \
    --override model.compute_dtype=$DT \
    --override run.n_steps=400 --override run.validate_against_ed=false \
    --override run.csv_path=runs/ab_cnn_$DT.csv \
    --override run.ckpt_dir=runs/ab_cnn_${DT}_ckpt \
    > runs/ab_cnn_$DT.log 2>&1
  echo "ab-$DT rc=$?"
done
python -m qmcnn_tpu.analyze runs/ab_cnn_float32.csv runs/ab_cnn_bfloat16.csv \
  --tail 0.5 --n-sites 100 > runs/ab_cnn_compare.txt 2>&1
echo "ab-compare rc=$?"

echo "pipeline34 done"
