#!/bin/bash
# Session pipeline 37 (ninth session, fresh VM): the queued p33/p34/p35
# legs that are self-contained (no dead checkpoints), condensed and
# ordered by value-per-minute for a ~1h session:
#   1. bf16 CNN bench-rate A/B          (p34 leg 2)
#   2. bf16 CNN phase-split timing A/B  (p34 leg 1)
#   3. bf16 CNN energy-bias A/B         (p34 leg 3, 400 matched-seed SR steps)
#   4. tri6x3 J1-J2 gate + pair phases  (p35 leg 1)
#   5. chain-12 quench spectroscopy w/ dense-ED oracle (p33 leg A)
#   6. kagome 27-site q0 + pair phases  (p35 leg 2, only if time remains)
# p36's depth-12 rung is NOT runnable: it warm-starts from
# runs/j1j2_8x8_d10j_ckpt which died with the eighth-session VM
# (checkpoints are gitignored); rebuilding the d10j chain is >>1h.
set -x
cd /root/repo

# 1. bench sweep-rate A/B
timeout 1200 python bench.py --no-baseline \
  > runs/bench_ab_f32.json 2> runs/bench_ab_f32.log
echo "bench-f32 rc=$?"
timeout 1200 python bench.py --no-baseline --compute-dtype bfloat16 \
  > runs/bench_ab_bf16.json 2> runs/bench_ab_bf16.log
echo "bench-bf16 rc=$?"

# 2. phase-split timing A/B on the flagship CNN
timeout 1800 python scripts/gcnn_perf.py configs/heis10x10_sr.yaml \
  > runs/cnn_perf_f32.txt 2>&1
echo "perf-f32 rc=$?"
timeout 1800 python scripts/gcnn_perf.py configs/heis10x10_sr.yaml \
  --override model.compute_dtype=bfloat16 \
  > runs/cnn_perf_bf16.txt 2>&1
echo "perf-bf16 rc=$?"

# 3. energy-bias A/B (matched seeds, 400 SR steps on the flagship)
for DT in float32 bfloat16; do
  timeout 2400 python -m qmcnn_tpu.train --config configs/heis10x10_sr.yaml \
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

# 4. triangular spin-liquid-point gate + pair phases (prior ON -> off-saddle)
timeout 2400 python -m qmcnn_tpu.train --config configs/tri6x3_j1j2.yaml \
  --override model.jastrow=true --override model.jastrow_phase=true \
  --override run.csv_path=runs/tri6x3_j1j2_jphase.csv \
  --override run.ckpt_dir=runs/tri6x3_j1j2_jphase_ckpt \
  --override run.ckpt_every=400 \
  > runs/tri6x3_j1j2_jphase.log 2>&1
echo "tri-jphase rc=$?"

# 5. chain-12 quench spectroscopy with the dense-ED oracle (p33 leg A)
timeout 1500 python -m qmcnn_tpu.train --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[12]' --override hamiltonian.h=2.0 \
  --override model.complex_params=true \
  --override run.n_steps=600 \
  --override run.csv_path=runs/tfim12_h2.csv \
  --override run.ckpt_dir=runs/tfim12_h2_ckpt --override run.ckpt_every=300 \
  > runs/tfim12_h2.log 2>&1
echo "prequench-12 rc=$?"
timeout 2400 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[12]' --override hamiltonian.h=1.2 \
  --override model.complex_params=true \
  --mode real --init-from runs/tfim12_h2_ckpt --dt 0.005 --steps 2000 \
  --solver dense --diag-shift 0.0001 --sampling fullsum \
  --csv runs/tvmc_chain12_quench.csv \
  --corr-csv runs/tvmc_chain12_corr.csv \
  > runs/tvmc_chain12_quench.out 2>&1
echo "quench-12 rc=$?"
timeout 1200 python scripts/quench_spectrum_check.py \
  --corr runs/tvmc_chain12_corr.csv --h0 2.0 --h1 1.2 --exact \
  --json runs/chain12_spectrum.json \
  > runs/chain12_spectrum.txt 2>&1
echo "spectrum-12 rc=$?"

# 6. kagome 27-site q0 gate + pair phases (if the session still lives)
timeout 4800 python -m qmcnn_tpu.train --config configs/kagome3x3_heis.yaml \
  --override model.phase_bias=sublattice_120 \
  --override model.jastrow=true --override model.jastrow_phase=true \
  --override run.csv_path=runs/kagome3x3_q0_jphase.csv \
  --override run.ckpt_dir=runs/kagome3x3_q0_jphase_ckpt \
  --override run.ckpt_every=400 \
  > runs/kagome3x3_q0_jphase.log 2>&1
echo "kagome-jphase rc=$?"

echo "pipeline37 done"
