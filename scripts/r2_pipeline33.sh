#!/bin/bash
# Session pipeline 33 (chained after 32): quench-spectroscopy TPU demos
# for the new analyze --quench-spectrum capability (ops/spectroscopy.py).
#   leg A: chain-12 exact-oracle demo — train the h0=2.0 ground state,
#          real-time full-sum quench to h1=1.2 with --corr-csv, then the
#          host-side check script compares the extracted omega(q) against
#          dense-ED exact propagation (dim-4096 eigh, CPU).
#   leg B: 64-site scale demo — weak quench h 3.0 -> 3.5 (both gapped PM;
#          small parameter motion keeps t-VMC stable well past the strong-
#          quench horizon) from the on-disk h=3.0 [16,16] state, MC
#          sampling M=2048; table-only extraction (no oracle at 8x8 —
#          sigma-z is a string operator in fermion language, so no free-
#          fermion shortcut; correctness is carried by the chain oracle).
set -x
cd /root/repo
while kill -0 $(cat /tmp/p32.pid) 2>/dev/null; do sleep 60; done

# A1. pre-quench ground state: TFIM chain 12, h=2.0, complex
timeout 3000 python -m qmcnn_tpu.train --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[12]' --override hamiltonian.h=2.0 \
  --override model.complex_params=true \
  --override run.n_steps=600 \
  --override run.csv_path=runs/tfim12_h2.csv \
  --override run.ckpt_dir=runs/tfim12_h2_ckpt --override run.ckpt_every=300 \
  > runs/tfim12_h2.log 2>&1
echo "prequench-12 rc=$?"

# A2. real-time full-sum quench h 2.0 -> 1.2 with correlation logging
timeout 4000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[12]' --override hamiltonian.h=1.2 \
  --override model.complex_params=true \
  --mode real --init-from runs/tfim12_h2_ckpt --dt 0.005 --steps 2000 \
  --solver dense --diag-shift 0.0001 --sampling fullsum \
  --csv runs/tvmc_chain12_quench.csv \
  --corr-csv runs/tvmc_chain12_corr.csv \
  > runs/tvmc_chain12_quench.out 2>&1
echo "quench-12 rc=$?"

# A3. extraction + dense-ED oracle (pure host CPU, chip-safe)
timeout 1200 python scripts/quench_spectrum_check.py \
  --corr runs/tvmc_chain12_corr.csv --h0 2.0 --h1 1.2 --exact \
  --json runs/chain12_spectrum.json \
  > runs/chain12_spectrum.txt 2>&1
echo "spectrum-12 rc=$?"

# B1. 8x8 weak quench h 3.0 -> 3.5, MC sampling
timeout 6000 python -m qmcnn_tpu.evolve --config configs/tfim16_sgd.yaml \
  --override 'lattice.shape=[8,8]' --override hamiltonian.h=3.5 \
  --override model.complex_params=true --override 'model.channels=[16,16]' \
  --override model.init_mode=fan_in \
  --override sampler.n_walkers=2048 --override sampler.move=flip \
  --mode real --init-from runs/tfim8x8_h3w2_ckpt --dt 0.0025 --steps 1200 \
  --diag-shift 0.001 --sampling mc \
  --csv runs/tvmc_tfim8x8_weak.csv \
  --corr-csv runs/tvmc_tfim8x8_weak_corr.csv \
  > runs/tvmc_tfim8x8_weak.out 2>&1
echo "weak-quench-8x8 rc=$?"

# B2. 64-site omega(q) table
timeout 600 python scripts/quench_spectrum_check.py \
  --corr runs/tvmc_tfim8x8_weak_corr.csv --shape 8,8 \
  --json runs/tfim8x8_weak_spectrum.json \
  > runs/tfim8x8_weak_spectrum.txt 2>&1
echo "spectrum-8x8 rc=$?"

echo "pipeline33 done"
