"""Pallas TPU kernels.

K1 (SURVEY.md): :mod:`qmcnn_tpu.kernels.metropolis_pallas` — the fused
VMEM-resident Metropolis sweep.

K2 (fused conv + lncosh + reduce forward) is intentionally NOT built:
SURVEY.md scoped it as "only if XLA fusion proves insufficient", and
measurement says it is sufficient — the direct XLA conv forward runs at
43 us per 1024-walker batch on the 10x10 C=16^3 flagship (~70 TFLOP/s,
near the chip's f32 matmul rate), beating both hand-written matmul
reformulations (circulant 50 us, roll-im2col 97 us). See BASELINE.md.
"""
