"""Pallas TPU kernels.

K1 (SURVEY.md): :mod:`qmcnn_tpu.kernels.metropolis_pallas` — the fused
VMEM-resident Metropolis sweep.

K2 (fused conv + lncosh + reduce forward) is intentionally NOT built:
SURVEY.md scoped it as "only if XLA fusion proves insufficient", and
measurement says it is sufficient — the direct XLA conv forward runs at
43 us per 1024-walker batch on the 10x10 C=16^3 flagship (~70 TFLOP/s,
near the chip's f32 matmul rate), beating both hand-written matmul
reformulations (circulant 50 us, roll-im2col 97 us). See BASELINE.md.

Why the fused sweep kernel keeps the circulant forward instead of a
lower-FLOP "row-circulant" form (analysis, so nobody re-derives it):
the circulant matmul costs N/K^2 = 11x the direct conv's FLOPs at 10x10
k=3. A row-layout forward ([BLK*H, W*C] activations, 3 row-tap matmuls
[BLK*H, W*Cin] @ [W*Cin, W*Cout] per layer) cuts that to H/K_h = 3.3x —
but at flagship channel counts W*C = 160, which Mosaic pads to 256 lanes,
so the realized MXU efficiency is 160/256 = 62.5% on BOTH contraction and
output dims, and the padded-FLOP advantage over the (96%-efficient,
1600-wide) circulant shrinks to ~1.3-1.4x. Meanwhile the XLA scan sweep
with the direct conv emitter is measured at 38 TFLOP/s-equivalent (within
~20% of the conv's own roofline, and bf16 operands showed zero speedup —
the sweep is VPU/lncosh-bound, not MXU-bound, at these shapes). A ~1.3x
ceiling on a path that already loses to XLA for exchange moves is not
worth the kernel complexity; the auto backend therefore keeps: pallas
(circulant) for flip sweeps (+32% measured), XLA scan for exchange.
Revisit only if channel counts grow to >= 128/W per site.
"""
