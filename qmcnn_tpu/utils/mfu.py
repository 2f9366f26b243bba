"""Model FLOPs Utilization (MFU): achieved FLOP/s over chip peak.

VERDICT r2 item 4: the roofline claims justifying kernel decisions (e.g.
the K2 skip at "62% of v5e bf16 peak", kernels/gcnn_pallas.py) lived as
one-off docstring numbers; this makes them auditable, per-config, from
one command (scripts/mfu_report.py; also bench.py's JSON line and
scripts/gcnn_perf.py --mfu).

FLOP counts come from XLA itself — ``compiled.cost_analysis()['flops']``
on the exact executable being timed — so the numerator is what the
compiler actually scheduled, not a hand model. Caveats, stated where the
number is printed: XLA counts a multiply-add as 2 FLOPs and counts every
lowered op (so a "wasteful but fast" lowering inflates MFU's numerator
exactly as it inflates the work actually done — that is the honest
reading of *model FLOPs utilization on the compiled program*); transcen-
dentals count as 1. When the backend exposes no cost model the functions
return None and callers print 'n/a' rather than a guess.

Peak table (per chip, dense-matmul peak):
  * TPU v5e (v5 lite): 197 TFLOP/s bf16 — the public spec number this
    repo's rooflines already use. f32 runs the MXU in a 3-pass scheme on
    this generation: peak = 197/3 ~ 65.7 TFLOP/s (measured cap in the
    gcnn_pallas.py roofline).
  * CPU (tests): None — MFU is a TPU metric here.
"""
from __future__ import annotations

from typing import Optional

import jax

V5E_BF16_PEAK = 197e12
_PEAKS = {
    # device_kind substring (lowercased) -> dtype -> FLOP/s
    "v5 lite": {"bfloat16": V5E_BF16_PEAK, "float32": V5E_BF16_PEAK / 3.0},
    "v5e": {"bfloat16": V5E_BF16_PEAK, "float32": V5E_BF16_PEAK / 3.0},
}


def device_peak_flops(compute_dtype: str = "float32",
                      device=None) -> Optional[float]:
    """Per-chip dense peak for the given model compute dtype, or None."""
    dev = device or jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    for sub, table in _PEAKS.items():
        if sub in kind:
            return table.get(str(compute_dtype))
    return None


def compiled_flops(fn, *args, **kwargs) -> Optional[float]:
    """FLOPs XLA reports for one call of ``jax.jit(fn)`` at these args.

    ``fn`` may already be jitted (it is lowered as-is when so). Returns
    None when the backend exposes no cost model.
    """
    try:
        jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # some backends: one per module
            cost = cost[0] if cost else None
        if not cost:
            return None
        flops = cost.get("flops")
        return float(flops) if flops and flops > 0 else None
    except Exception:
        return None


def mfu(flops_per_call: Optional[float], seconds_per_call: float,
        compute_dtype: str = "float32") -> Optional[float]:
    """Fraction of chip peak: (flops/s achieved) / peak. None if unknown."""
    peak = device_peak_flops(compute_dtype)
    if flops_per_call is None or peak is None or seconds_per_call <= 0:
        return None
    return (flops_per_call / seconds_per_call) / peak


def fmt_mfu(value: Optional[float]) -> str:
    return "n/a" if value is None else f"{100.0 * value:.1f}%"
