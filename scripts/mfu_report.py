"""One-command MFU table (VERDICT r2 item 4): Model FLOPs Utilization of
the framework's headline workloads on the current chip, as a BASELINE.md-
ready markdown table.

  python scripts/mfu_report.py [--steps 5] [--out runs/mfu_report.md]

Rows: flagship CNN sweep + full step (heis10x10_sr shapes), GCNN hero
full step (j1j2_8x8_gcnn_r2), ViT hero full step (j1j2_8x8_vit).
Numerator = XLA cost-analysis FLOPs of the exact executable timed
(fori_loop sweep bodies are lowered standalone and scaled by the trip
count); denominator = the chip's dense peak for the config's compute
dtype (utils/mfu.py — v5e: 197 TFLOP/s bf16, /3 for f32). 'n/a' when the
backend exposes no cost model or no peak is known (CPU).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.builder import build
from qmcnn_tpu.utils.mfu import compiled_flops, fmt_mfu, mfu


#: the one timing protocol, shared with bench.py's measure_rate — see
#: PROTOCOL_NOTE printed with every table. Differencing two per-dispatch
#: work sizes cancels the ~30 ms axon tunnel dispatch cost that a
#: mean-of-calls protocol averages IN (the r3 1.7x bench-vs-report
#: discrepancy, VERDICT r3 weak #3).
PROTOCOL_NOTE = (
    "timing protocol: min-difference, identical to bench.py — each point "
    "= min over reps of an n-units-per-dispatch call, ms/unit = "
    "(t_hi - t_lo)/(n_hi - n_lo); per-dispatch (tunnel) cost cancels. "
    "FLOPs are trip-corrected (utils/mfu.true_step_flops): XLA counts "
    "scan bodies once, so uncorrected full-step numbers under-report by "
    "the inner-loop trip counts (the r4 '3% hero MFU' artifact).")


def timed_diff(fn_of_n, n_lo=1, n_hi=5, reps=9):
    """Seconds per work unit via the bench.py min-difference protocol.

    fn_of_n(n) must do n units of identical device work in ONE dispatch
    (scan/fori inside jit). Min over reps de-spikes the tunnel; the
    difference removes the per-dispatch constant entirely.
    """
    def best(n):
        jax.block_until_ready(fn_of_n(n))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn_of_n(n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = best(n_lo), best(n_hi)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def config_rows(path, overrides, label, reps, with_sweep=False,
                bisect=False):
    import functools

    cfg = cfglib.load(path, tuple(overrides))
    vmc, params, lattice = build(cfg)
    m = cfg.sampler.n_walkers
    key = jax.random.key(0)
    state = vmc.init_state(jax.random.fold_in(key, 0), m, params)
    ids = jnp.arange(m)
    dtype = cfg.model.compute_dtype
    rows = []

    # full step: vmc.run_steps is the production multi-step executable
    # (lax.scan over steps, one dispatch); per-step key derived on device.
    # The jitted wrapper MUST be built once per n and reused across timing
    # reps: a fresh `jax.jit(lambda ...)` per call is a new cache key, so
    # every rep would pay a full retrace + executable load — the r4 hero
    # 5.6 s/step vs 1.48 s/step anomaly (ADVICE r4 medium; the per-rep
    # constant does NOT cancel in the two-point difference because trace/
    # load time grows with the scan length n).
    @functools.lru_cache(maxsize=None)
    def _steps_jit(n):
        return jax.jit(lambda st, k: vmc.run_steps(st, k, ids, n)[0])

    def steps_n(n):
        return _steps_jit(n)(state, jax.random.fold_in(key, 1))

    if bisect:  # per-n timing ladder for the measurement-anomaly audit
        for n in (1, 2, 4, 8):
            jax.block_until_ready(steps_n(n))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(steps_n(n))
                ts.append(time.perf_counter() - t0)
            print(f"# bisect {label}: n={n} min={min(ts):.3f}s "
                  f"({min(ts) / n:.3f} s/step raw)", file=sys.stderr)

    t_step = timed_diff(steps_n, n_lo=1, n_hi=4, reps=reps)
    # trip-corrected FLOPs (utils/mfu.true_step_flops): lowering the full
    # step counts its inner scan bodies ONCE and under-reports by the
    # trip counts — the r4 "3% hero MFU" artifact (BASELINE.md r4)
    from qmcnn_tpu.utils.mfu import true_step_flops

    fl = true_step_flops(vmc, state, ids)
    rows.append((f"{label} full step", dtype, m, t_step, fl,
                 mfu(fl, t_step, dtype)))

    if with_sweep:
        @functools.lru_cache(maxsize=None)
        def _sweeps_jit(n):
            return jax.jit(lambda st, k: vmc.sampler.sample(
                state.params, st, k, ids, n_sweeps=n).s)

        def sweeps_n(n):
            return _sweeps_jit(n)(state.walkers, jax.random.fold_in(key, 2))

        t_sweep = timed_diff(sweeps_n, n_lo=1, n_hi=9, reps=reps)
        # the sweep's scan body is counted once by the cost model —
        # lower one proposal standalone and scale by proposals/sweep
        keys = jax.vmap(lambda w: jax.random.fold_in(key, w))(ids)
        prop = jax.jit(lambda st, ks: vmc.sampler._proposal_step(
            state.params, st, ks))
        per_prop = compiled_flops(prop, state.walkers, keys)
        fl_sweep = (per_prop * lattice.n_sites
                    if per_prop is not None else None)
        rows.append((f"{label} sweep", dtype, m, t_sweep, fl_sweep,
                     mfu(fl_sweep, t_sweep, dtype)))
    return rows


def main():
    from qmcnn_tpu.utils.chip_lock import acquire_chip_lock
    from qmcnn_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    _chip_lock = acquire_chip_lock(wait_s=1800.0)  # noqa: F841 — held to exit
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--out", default=None,
                   help="also write the markdown table to this path")
    p.add_argument("--bisect", action="store_true",
                   help="print a per-n run_steps timing ladder per row "
                        "(measurement-anomaly audit)")
    args = p.parse_args()

    targets = [
        ("configs/heis10x10_sr.yaml", (), "flagship CNN", True),
        ("configs/j1j2_8x8_gcnn_r2.yaml", (), "GCNN hero", False),
        ("configs/j1j2_8x8_vit.yaml", (), "ViT hero", False),
    ]
    rows = []
    for path, ov, label, with_sweep in targets:
        try:
            rows.extend(config_rows(path, ov, label, args.steps,
                                    with_sweep=with_sweep,
                                    bisect=args.bisect))
        except Exception as e:
            print(f"# {label}: failed ({e})", file=sys.stderr)

    dev = jax.devices()[0].device_kind
    lines = [
        f"| workload ({dev}) | dtype | M | ms/call | GFLOP/call | MFU |",
        "|---|---|---|---|---|---|",
    ]
    for label, dtype, m, t, fl, u in rows:
        gf = "n/a" if fl is None else f"{fl / 1e9:,.1f}"
        lines.append(f"| {label} | {dtype} | {m} | {t * 1e3:.2f} | {gf} "
                     f"| {fmt_mfu(u)} |")
    lines.append(f"\n{PROTOCOL_NOTE}")
    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
