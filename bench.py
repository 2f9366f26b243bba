"""Primary benchmark: walker sweeps/sec/chip on the flagship 10x10
Heisenberg CNN (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement protocol (the axon TPU tunnel has ~30 ms fixed per-dispatch
overhead and very slow host transfers, so naive per-call timing lies):
  * the sampler runs K full sweeps inside ONE jitted lax.scan dispatch;
  * rate = (K2 - K1) * n_walkers / (t(K2) - t(K1)) — differencing two scan
    lengths cancels the fixed dispatch cost;
  * only a scalar leaves the device.

vs_baseline: the reference (dmaloneynygc/qmcnn) is a CPU code with no
published numbers and an empty reference mount (SURVEY.md section 0), so the
stand-in baseline is THIS framework's identical sweep benchmark on the host
CPU (XLA CPU, all cores) — a strong stand-in for the reference's
numpy/framework CPU walker loop. The CPU rate is measured in a subprocess
(JAX cannot host two platforms here) and cached in .bench_cpu_cache.json.
North star: >10x (BASELINE.md).
"""
from __future__ import annotations

import argparse
import functools
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cpu_cache.json")

# benchmark workload (flagship: BASELINE config 5 shapes)
N_WALKERS = 2048
LATTICE = (10, 10)
CHANNELS = (16, 16, 16)
SWEEPS_SHORT = 2
SWEEPS_LONG = 10


def build_sweep_fn(compute_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import build

    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=LATTICE),
        model=cfglib.ModelConfig(channels=CHANNELS, kernel_size=3,
                                 compute_dtype=compute_dtype),
        hamiltonian=cfglib.HamiltonianConfig(kind="heisenberg"),
        sampler=cfglib.SamplerConfig(n_walkers=N_WALKERS, move="exchange"),
    )
    vmc, params, lattice = build(cfg)
    sampler = vmc.sampler  # backend 'auto': pallas fused sweep on TPU
    key = jax.random.key(0)
    state = sampler.init_state(params, key, N_WALKERS)
    ids = jnp.arange(N_WALKERS)
    n_props_per_sweep = lattice.n_sites
    build_sweep_fn.last_parts = (sampler, params, state, key, ids,
                                 n_props_per_sweep)

    if sampler.backend == "pallas":
        # fused kernel path: static proposal counts (one compile per timing
        # point, amortized by the persistent compilation cache)
        import functools

        @functools.partial(jax.jit, static_argnums=2)
        def run(state, key, n_props):
            out = sampler._sample_pallas(params, state, key, ids, n_props)
            return out.s.sum() + out.log_psi.re.sum()

        return run, state, key, n_props_per_sweep

    # XLA path: ONE executable with a *dynamic* proposal count (remote
    # compiles cost minutes, so both timing points share a compile).
    @jax.jit
    def run(state, key, n_props):
        def body(t, st):
            k_t = jax.random.fold_in(key, t)
            keys = jax.vmap(lambda w: jax.random.fold_in(k_t, w))(ids)
            return sampler._proposal_step(params, st, keys)

        out = jax.lax.fori_loop(0, n_props, body, state)
        return out.s.sum() + out.log_psi.re.sum()

    return run, state, key, n_props_per_sweep


def measure_rate(passes: int = 5, compute_dtype: str = "float32") -> float:
    """Sweeps/sec via length differencing (dispatch cost cancelled).

    The tunnel adds tens-of-ms latency spikes on individual dispatches
    (measured band on identical code: 137k-307k with mean-of-3 timing).
    Every call at a given length does identical device work, so the MIN
    over all samples of a timing point is its least tunnel-contaminated
    estimate; the rate comes from ONE difference of the two per-point
    minima. (Taking the max over per-pass differences instead would be
    two-sided: a pass whose short point stayed contaminated while its
    long point came out clean undershoots the difference, and the max
    would select exactly those passes.) Post-compile calls are
    sub-second on TPU so the repeats are free; the CPU baseline path
    uses passes=1 (a long call costs minutes there).
    """
    run, state, key, props_per_sweep = build_sweep_fn(compute_dtype)

    def timed_samples(n_sweeps, reps):
        n = n_sweeps * props_per_sweep
        float(run(state, key, n))  # compile (first call) + warm
        out = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(state, key, n))
            out.append(time.perf_counter() - t0)
        return out

    reps = 3 * max(1, passes)
    t_short = min(timed_samples(SWEEPS_SHORT, reps))
    t_long = min(timed_samples(SWEEPS_LONG, reps))
    dt_per_sweep = max(
        (t_long - t_short) / (SWEEPS_LONG - SWEEPS_SHORT), 1e-9)
    return N_WALKERS / dt_per_sweep  # walker-sweeps per second


def sweep_mfu(rate: float, compute_dtype: str = "float32"):
    """MFU of the benchmark sweep: XLA cost-analysis FLOPs of ONE
    proposal step (the loop body — fori_loop bodies are counted once by
    the cost model, so the body is lowered standalone) x N proposals per
    sweep, over the chip's dense peak for the compute dtype
    (utils/mfu.py). Returns (mfu_fraction | None, flops_per_sweep | None,
    flops_source: "xla" | "hand" | None) — "hand" on the pallas backend,
    whose fused kernel has no cost model (fixed op sequence counted by
    utils/mfu.pallas_sweep_flops_per_proposal).

    Note the expected magnitude: the sweep is the HBM/dispatch-bound
    phase (one-site proposals keep the forward batch at M), so its MFU is
    intrinsically far below the big-batch E_loc/Jacobian phases' — see
    scripts/mfu_report.py for the per-phase table.
    """
    import jax
    import jax.numpy as jnp

    from qmcnn_tpu.utils.mfu import compiled_flops, mfu

    from qmcnn_tpu.utils.mfu import device_peak_flops

    ctx = getattr(build_sweep_fn, "last_parts", None)
    if ctx is None:
        return None, None, None
    sampler, params, state, key, ids, props_per_sweep = ctx
    if sampler.backend == "pallas":
        # the timed sweep ran the fused Pallas kernel, which exposes no
        # XLA cost model — lowering _proposal_step would count FLOPs of a
        # DIFFERENT executable. The kernel's op sequence is fixed, so use
        # the hand FLOP model instead, labeled flops_source="hand"
        # (utils/mfu.pallas_sweep_flops_per_proposal; VERDICT r4 weak #5).
        from qmcnn_tpu.utils.mfu import pallas_sweep_flops_per_proposal

        per_walker = pallas_sweep_flops_per_proposal(
            params, LATTICE, move=sampler.move)
        per_sweep = per_walker * N_WALKERS * props_per_sweep
        src = "hand"
    else:
        keys = jax.vmap(lambda w: jax.random.fold_in(key, w))(ids)
        step = jax.jit(lambda st, ks: sampler._proposal_step(params, st, ks))
        per_prop = compiled_flops(step, state, keys)
        if per_prop is None:
            return None, None, None
        per_sweep = per_prop * props_per_sweep
        src = "xla"
    achieved = per_sweep * (rate / N_WALKERS)  # sweeps/s * FLOP/sweep
    peak = device_peak_flops(compute_dtype)
    if peak is None:
        return None, per_sweep, src
    return achieved / peak, per_sweep, src


def workload_fingerprint() -> str:
    blob = json.dumps([N_WALKERS, LATTICE, CHANNELS, "v1"]).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def cpu_baseline_rate() -> float:
    fp = workload_fingerprint()
    if os.path.exists(CACHE):
        try:
            data = json.load(open(CACHE))
            if data.get("fingerprint") == fp:
                return float(data["rate"])
        except Exception:
            pass
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    rate = None
    for line in out.stdout.splitlines():
        if line.startswith("CPU_RATE"):
            rate = float(line.split()[1])
    if rate is None:
        raise RuntimeError(
            f"cpu baseline failed:\n{out.stdout}\n{out.stderr}"
        )
    json.dump({"fingerprint": fp, "rate": rate}, open(CACHE, "w"))
    return rate


def main():
    from qmcnn_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--cpu-baseline", action="store_true",
                   help="measure on CPU and print CPU_RATE (internal)")
    p.add_argument("--no-baseline", action="store_true",
                   help="skip the CPU stand-in baseline (vs_baseline=null)")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="model compute dtype for A/B runs (the recorded "
                        "bench always measures the shipped default)")
    p.add_argument("--captures", type=int, default=5,
                   help="independent min-difference captures; the JSON "
                        "reports their median as value plus min/max band "
                        "(tunnel jitter vs regression, VERDICT r4 weak #2)")
    args = p.parse_args()

    if args.cpu_baseline:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        rate = measure_rate(passes=1)
        print(f"CPU_RATE {rate:.6f}")
        return

    from qmcnn_tpu.utils.chip_lock import acquire_chip_lock
    _chip_lock = acquire_chip_lock(wait_s=900.0)  # bench is driver-facing:
    # wait a bounded 15 min for a stale holder, then proceed regardless
    lock_status = ("held" if _chip_lock is not None else
                   "inherited" if os.environ.get("QMCNN_CHIP_LOCK_HELD")
                   else "UNLOCKED")
    print("# timing protocol: min-difference (min over reps per point, one "
          "two-point difference) — per-dispatch tunnel cost cancels; "
          "scripts/mfu_report.py uses the identical protocol.",
          file=sys.stderr)
    # k independent captures (each its own min-difference rate): the
    # median is the headline, the min/max band is what separates a real
    # regression from tunnel jitter — a single point could not (the
    # 278.6k -> 265.2k four-round "drift" lived entirely inside the
    # published 240-307k band; VERDICT r4 weak #2).
    k = max(1, args.captures)
    rates = sorted(measure_rate(compute_dtype=args.compute_dtype)
                   for _ in range(k))
    rate = rates[k // 2] if k % 2 else 0.5 * (rates[k // 2 - 1]
                                              + rates[k // 2])
    vs = None
    if not args.no_baseline:
        try:
            cpu_rate = cpu_baseline_rate()
            vs = rate / cpu_rate
        except Exception as e:  # never let the baseline sink the bench
            print(f"# cpu baseline unavailable: {e}", file=sys.stderr)
    try:
        mfu_frac, _, mfu_src = sweep_mfu(rate, args.compute_dtype)
    except Exception as e:  # never let the cost model sink the bench
        print(f"# sweep MFU unavailable: {e}", file=sys.stderr)
        mfu_frac, mfu_src = None, None
    print(json.dumps({
        "metric": "walker_sweeps_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "sweeps/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "sweep_mfu": round(mfu_frac, 4) if mfu_frac is not None else None,
        "flops_source": mfu_src,
        "chip_lock": lock_status,
        "captures": k,
        "band_min": round(rates[0], 2),
        "band_max": round(rates[-1], 2),
    }))


if __name__ == "__main__":
    main()
