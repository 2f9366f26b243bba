"""GCNN performance lab (VERDICT r1 item 2): phase-split timing of the
full train step for a GCNN config on the real chip.

  python scripts/gcnn_perf.py [config] [--override ...] [--steps 20]

Times, dispatch-overhead-cancelled: one full step, the sampling sweep
alone, local energy alone, SR solve alone; prints walker-sweeps/s through
the full step (the BASELINE.md metric) for easy A/B (f32 vs bf16,
jacobian chunk settings, etc).
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
from qmcnn_tpu.ops.local_energy import local_energy
from qmcnn_tpu.vmc import energy_and_grad


def timed(fn, *args, n=5, warmup=2):
    # block EVERY call: blocking only on the last output was observed to
    # return early through the tunnel (a 1.45 s step "measured" at
    # 0.58 ms, runs/r4_gcnn_profile_true.txt) — per-call sync costs ~ms
    # against the >100 ms phases this script times
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n, out


def main():
    from qmcnn_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?",
                   default="configs/j1j2_8x8_gcnn_deep.yaml")
    p.add_argument("--override", action="append", default=[])
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--mfu", action="store_true",
                   help="also print Model FLOPs Utilization per phase "
                        "(XLA cost-analysis FLOPs over the v5e dense peak "
                        "for the config's compute dtype; utils/mfu.py)")
    args = p.parse_args()
    cfg = cfglib.load(args.config, tuple(args.override))
    vmc, params, lattice = build(cfg)
    from qmcnn_tpu.utils.mfu import compiled_flops, fmt_mfu, mfu

    def mfu_tag(fn, t, *fn_args):
        if not args.mfu:
            return ""
        fl = compiled_flops(fn, *fn_args)
        return (f"  MFU={fmt_mfu(mfu(fl, t, cfg.model.compute_dtype))}"
                f" ({0 if fl is None else fl/1e9:,.1f} GFLOP/call)")
    m = cfg.sampler.n_walkers
    key = jax.random.key(0)
    state = vmc.init_state(jax.random.fold_in(key, 0), m, params)
    ids = jnp.arange(m)
    print(f"config={cfg.name} M={m} n={lattice.n_sites} "
          f"dtype={cfg.model.compute_dtype} chunk={vmc.chunk_size} "
          f"jchunk={vmc.sr.jacobian_chunk if vmc.sr else None}")

    # full step
    step = jax.jit(lambda st, k: vmc.step(st, k, ids))
    t_step, (state2, metrics) = timed(step, state, jax.random.fold_in(key, 1),
                                      n=args.steps)
    print(f"full step       : {t_step*1e3:9.2f} ms  "
          f"({m / t_step:,.0f} walker-sweeps/s)  "
          f"E={float(metrics.energy_re):+.4f} "
          f"acc={float(metrics.accept_rate):.3f}"
          + mfu_tag(step, t_step, state, jax.random.fold_in(key, 1)))

    # sweep only
    sweep = jax.jit(lambda st, k: vmc.sampler.sample(
        st.params, st.walkers, k, ids, n_sweeps=1).s)
    t_sweep, _ = timed(sweep, state, jax.random.fold_in(key, 2),
                       n=args.steps)
    print(f"sweep only      : {t_sweep*1e3:9.2f} ms"
          + mfu_tag(sweep, t_sweep, state, jax.random.fold_in(key, 2)))

    # local energy only
    eloc = jax.jit(lambda st: local_energy(
        vmc.log_psi_fn, st.params, vmc.ham, st.walkers.s,
        st.walkers.log_psi, chunk_size=vmc.chunk_size).re)
    t_eloc, _ = timed(eloc, state, n=args.steps)
    print(f"local energy    : {t_eloc*1e3:9.2f} ms"
          + mfu_tag(eloc, t_eloc, state))

    # gradient (energy_and_grad includes E_loc; subtract).
    # [2] = grads in the 5-tuple (e_mean, e_var, grads, e_loc, overlap)
    grad = jax.jit(lambda st: energy_and_grad(
        vmc.log_psi_fn, vmc.ham, st.params, st.walkers,
        chunk_size=vmc.chunk_size)[2])
    t_grad, grads = timed(grad, state, n=args.steps)
    print(f"E_loc+cov grad  : {t_grad*1e3:9.2f} ms"
          + mfu_tag(grad, t_grad, state))

    if vmc.sr is not None:
        e = jax.jit(lambda st: local_energy(
            vmc.log_psi_fn, st.params, vmc.ham, st.walkers.s,
            st.walkers.log_psi, chunk_size=vmc.chunk_size))(state)
        sr = jax.jit(lambda st, g, e: vmc.sr.solve(
            vmc.log_psi_fn, st.params, st.walkers.s, g,
            st.step, e_loc=e)[0])
        t_sr, _ = timed(sr, state, grads, e, n=args.steps)
        print(f"SR solve        : {t_sr*1e3:9.2f} ms"
              + mfu_tag(sr, t_sr, state, grads, e))

    # single batched forward at the E_loc batch scale (per 1024 configs)
    s_big = jnp.tile(state.walkers.s, (4, 1))[:4096]
    fwd = jax.jit(lambda p, s: vmc.log_psi_fn(p, s).re)
    t_fwd, _ = timed(fwd, state.params, s_big, n=args.steps)
    print(f"forward 4096    : {t_fwd*1e3:9.2f} ms  "
          f"({t_fwd/4*1e3:.2f} ms/1024)"
          + mfu_tag(fwd, t_fwd, state.params, s_big))

    # ---- TRIP-CORRECTED true MFU (r4) ------------------------------------
    # XLA's cost analysis counts a scan/fori BODY ONCE, so every lowered
    # executable containing an inner loop under-reports FLOPs by the trip
    # count: the sweep scans n_sites proposals, chunked E_loc scans
    # M/chunk chunks. Discovered via the r4 chunk ladder — the reported
    # E_loc "GFLOP/call" doubled exactly with chunk size. Compose the true
    # per-step FLOPs from loop-free lowerings scaled by known trip counts:
    #   sweep  = n_proposals x one-proposal FLOPs (loop-free)
    #   E_loc  = (M/chunk) x one-chunk FLOPs (lowered UNCHUNKED at chunk M)
    #   grad   = (E_loc+grad) - (E_loc) at the same chunking (the trip
    #            artifact cancels in the difference; backward has no loop)
    #   solve  = lowered standalone (loop-free when jacobian_chunk=None)
    if args.mfu:
        # one composition site: utils/mfu.true_step_flops owns the trip
        # correction AND the backend guard (returns None on the pallas
        # sweep — lowering _proposal_step there would count FLOPs of a
        # different executable than the one t_step timed; ADVICE r4)
        from qmcnn_tpu.utils.mfu import true_step_flops

        fl_true = true_step_flops(vmc, state, ids)
        if fl_true is None:
            print("TRUE full step  : n/a (timed backend exposes no exact "
                  "cost model — pallas fused sweep or CPU)")
        else:
            u = mfu(fl_true, t_step, cfg.model.compute_dtype)
            print(f"TRUE full step  : {fmt_mfu(u)} MFU "
                  f"({fl_true/1e9:,.1f} GFLOP/step trip-corrected; "
                  f"composition in utils/mfu.true_step_flops)")


if __name__ == "__main__":
    main()
