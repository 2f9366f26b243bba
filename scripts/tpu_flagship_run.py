"""Flagship timed run on real TPU hardware: 10x10 Heisenberg + SR
(BASELINE config 5 / the north-star wall-clock target).

  python scripts/tpu_flagship_run.py [--steps 400] [--walkers 2048]

Reports wall-clock to convergence milestones (E/site thresholds toward the
10x10 reference value; QMC literature E/site = -0.671549(4) for the infinite
square lattice, finite 10x10 sits near -0.6715 after finite-size effects)
and appends a measured row for BASELINE.md.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from qmcnn_tpu import configs as cfglib  # noqa: E402
from qmcnn_tpu.builder import build_sharded  # noqa: E402
from qmcnn_tpu.utils.metrics import binned_stderr  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--walkers", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument("--therm", type=int, default=60)
    args = p.parse_args()

    cfg = cfglib.load(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "heis10x10_sr.yaml"),
        (f"run.n_steps={args.steps}",
         f"sampler.n_walkers={args.walkers}",
         f"sampler.n_therm_sweeps={args.therm}",
         f"run.steps_per_dispatch={args.chunk}"),
    )
    print(jax.devices(), flush=True)
    n_sites = 100

    t_start = time.time()
    sharded, params, lattice = build_sharded(cfg)
    key = jax.random.key(cfg.run.seed + 100)
    state = sharded.init_state(jax.random.fold_in(key, 0),
                               cfg.sampler.n_walkers, params)
    state = sharded.thermalize(state, jax.random.fold_in(key, 1),
                               n_sweeps=cfg.sampler.n_therm_sweeps)
    jax.block_until_ready(state.walkers.s)
    t_therm = time.time()
    print(f"setup+thermalize: {t_therm - t_start:.1f}s", flush=True)

    base_key = jax.random.fold_in(key, 2)
    es, times = [], []
    milestones = {-0.60: None, -0.65: None, -0.66: None, -0.67: None}
    it = 0
    t0 = time.time()
    while it < cfg.run.n_steps:
        chunk = min(cfg.run.steps_per_dispatch, cfg.run.n_steps - it)
        state, ms = sharded.run_steps(state, base_key, chunk)
        e = np.asarray(ms.energy_re) / n_sites
        now = time.time()
        es.extend(e.tolist())
        times.extend(np.linspace(
            times[-1] if times else 0.0, now - t0, chunk + 1)[1:].tolist())
        it += chunk
        for thr in milestones:
            if milestones[thr] is None and np.any(e <= thr):
                milestones[thr] = now - t0
        print(f"step {it:5d}: E/site={e[-1]:+.5f} "
              f"var={float(ms.energy_var[-1]):.4f} "
              f"acc={float(ms.accept_rate[-1]):.3f} "
              f"cg={int(ms.sr_iters[-1])} "
              f"t={now - t0:.1f}s "
              f"({cfg.sampler.n_walkers * cfg.sampler.n_sweeps_per_step * chunk / (now - (t0 + (times[-chunk - 1] if len(times) > chunk else 0))):.0f} w-sweeps/s)",
              flush=True)

    tail = es[-max(len(es) // 4, 1):]
    print("\nmilestones (wall seconds after thermalization):", flush=True)
    for thr, t in milestones.items():
        print(f"  E/site <= {thr}: {f'{t:.1f}s' if t else 'not reached'}",
              flush=True)
    print(f"\nfinal E/site = {np.mean(tail):.6f} +- "
          f"{binned_stderr(np.asarray(tail)):.6f}  "
          f"(total wall {time.time() - t_start:.1f}s incl. compile)",
          flush=True)


if __name__ == "__main__":
    main()
