"""Nightly-style validation: run every BASELINE config and report a table.

  python scripts/validate_baselines.py [--steps N] [--walkers M] [--quick]

For each config in configs/: train, then report final energy (tail mean +-
binned stderr), the exact target where available (ED for n_sites <= 20,
Bethe ansatz for the Heisenberg chain), relative error, and sweeps/sec.
Appends a markdown row per config to stdout (paste into BASELINE.md).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qmcnn_tpu import configs as cfglib  # noqa: E402
from qmcnn_tpu.train import exact_reference_energy, train  # noqa: E402


def exact_target(cfg):
    e = exact_reference_energy(cfg)
    if e is not None:
        return e, "ED"
    h = cfg.hamiltonian
    shape = tuple(cfg.lattice.shape)
    if h.kind == "heisenberg" and len(shape) == 1 and h.delta == 1.0:
        # Bethe solver covers only the isotropic point
        from qmcnn_tpu.ops import bethe

        return bethe.ground_energy(shape[0], j=h.j), "Bethe"
    return None, None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--walkers", type=int, default=None)
    p.add_argument("--quick", action="store_true",
                   help="200 steps, 256 walkers")
    p.add_argument("--configs", nargs="*", default=None)
    args = p.parse_args()

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = args.configs or sorted(glob.glob(os.path.join(cfg_dir, "*.yaml")))
    rows = []
    for path in paths:
        overrides = []
        if args.quick:
            overrides += ["run.n_steps=200", "sampler.n_walkers=256"]
        if args.steps:
            overrides += [f"run.n_steps={args.steps}"]
        if args.walkers:
            overrides += [f"sampler.n_walkers={args.walkers}"]
        cfg = cfglib.load(path, tuple(overrides))
        print(f"\n=== {cfg.name} ===", flush=True)
        t0 = time.time()
        state, logger = train(cfg)
        wall = time.time() - t0
        e_tail, e_err = logger.tail_energy()
        n_sites = 1
        for d in cfg.lattice.shape:
            n_sites *= d
        target, kind = exact_target(cfg)
        rel = (abs(e_tail - target) / abs(target)) if target else None
        sps = logger.history.get("sweeps_per_sec", [0])[-1]
        rows.append(
            f"| {cfg.name} | {e_tail:.5f} +- {e_err:.5f} "
            f"| {e_tail / n_sites:.5f} "
            f"| {f'{target:.5f} ({kind})' if target else '-'} "
            f"| {f'{rel:.2e}' if rel is not None else '-'} "
            f"| {sps:.0f} | {wall:.0f}s |"
        )

    print("\n| config | E (tail) | E/site | exact target | rel. err "
          "| sweeps/s | wall |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
