#!/usr/bin/env python
"""Quench-spectroscopy harvest: corr CSV -> omega(q) table (+ ED oracle).

  python scripts/quench_spectrum_check.py --corr runs/corr.csv \
      [--shape 12] [--h0 2.0 --h1 1.2 --exact] [--json out.json]

With --exact (chains up to ~13 sites): dense-diagonalize the pre/post
Hamiltonians, exactly propagate the post-quench Schrodinger evolution of
the pre-quench ground state on the SAME time grid, run the identical
extraction on the exact C(r, t), and report the per-momentum frequency
deviation of the t-VMC run — the whole-pipeline error budget (sampling +
integrator + manifold), with the FFT machinery cancelled between the two
columns.

Pure host-side numpy/scipy: never touches the TPU (safe to run alongside
chip jobs).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from qmcnn_tpu.ops.spectroscopy import (dominant_frequencies,  # noqa: E402
                                        read_corr_csv)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corr", required=True)
    p.add_argument("--shape", default=None,
                   help="lattice torus, e.g. 8,8 (default: chain)")
    p.add_argument("--pad", type=int, default=8)
    p.add_argument("--h0", type=float, default=None,
                   help="pre-quench TFIM field (for --exact)")
    p.add_argument("--h1", type=float, default=None,
                   help="post-quench TFIM field (for --exact)")
    p.add_argument("--exact", action="store_true",
                   help="compare against dense-ED exact propagation")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    times, corr = read_corr_csv(args.corr)
    n_sites = corr.shape[1]
    shape = (tuple(int(x) for x in args.shape.split(","))
             if args.shape else (n_sites,))
    table = dominant_frequencies(times, corr, shape, pad=args.pad)
    out = {"corr": args.corr, "rows": int(times.size),
           "t_total": float(times[-1] - times[0]), "modes": table}

    if args.exact:
        if len(shape) != 1 or n_sites > 13:
            raise SystemExit("--exact needs a chain with <= 13 sites "
                             "(dense 2^N eigh)")
        if args.h0 is None or args.h1 is None:
            raise SystemExit("--exact needs --h0 and --h1")
        from qmcnn_tpu.lattice import chain
        from qmcnn_tpu.ops import exact

        n = n_sites
        lat = chain(n)
        _, v0 = np.linalg.eigh(
            exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=args.h0).toarray())
        energies, vecs = np.linalg.eigh(
            exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=args.h1).toarray())
        c = vecs.T @ v0[:, 0]
        spins = exact._spins(n).astype(np.float64)
        cr = np.stack(
            [(spins * np.roll(spins, -r, axis=1)).mean(axis=1) / 4.0
             for r in range(n)], axis=1)
        # evolve logs the PRE-update state: row i sits at t = i * dt
        dt = float(np.median(np.diff(times)))
        grid = np.arange(times.size) * dt
        coef_t = c[None, :] * np.exp(-1j * np.outer(grid, energies))
        corr_exact = (np.abs(coef_t @ vecs.T) ** 2) @ cr
        exact_table = dominant_frequencies(grid + dt, corr_exact, shape,
                                           pad=args.pad)
        exact_by_k = {tuple(r["k"]): r for r in exact_table}
        p_max = max(r["power"] for r in exact_table)
        devs = []
        for row in table:
            ex = exact_by_k[tuple(row["k"])]
            row["omega_exact"] = ex["omega"]
            row["loud"] = bool(ex["power"] > 0.01 * p_max)
            if row["loud"]:
                devs.append(abs(row["omega"] - ex["omega"])
                            / max(abs(ex["omega"]), 1e-12))
        out["max_rel_dev_loud_modes"] = float(max(devs)) if devs else None
        out["n_loud_modes"] = len(devs)

    hdr = f"{'k':>10} {'omega':>10} {'power':>12}"
    if args.exact:
        hdr += f" {'omega_exact':>12} {'rel_dev':>9}"
    print(hdr)
    for row in table:
        ks = ",".join(str(k) for k in row["k"])
        line = f"{ks:>10} {row['omega']:>10.4f} {row['power']:>12.4g}"
        if args.exact and row.get("loud"):
            rd = abs(row["omega"] - row["omega_exact"]) \
                / max(abs(row["omega_exact"]), 1e-12)
            line += f" {row['omega_exact']:>12.4f} {rd:>9.2%}"
        elif args.exact:
            line += f" {row['omega_exact']:>12.4f}    (faint)"
        print(line)
    if args.exact:
        print(f"max rel deviation over {out['n_loud_modes']} loud modes: "
              f"{out['max_rel_dev_loud_modes']:.2%}")
    if args.json:
        def _clean(o):
            if isinstance(o, dict):
                return {str(k): _clean(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return [_clean(v) for v in o]
            if isinstance(o, (np.floating, np.integer)):
                return o.item()
            return o
        with open(args.json, "w") as f:
            json.dump(_clean(out), f, indent=1)


if __name__ == "__main__":
    main()
