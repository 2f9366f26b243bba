"""Post-run analysis CLI over a metrics CSV (run.csv_path):

  python -m qmcnn_tpu.analyze runs/exp.csv [--tail 0.25] [--n-sites 100]

Prints the tail-mean energy with an autocorrelation-aware (binned) error
bar, the integrated autocorrelation time of the energy trace, and run
health aggregates (acceptance, throughput). Complements the live logger
(utils/metrics.py), which prints the same tail estimate at run end —
this works offline on any saved CSV.
"""
from __future__ import annotations

import argparse
import csv

import numpy as np

from qmcnn_tpu.utils.metrics import binned_stderr, integrated_autocorr_time


def read_csv(path: str) -> dict:
    cols: dict[str, list[float]] = {}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            for k, v in row.items():
                try:
                    cols.setdefault(k, []).append(float(v))
                except (TypeError, ValueError):
                    pass
    return {k: np.asarray(v) for k, v in cols.items()}


def analyze(cols: dict, tail: float = 0.25, n_sites: int | None = None
            ) -> dict:
    e = cols.get("energy_re")
    if e is None or e.size == 0:
        raise ValueError("CSV has no energy_re column")
    t = e[int(e.size * (1.0 - tail)):]
    out = {
        "steps": int(cols["step"][-1]) if "step" in cols else e.size,
        "rows": int(e.size),
        "tail_rows": int(t.size),
        "energy": float(t.mean()),
        "energy_err": binned_stderr(t),
        "tau_int": integrated_autocorr_time(t),
    }
    if n_sites:
        out["e_per_site"] = out["energy"] / n_sites
        out["e_per_site_err"] = out["energy_err"] / n_sites
    for k in ("accept", "sweeps_per_sec", "energy_var"):
        if k in cols and cols[k].size:
            out[f"{k}_mean"] = float(cols[k][-t.size:].mean())
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("csv_path")
    p.add_argument("--tail", type=float, default=0.25,
                   help="fraction of the trace to average (default 0.25)")
    p.add_argument("--n-sites", type=int, default=None,
                   help="report per-site energy too")
    args = p.parse_args(argv)
    r = analyze(read_csv(args.csv_path), tail=args.tail,
                n_sites=args.n_sites)
    print(f"rows={r['rows']} (tail {r['tail_rows']}), "
          f"last step {r['steps']}")
    print(f"energy = {r['energy']:.6f} +- {r['energy_err']:.6f}"
          f"  (tau_int ~ {r['tau_int']:.1f} logged steps)")
    if "e_per_site" in r:
        print(f"e/site = {r['e_per_site']:.6f} +- {r['e_per_site_err']:.6f}")
    extras = [f"{k[:-5]}={r[k]:.4g}" for k in
              ("accept_mean", "sweeps_per_sec_mean", "energy_var_mean")
              if k in r]
    if extras:
        print("tail means: " + "  ".join(extras))
    return r


if __name__ == "__main__":
    main()
