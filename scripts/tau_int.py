"""Integrated autocorrelation time of a per-step CSV column.

  python scripts/tau_int.py runs/foo.csv [--col energy_re] [--skip 100]

Why it exists (VERDICT r3 item 2 — the hero MFU attack): the Metropolis
sweep dominates the hero full step, and its length (sampler.sweep_size,
default n_sites) is only justified if consecutive steps would otherwise be
correlated. tau_int of the per-step energy measures exactly that: the
variance of the run mean is var * 2 tau_int / n_steps, so
  tau_int ~ 0.5  -> consecutive steps uncorrelated: the sweep is longer
                    than the physics needs; cutting sweep_size trades
                    nothing until tau_int grows toward ~1
  tau_int >> 1   -> the sweep is too SHORT for independent estimates.

Two estimators, cross-checked:
  * Sokal windowed sum: tau = 1/2 + sum_t rho(t), window c*tau (c=6)
  * binning: tau from the plateau of bin-variance ratios.
Requires a per-step series (run with run.log_every=1).
"""
import argparse
import sys

import numpy as np


def autocorr_tau(x: np.ndarray, c: float = 6.0):
    """Sokal self-consistent window: tau = 0.5 + sum_{t<=W} rho(t),
    W = smallest t with t >= c * tau(t)."""
    x = np.asarray(x, float)
    n = len(x)
    x = x - x.mean()
    var = np.mean(x * x)
    if var == 0 or n < 8:
        return 0.5, 0
    # FFT autocovariance
    m = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, m)
    acov = np.fft.irfft(f * np.conj(f), m)[:n] / np.arange(n, 0, -1)
    rho = acov / acov[0]
    tau = 0.5
    w = 0
    for t in range(1, n):
        tau += rho[t]
        w = t
        if t >= c * tau:
            break
    return float(tau), w


def binning_tau(x: np.ndarray, max_level: int = 12):
    """tau from binning: sigma^2_bin(k)/sigma^2 * k / 2 plateaus at tau."""
    x = np.asarray(x, float)
    var0 = x.var(ddof=1)
    if var0 == 0:
        return 0.5, []
    out = []
    k = 1
    for _ in range(max_level):
        k *= 2
        nb = len(x) // k
        if nb < 16:
            break
        b = x[: nb * k].reshape(nb, k).mean(axis=1)
        out.append((k, 0.5 * k * b.var(ddof=1) / var0))
    tau = max(t for _, t in out) if out else 0.5
    return float(tau), out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("csv")
    p.add_argument("--col", default="energy_re")
    p.add_argument("--skip", type=int, default=100,
                   help="drop the first N rows (equilibration)")
    args = p.parse_args()
    d = np.genfromtxt(args.csv, delimiter=",", names=True)
    x = d[args.col][args.skip:]
    if len(x) < 64:
        print(f"only {len(x)} rows after skip — need a per-step series "
              "(run.log_every=1)", file=sys.stderr)
        sys.exit(1)
    tau_s, w = autocorr_tau(x)
    tau_b, levels = binning_tau(x)
    print(f"n={len(x)} col={args.col}")
    print(f"tau_int (Sokal, window {w}) = {tau_s:.3f}")
    print(f"tau_int (binning max)      = {tau_b:.3f}")
    for k, t in levels:
        print(f"  bin {k:5d}: tau {t:.3f}")
    eff = len(x) / (2 * max(tau_s, 0.5))
    print(f"effective samples = {eff:.0f} ({eff / len(x):.1%})")


if __name__ == "__main__":
    main()
