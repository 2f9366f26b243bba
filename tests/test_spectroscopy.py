"""Quench-spectroscopy tests (ops/spectroscopy.py, analyze --quench-spectrum).

Oracles:
  * synthetic signals with planted dispersions (1D + 2D tori) — exact
    frequency recovery through the full FFT/window/refine pipeline;
  * ED: exact Schrodinger evolution of a TFIM quench; the extracted
    peak per momentum must sit on the dominant post-quench eigenvalue
    gap predicted from the spectral decomposition of the SAME signal;
  * CLI round-trip over a written corr CSV;
  * end-to-end: evolve --corr-csv (full-sum t-VMC) vs exact propagation
    of the same initial vector, compared in omega(q) space.
"""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.spectroscopy import (dominant_frequencies,
                                        quench_spectrum, read_corr_csv,
                                        structure_factor_qt)


def _synthetic_chain(n=16, tlen=512, dt=0.05, h=1.5, seed=0):
    """Planted dispersion omega(q) = 2 sqrt(1 + h^2 - 2h cos q)."""
    rng = np.random.default_rng(seed)
    k = np.arange(n)
    q = 2 * np.pi * k / n
    omega = 2.0 * np.sqrt(1.0 + h * h - 2.0 * h * np.cos(q))
    amp = 0.5 + rng.random(n)
    phase = 2 * np.pi * rng.random(n)
    # C(r, t) real requires S(k) == S(-k): symmetrize the random parts
    amp = 0.5 * (amp + amp[(n - k) % n])
    phase = 0.5 * (phase + phase[(n - k) % n])
    times = np.arange(tlen) * dt
    s_qt = amp[None, :] * np.cos(omega[None, :] * times[:, None]
                                 + phase[None, :])
    corr = np.real(np.fft.ifft(s_qt, axis=1))
    return times, corr, omega


def test_synthetic_chain_dispersion_recovery():
    times, corr, omega = _synthetic_chain()
    n = corr.shape[1]
    table = dominant_frequencies(times, corr, (n,))
    assert len(table) == n // 2 + 1  # canonical +-q half-zone
    for row in table:
        k = row["k"][0]
        np.testing.assert_allclose(row["omega"], omega[k], atol=0.02)


def test_synthetic_2d_dispersion_recovery():
    shape = (4, 4)
    tlen, dt = 512, 0.05
    rng = np.random.default_rng(1)
    k1, k2 = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    q1, q2 = 2 * np.pi * k1 / 4, 2 * np.pi * k2 / 4
    omega = 1.0 + 2.0 * np.sqrt(np.sin(q1 / 2) ** 2 + np.sin(q2 / 2) ** 2)
    amp = 0.5 + rng.random(shape)
    # symmetrize under JOINT negation k -> -k (the only exact symmetry)
    neg = lambda a: a[(4 - k1) % 4, (4 - k2) % 4]  # noqa: E731
    amp = 0.5 * (amp + neg(amp))
    times = np.arange(tlen) * dt
    s_qt = amp[None] * np.cos(omega[None] * times[:, None, None])
    corr = np.real(np.fft.ifftn(s_qt, axes=(1, 2))).reshape(tlen, -1)
    table = dominant_frequencies(times, corr, shape)
    for row in table:
        np.testing.assert_allclose(row["omega"], omega[row["k"]], atol=0.02)


def _ed_quench_corr(n=8, h0=2.0, h1=1.0, tlen=2048, dt=0.02):
    """Exact C(r, t) for the TFIM quench h0 -> h1 from the h0 ground state.

    Returns (times, corr [T, n], E (post-quench spectrum), V, c
    (overlaps), cr_diag [dim, n] — the translation-averaged S^z S^z
    diagonal in the computational basis)."""
    lat = chain(n)
    h_pre = exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=h0).toarray()
    h_post = exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=h1).toarray()
    _, v0 = np.linalg.eigh(h_pre)
    psi0 = v0[:, 0]
    energies, vecs = np.linalg.eigh(h_post)
    c = vecs.T @ psi0
    spins = exact._spins(n).astype(np.float64)
    cr = np.stack([(spins * np.roll(spins, -r, axis=1)).mean(axis=1) / 4.0
                   for r in range(n)], axis=1)  # [dim, n]
    times = np.arange(1, tlen + 1) * dt
    # psi(t) in the eigenbasis, probabilities in the computational basis
    coef_t = c[None, :] * np.exp(-1j * np.outer(times, energies))
    psi_t = coef_t @ vecs.T  # [T, dim]
    corr = (np.abs(psi_t) ** 2) @ cr
    return times, corr, energies, vecs, c, cr


def _predicted_peak(k, n, energies, vecs, c, cr, t_total):
    """Dominant positive frequency of S(q, t) from the spectral
    decomposition: S(q,t) = sum_mn c_m c_n O_mn e^{i(E_m - E_n)t} with
    O = diag(sum_r cos(qr) cr[:, r]) (real: cr is r-symmetric per basis
    state). Lines closer than one resolution element merge coherently."""
    q = 2 * np.pi * k / n
    o_diag = cr @ np.cos(q * np.arange(n))
    m_eig = vecs.T @ (o_diag[:, None] * vecs)
    amp = (c[:, None] * c[None, :]) * m_eig  # real symmetric
    iu = np.triu_indices(len(energies), k=1)
    freqs = energies[iu[1]] - energies[iu[0]]
    freqs = np.abs(freqs)
    amps = 2.0 * amp[iu]
    d_omega = 2 * np.pi / t_total
    keep = freqs > 2.5 * d_omega
    freqs, amps = freqs[keep], amps[keep]
    # only EXACTLY degenerate lines (symmetry-equal gaps) add coherently;
    # distinct gaps in this spectrum are >> the FFT resolution apart
    buckets: dict[float, float] = {}
    for f, a in zip(np.round(freqs, 8), amps):
        buckets[f] = buckets.get(f, 0.0) + a
    if not buckets:
        return None, 0.0
    best_f = max(buckets, key=lambda f: abs(buckets[f]))
    return float(best_f), abs(buckets[best_f])


def test_ed_tfim_quench_spectrum_matches_gaps():
    n = 8
    times, corr, energies, vecs, c, cr = _ed_quench_corr(n=n)
    t_total = times[-1] - times[0]
    table = {row["k"][0]: row["omega"]
             for row in dominant_frequencies(times, corr, (n,))}
    checked = 0
    for k in range(1, n // 2 + 1):
        want, weight = _predicted_peak(k, n, energies, vecs, c, cr, t_total)
        if want is None or weight < 1e-3:
            continue
        np.testing.assert_allclose(table[k], want, atol=0.15)
        checked += 1
    assert checked >= 3  # the oracle must actually have bitten


def test_quench_spectrum_input_validation(tmp_path):
    times, corr, _ = _synthetic_chain(tlen=64)
    with np.testing.assert_raises(ValueError):
        structure_factor_qt(corr, (7,))  # wrong site count
    bad_times = times.copy()
    bad_times[10] += 0.7 * (times[1] - times[0])
    with np.testing.assert_raises(ValueError):
        quench_spectrum(bad_times, structure_factor_qt(corr, (16,)))
    # evolve force-writes the final row off the log_every grid: a single
    # off-grid TRAILING row is trimmed, not rejected
    tail_times = times.copy()
    tail_times[-1] = times[-2] + 0.4 * (times[1] - times[0])
    spec = quench_spectrum(tail_times, structure_factor_qt(corr, (16,)))
    ref = quench_spectrum(times[:-1], structure_factor_qt(corr[:-1], (16,)))
    np.testing.assert_allclose(spec["peak_omega"], ref["peak_omega"])
    p = tmp_path / "empty.csv"
    p.write_text("t,c0,c1\n")
    with np.testing.assert_raises(ValueError):
        read_corr_csv(str(p))


def test_cli_quench_spectrum_roundtrip(tmp_path):
    from qmcnn_tpu.analyze import main

    times, corr, omega = _synthetic_chain(n=8, tlen=256)
    path = tmp_path / "corr.csv"
    with open(path, "w") as f:
        f.write("t," + ",".join(f"c{r}" for r in range(8)) + "\n")
        for t, row in zip(times, corr):
            f.write(",".join([f"{t:.6f}"] + [f"{v:.8f}" for v in row])
                    + "\n")
    table = main([str(path), "--quench-spectrum", "--top", "3"])
    direct = dominant_frequencies(times, corr, (8,))
    assert [r["k"] for r in table] == [r["k"] for r in direct]
    for got, want in zip(table, direct):
        # CSV writes 8 decimals; the table must match to that precision
        np.testing.assert_allclose(got["omega"], want["omega"], rtol=1e-6)
    # the loudest recovered mode matches its planted frequency
    k0 = table[0]["k"][0]
    np.testing.assert_allclose(table[0]["omega"], omega[k0], atol=0.05)


def test_evolve_corr_to_spectrum_end_to_end(tmp_path):
    """Full pipeline: evolve --corr-csv (real-time full-sum t-VMC on a
    random RBM state quenched under TFIM h=2) -> analyze extraction; the
    omega(q) table must match the same extraction run on EXACT
    Schrodinger evolution of the same initial vector (the t-VMC
    integrator/manifold error budget, not the FFT resolution, sets the
    tolerance)."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import build_model
    from qmcnn_tpu.evolve import evolve
    from qmcnn_tpu.models.cnn import log_psi_apply
    from qmcnn_tpu.ops.tdvp import all_states

    n = 6
    tlen, dt = 300, 0.02
    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(n,)),
        model=cfglib.ModelConfig(kind="rbm", rbm_alpha=4,
                                 rbm_tie_translations=False,
                                 complex_params=True, param_scale=0.03),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim", h=2.0),
        run=cfglib.RunConfig(seed=2, chunk_size=None),
    )
    corr_csv = str(tmp_path / "corr.csv")
    evolve(cfg, mode="real", dt=dt, n_steps=tlen, solver="minsr",
           integrator="heun", sampling="fullsum", corr_csv=corr_csv,
           log_every=1)
    times, corr = read_corr_csv(corr_csv)
    assert times.size == tlen

    # exact propagation of the same initial vector
    lat = chain(n)
    model = build_model(cfg, lat)
    params = model.init(jax.random.key(cfg.run.seed),
                        jnp.ones((1, n), jnp.float32))
    states = jnp.asarray(all_states(n))
    lp = log_psi_apply(model, params, states)
    psi0 = np.exp(lp.to_numpy().astype(np.complex128))
    psi0 = psi0 / np.linalg.norm(psi0)
    h_sp = exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=2.0).tocsc()
    spins = exact._spins(n).astype(np.float64)
    cr = np.stack([(spins * np.roll(spins, -r, axis=1)).mean(axis=1) / 4.0
                   for r in range(n)], axis=1)
    # evolve logs observables of the PRE-update state: row i (labeled
    # (i+1) dt) is the state at t = i dt
    psi_t = spla.expm_multiply(-1j * h_sp * dt, psi0,
                               start=0, stop=tlen - 1, num=tlen,
                               endpoint=True)
    corr_exact = (np.abs(psi_t) ** 2) @ cr

    got = {r["k"]: r for r in dominant_frequencies(times, corr, (n,))}
    want = {r["k"]: r for r in dominant_frequencies(times, corr_exact, (n,))}
    # compare where the exact signal actually has a line (power above
    # 1% of the loudest mode)
    p_max = max(r["power"] for r in want.values())
    checked = 0
    for k, w in want.items():
        if w["power"] < 0.01 * p_max:
            continue
        np.testing.assert_allclose(got[k]["omega"], w["omega"], rtol=0.08)
        checked += 1
    assert checked >= 2


def test_read_corr_csv_truncates_at_first_nan_row(tmp_path):
    """A capacity-limit blowup NaNs the tail of a t-VMC corr history; the
    loader keeps the valid prefix (observed: chain-12 full-sum quench,
    NaN from t~1.8) and refuses an all-NaN file."""
    from qmcnn_tpu.ops.spectroscopy import read_corr_csv

    p = tmp_path / "c.csv"
    p.write_text("t,c0,c1\n"
                 "0.0,1.0,0.5\n"
                 "0.1,0.9,0.4\n"
                 "0.2,nan,nan\n"
                 "0.3,nan,nan\n")
    t, c = read_corr_csv(str(p))
    assert t.shape == (2,) and c.shape == (2, 2)
    assert np.isfinite(c).all() and t[-1] == 0.1

    bad = tmp_path / "allnan.csv"
    bad.write_text("t,c0,c1\nnan,nan,nan\n")
    with np.testing.assert_raises(ValueError):
        read_corr_csv(str(bad))
