"""SMA (Feynman) magnon dispersion (ops/sma.py).

Oracles, all dense and independent of the implementation's closed form:

- the first-moment formula against a literal double-commutator matrix
  expectation (1/2N) <psi|[[S^z_q, H], S^z_{-q}]|psi> on exact ground
  states (isotropic chain, XXZ chain, J1-J2 chain, 3x3 square);
- the structure-factor leg against <|S^z_q|^2>/N computed from the same
  state (pins the FFT normalization the ratio relies on);
- the Feynman inequality omega_SMA(q) >= E_min(q) - E_0 against the full
  exact spectrum, with E_min(q) the lowest eigenstate S^z_q actually
  connects to the ground state;
- shell extraction structure (couplings, displacement coverage, guards).
"""
import numpy as np
import pytest

from qmcnn_tpu.lattice import chain, honeycomb, square
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import TFIM, Heisenberg
from qmcnn_tpu.ops.sma import exchange_shells, sma_dispersion


def _szq_diag(lattice, q_index):
    """Diagonal vector of S^z_q = sum_j e^{-i q.r_j} S^z_j over all 2^N
    basis states, q on the reciprocal index grid (same grid as fftn)."""
    n = lattice.n_sites
    shape = np.asarray(lattice.shape, dtype=np.float64)
    qfrac = np.asarray(np.unravel_index(q_index, lattice.shape),
                       dtype=np.float64) / shape
    phases = np.exp(-2j * np.pi * (lattice.coords @ qfrac))
    s = exact.all_configs(n).astype(np.float64)  # [2^n, n] of +-1
    return (s / 2.0) @ phases  # [2^n] complex


def _exact_ct(psi, lattice, didx):
    """C_t(delta) = (1/N) sum_i <Sx_i Sx_{i+d} + Sy_i Sy_{i+d}> from a
    dense state, via the transverse-only Heisenberg builder (delta=0)."""
    n = lattice.n_sites
    shape = np.asarray(lattice.shape)
    coords = lattice.coords
    pairs = np.asarray(
        [(i, int(np.ravel_multi_index(((coords[i] + coords[didx]) %
                                       shape).T, tuple(lattice.shape))))
         for i in range(n)])
    op = exact.sparse_heisenberg(n, pairs, j=1.0, delta=0.0)
    return float(psi @ (op @ psi)) / float(psi @ psi) / n


def _exact_szsz_corr(psi, lattice):
    """[n_sites] C(r) = (1/N) sum_i <S^z_i S^z_{i+r}> from a dense state."""
    n = lattice.n_sites
    s = exact.all_configs(n).astype(np.float64) / 2.0
    w = psi * psi / float(psi @ psi)
    shape = np.asarray(lattice.shape)
    coords = lattice.coords
    out = np.zeros(n)
    for r in range(n):
        perm = np.ravel_multi_index(
            ((coords + coords[r]) % shape).T, tuple(lattice.shape))
        out[r] = float(w @ ((s * s[:, perm]).mean(axis=1)))
    return out


CASES = [
    ("chain8_iso", chain(8), dict(j=1.0)),
    ("chain8_xxz", chain(8), dict(j=1.0, delta=0.5)),
    ("chain8_j1j2", chain(8), dict(j=1.0, j2=0.4)),
    ("square3x3", square(3), dict(j=1.0, marshall=False)),
]


def _dense_setup(lat, kw):
    ham = Heisenberg(lattice=lat, marshall=kw.pop("marshall", False), **kw)
    h = exact.sparse_heisenberg(
        lat.n_sites, lat.nn_bonds, j=ham.j,
        nnn_bonds=lat.nnn_bonds if ham.j2 else None,
        j2=ham.j2, delta=ham.delta).todense()
    h = np.asarray(h)
    evals, evecs = np.linalg.eigh(h)
    return ham, h, evals, evecs


@pytest.mark.parametrize("name,lat,kw", CASES, ids=[c[0] for c in CASES])
def test_first_moment_and_sq_match_dense(name, lat, kw):
    ham, h, evals, evecs = _dense_setup(lat, kw)
    psi = evecs[:, 0]
    shells = exchange_shells(ham, lat)
    ct = {d: _exact_ct(psi, lat, d) for _, d in shells}
    corr = _exact_szsz_corr(psi, lat)
    f, sq, _ = sma_dispersion(shells, ct, corr, lat)
    n = lat.n_sites
    for q_index in range(n):
        szq = _szq_diag(lat, q_index)
        # S(q) leg: (1/N) <S^z_{-q} S^z_q> (diagonal operator)
        w = psi * psi
        want_sq = float(w @ np.abs(szq) ** 2) / n
        got_sq = sq[np.unravel_index(q_index, lat.shape)]
        np.testing.assert_allclose(got_sq, want_sq, rtol=1e-9, atol=1e-11)
        # f(q) leg: (1/2N) <[[S^z_q, H], S^z_{-q}]> via literal matrices
        a = szq[:, None] * h - h * szq[None, :]        # [S^z_q, H]
        dc = a * np.conj(szq)[None, :] - np.conj(szq)[:, None] * a
        want_f = float(np.real(psi @ (dc @ psi))) / (2.0 * n)
        got_f = f[np.unravel_index(q_index, lat.shape)]
        # rtol covers the Hamiltonian's float32 coupling quantization
        # (j2=0.4 rounds at ~1.5e-8 relative vs the float64 oracle)
        np.testing.assert_allclose(got_f, want_f, rtol=1e-6, atol=1e-10)


# the bound test needs a non-degenerate ground state: the 3x3 PBC square
# is frustrated by its odd torus cycles (degenerate ground multiplet
# reachable at every q), so the 2D row here is the bipartite 2x4 torus
BOUND_CASES = CASES[:3] + [("square2x4", square(2, 4),
                            dict(j=1.0, marshall=False))]


@pytest.mark.parametrize("name,lat,kw", BOUND_CASES,
                         ids=[c[0] for c in BOUND_CASES])
def test_feynman_bound_vs_exact_spectrum(name, lat, kw):
    ham, h, evals, evecs = _dense_setup(lat, kw)
    psi = evecs[:, 0]
    shells = exchange_shells(ham, lat)
    ct = {d: _exact_ct(psi, lat, d) for _, d in shells}
    corr = _exact_szsz_corr(psi, lat)
    _, sq, omega = sma_dispersion(shells, ct, corr, lat)
    n = lat.n_sites
    checked = 0
    for q_index in range(1, n):
        o = omega[np.unravel_index(q_index, lat.shape)]
        if not np.isfinite(o):
            continue
        szq_psi = _szq_diag(lat, q_index) * psi
        weights = np.abs(evecs.conj().T @ szq_psi) ** 2
        reachable = weights > 1e-10 * weights.sum()
        gaps = evals[reachable] - evals[0]
        if gaps.min() <= 1e-8:
            # degenerate ground multiplet reachable at this q (the 3x3
            # PBC square is frustrated by its odd torus cycles): the
            # bound is >= 0, trivially satisfied — nothing to check
            continue
        assert o >= gaps.min() - 1e-9, (
            f"{name} q={q_index}: omega_SMA {o} < exact gap {gaps.min()}")
        checked += 1
    assert checked >= n // 2  # the bound was actually exercised


def test_sma_is_exact_when_single_mode_saturates():
    """Two-site check: S^z_q=pi |singlet> IS the m=0 triplet, so the SMA
    bound saturates at the exact gap J (analytic: f = J/2, S = 1/2)."""
    lat = chain(2)
    ham = Heisenberg(lattice=lat, marshall=False)
    _, h, evals, evecs = _dense_setup(lat, dict(j=1.0))
    psi = evecs[:, 0]
    shells = exchange_shells(ham, lat)
    ct = {d: _exact_ct(psi, lat, d) for _, d in shells}
    corr = _exact_szsz_corr(psi, lat)
    f, sq, omega = sma_dispersion(shells, ct, corr, lat)
    # S^z_pi |singlet> = |triplet, m=0> exactly (unit norm), so
    # S(pi) = 1/N = 1/2 and f = gap * S = J/2; omega saturates at gap J
    np.testing.assert_allclose(f[1], 0.5, rtol=1e-12)
    np.testing.assert_allclose(sq[1], 0.5, rtol=1e-12)
    np.testing.assert_allclose(omega[1], evals[1] - evals[0], rtol=1e-12)
    assert abs((evals[1] - evals[0]) - 1.0) < 1e-12  # the gap is J


def test_exchange_shells_structure():
    # square NN: two displacements (x, y), coupling 1.0 each
    lat = square(4)
    ham = Heisenberg(lattice=lat, marshall=True)
    shells = exchange_shells(ham, lat)
    assert len(shells) == 2
    assert all(abs(j - 1.0) < 1e-12 for j, _ in shells)
    deltas = sorted(tuple(lat.coords[d]) for _, d in shells)
    # canonical orientation may be +-delta; compare modulo L
    assert len(deltas) == 2
    # J1-J2: four shells (x, y, two diagonals), J2 carries its coupling
    ham2 = Heisenberg(lattice=lat, j2=0.5, marshall=True)
    shells2 = exchange_shells(ham2, lat)
    assert len(shells2) == 4
    assert sorted(round(j, 6) for j, _ in shells2) == [0.5, 0.5, 1.0, 1.0]
    # chain: one shell
    assert len(exchange_shells(
        Heisenberg(lattice=chain(8), marshall=True), chain(8))) == 1


def test_exchange_shells_guards():
    lat = chain(8)
    with pytest.raises(ValueError, match="Heisenberg-class"):
        exchange_shells(TFIM(lattice=lat, h=1.0), lat)
    hc = honeycomb(2, 2)
    with pytest.raises(ValueError, match="site grid"):
        exchange_shells(Heisenberg(lattice=hc, marshall=True), hc)
    ob = chain(8, pbc=False)
    with pytest.raises(ValueError, match="periodic"):
        exchange_shells(Heisenberg(lattice=ob, marshall=False), ob)


def test_self_inverse_displacement_weighting():
    """L=2 axis: delta == -delta mod L halves the bond orbit; the 0.5
    shell weight must keep the dense identity exact (regression for the
    cnt == n//2 branch)."""
    lat = square(2, 4)
    ham = Heisenberg(lattice=lat, marshall=False)
    h = np.asarray(exact.sparse_heisenberg(
        lat.n_sites, lat.nn_bonds, j=1.0).todense())
    evals, evecs = np.linalg.eigh(h)
    psi = evecs[:, 0]
    shells = exchange_shells(ham, lat)
    ct = {d: _exact_ct(psi, lat, d) for _, d in shells}
    corr = _exact_szsz_corr(psi, lat)
    f, sq, _ = sma_dispersion(shells, ct, corr, lat)
    n = lat.n_sites
    for q_index in range(n):
        szq = _szq_diag(lat, q_index)
        a = szq[:, None] * h - h * szq[None, :]
        dc = a * np.conj(szq)[None, :] - np.conj(szq)[:, None] * a
        want_f = float(np.real(psi @ (dc @ psi))) / (2.0 * n)
        got_f = f[np.unravel_index(q_index, lat.shape)]
        # rtol covers the Hamiltonian's float32 coupling quantization
        # (j2=0.4 rounds at ~1.5e-8 relative vs the float64 oracle)
        np.testing.assert_allclose(got_f, want_f, rtol=1e-6, atol=1e-10)


def test_measure_sma_integration(tmp_path):
    """train -> checkpoint -> measure(sma=True): report structure, the
    Feynman-positive dispersion, and the cross-estimator identity
    spin_spin_nn == szsz_corr[nn] + C_t(nn) (all three are measured on
    the SAME walker samples, so it holds to float tolerance, not MC
    error)."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.measure import measure
    from qmcnn_tpu.train import train
    from qmcnn_tpu.utils.checkpoint import CheckpointManager

    cfg = cfglib.from_yaml("""
name: sma_smoke
lattice: {shape: [8]}
model: {channels: [4]}
hamiltonian: {kind: heisenberg}
sampler: {n_walkers: 64, move: exchange, n_therm_sweeps: 3}
optimizer: {kind: sgd, lr: 0.05}
run: {n_steps: 4, log_every: 2, ckpt_every: 2}
""")
    ck = CheckpointManager(str(tmp_path / "ck"))
    train(cfg, ckpt_manager=ck)
    report = measure(cfg, str(tmp_path / "ck"), n_samples=3,
                     sweeps_between=1, therm_sweeps=2, sma=True)
    ck.close()
    n = 8
    assert len(report["sma_omega"]) == n
    assert report["sma_omega"][0] is None  # q=0: 0/0 in the S^z sector
    finite = [o for o in report["sma_omega"][1:] if o is not None]
    assert len(finite) >= n // 2
    assert all(o > 0 for o in finite)  # f > 0 and S > 0 for the AF
    assert report["sma_gap_bound"] == min(finite)
    ct_nn = report["sma_transverse_corr"]["1"]
    np.testing.assert_allclose(
        report["spin_spin_nn"], report["szsz_corr"][1] + ct_nn,
        rtol=1e-4, atol=1e-5)


def test_measure_sma_refuses_tfim(tmp_path):
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.measure import measure
    from qmcnn_tpu.train import train
    from qmcnn_tpu.utils.checkpoint import CheckpointManager

    cfg = cfglib.from_yaml("""
name: sma_tfim_guard
lattice: {shape: [6]}
model: {channels: [3]}
hamiltonian: {kind: tfim, h: 1.0}
sampler: {n_walkers: 32, move: flip, n_therm_sweeps: 2}
optimizer: {kind: sgd, lr: 0.05}
run: {n_steps: 2, log_every: 2, ckpt_every: 2}
""")
    ck = CheckpointManager(str(tmp_path / "ck"))
    train(cfg, ckpt_manager=ck)
    ck.close()
    with pytest.raises(ValueError, match="Heisenberg-class"):
        measure(cfg, str(tmp_path / "ck"), n_samples=1,
                sweeps_between=1, therm_sweeps=1, sma=True)
