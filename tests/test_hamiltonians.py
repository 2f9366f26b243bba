"""Hamiltonian unit tests: connected()/diag() vs an independent dense build.

Oracle strategy (SURVEY.md section 4): the bit-twiddling sparse builders in
ops/exact.py are constructed independently of the jax connected-enumeration
path; agreement of the full dense matrices catches matrix-element signs,
Marshall-rule handling, and mask bugs exactly.
"""
import numpy as np
import pytest

from qmcnn_tpu.lattice import chain, square
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import TFIM, Heisenberg, j1j2


def dense_oracle_tfim(lat, j, h):
    return exact.sparse_tfim(lat.n_sites, lat.nn_bonds, j=j, h=h).toarray()


def test_tfim_matches_dense():
    lat = chain(8)
    ham = TFIM(lat, j=1.0, h=0.7)
    got = exact.dense_from_hamiltonian(ham).real
    want = dense_oracle_tfim(lat, 1.0, 0.7)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_heisenberg_chain_matches_dense_no_marshall():
    lat = chain(8)
    ham = Heisenberg(lat, j=1.0, marshall=False)
    got = exact.dense_from_hamiltonian(ham).real
    want = exact.sparse_heisenberg(lat.n_sites, lat.nn_bonds, j=1.0).toarray()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_heisenberg_marshall_is_rotated_h():
    """connected() with marshall=True must equal D H D exactly."""
    lat = chain(8)
    ham = Heisenberg(lat, j=1.0, marshall=True)
    got = exact.dense_from_hamiltonian(ham).real
    h_plain = exact.sparse_heisenberg(lat.n_sites, lat.nn_bonds, j=1.0).toarray()
    d = exact.marshall_signs(lat.n_sites, lat.sublattice_mask)
    want = d[:, None] * h_plain * d[None, :]
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and the spectrum is untouched by the rotation
    np.testing.assert_allclose(
        np.linalg.eigvalsh(got), np.linalg.eigvalsh(h_plain), atol=1e-8
    )


def test_heisenberg_2d_matches_dense():
    lat = square(2, 4)
    ham = Heisenberg(lat, j=1.0, marshall=False)
    got = exact.dense_from_hamiltonian(ham).real
    want = exact.sparse_heisenberg(lat.n_sites, lat.nn_bonds, j=1.0).toarray()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_j1j2_matches_dense_with_marshall():
    lat = square(2, 4)
    ham = j1j2(lat, j1=1.0, j2=0.5, marshall=True)
    got = exact.dense_from_hamiltonian(ham).real
    h_plain = exact.sparse_heisenberg(
        lat.n_sites, lat.nn_bonds, j=1.0, nnn_bonds=lat.nnn_bonds, j2=0.5
    ).toarray()
    d = exact.marshall_signs(lat.n_sites, lat.sublattice_mask)
    want = d[:, None] * h_plain * d[None, :]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_j1j2_nnn_mels_positive_under_marshall():
    """J2 bonds connect the same sublattice: Marshall leaves them +J2/2."""
    lat = square(2, 4)
    ham = j1j2(lat, j1=1.0, j2=0.5, marshall=True)
    n_nn = len(lat.nn_bonds)
    mel = np.asarray(ham._offdiag_mel)
    assert np.all(mel[:n_nn] == -0.5)   # -J1/2
    assert np.all(mel[n_nn:] == 0.25)   # +J2/2


def test_hermiticity_of_connected_build():
    lat = chain(6)
    for ham in [TFIM(lat, h=1.3), Heisenberg(lat), j1j2(square(2, 4))]:
        m = exact.dense_from_hamiltonian(ham).real
        np.testing.assert_allclose(m, m.T, atol=1e-6)


def test_known_ground_energies():
    """Physics pin: 1D TFIM at criticality (J=h=1), exact finite-size value.

    E0 = -sum over k of 2*sqrt(1+g^2-2g cos k) with g=1 in sigma convention:
    for N=8 PBC the Lanczos result must match the free-fermion formula.
    """
    n = 8
    lat = chain(n)
    e = exact.ground_energy(exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=1.0))
    # Free-fermion solution, antiperiodic sector (even fermion parity):
    # E0 = -sum_k sqrt(2 + 2 cos k), k = (2m+1) pi / N
    k = (2 * np.arange(n) + 1) * np.pi / n
    e_exact = -np.sum(np.sqrt(2 + 2 * np.cos(k)))
    np.testing.assert_allclose(e, e_exact, rtol=1e-10)


def test_heisenberg_chain_ground_energy_value():
    # N=8 Heisenberg chain (sigma/2 convention): known ED value
    lat = chain(8)
    e = exact.ground_energy(exact.sparse_heisenberg(8, lat.nn_bonds, j=1.0))
    # Bethe ansatz finite chain N=8: E0/J = -3.6510934...
    np.testing.assert_allclose(e, -3.6510934089371783, rtol=1e-9)


def test_first_touch_inside_jit_no_tracer_leak():
    """Regression: Hamiltonian constants must not be materialized as jnp
    arrays inside a trace and cached (UnexpectedTracerError across jits)."""
    import jax
    import jax.numpy as jnp

    lat = chain(6)
    for ham in [TFIM(lat), Heisenberg(lat), j1j2(square(2, 4))]:
        n = ham.lattice.n_sites
        s = jnp.ones((3, n), jnp.float32)

        @jax.jit
        def first(s):
            sp, mel, mask = ham.connected_batch(s)
            return ham.diag_batch(s) + (mel * mask).sum(-1)

        first(s).block_until_ready()

        @jax.jit
        def second(s):  # second, distinct trace must reuse cleanly
            sp, mel, mask = ham.connected_batch(s)
            return (mel * mask).sum()

        second(s).block_until_ready()


def test_tfim_2d_matches_dense():
    """TFIM is generic over lattices: 2D case vs the independent builder."""
    lat = square(2, 4)
    ham = TFIM(lat, j=1.0, h=1.3)
    got = exact.dense_from_hamiltonian(ham).real
    want = exact.sparse_tfim(lat.n_sites, lat.nn_bonds, j=1.0, h=1.3).toarray()
    np.testing.assert_allclose(got, want, atol=1e-6)


def _kron_xxz(n, bonds, j=1.0, delta=1.0):
    """Fully independent XXZ dense build: Kronecker products of spin-1/2
    operators, H = J sum_b [Sx Sx + Sy Sy + delta Sz Sz]. Site-to-bit
    convention must match ops/exact._spins (site i = bit i, LSB first)."""
    sx = np.array([[0, 0.5], [0.5, 0]], dtype=complex)
    sy = np.array([[0, -0.5j], [0.5j, 0]], dtype=complex)
    sz = np.array([[0.5, 0], [0, -0.5]], dtype=complex)
    eye = np.eye(2, dtype=complex)

    def site_op(op, i):
        # ops/exact encodes spin i in bit i of the state index with
        # s_i = +1 when the bit is SET; index = sum_i bit_i 2^i. numpy kron
        # puts the FIRST factor on the most significant axis, so site i
        # must be placed at position n-1-i, and the basis order within a
        # site must be (bit=1, bit=0) -> flip the 2x2 to match sz|1> = +.
        flip = np.array([[0, 1], [1, 0]], dtype=complex)
        o = flip @ op @ flip  # reorder basis (|0>,|1>) -> (|1>,|0>)
        mats = [eye] * n
        mats[n - 1 - i] = o
        out = np.array([[1.0]], dtype=complex)
        for m in mats:
            out = np.kron(out, m)
        return out

    dim = 1 << n
    h = np.zeros((dim, dim), dtype=complex)
    for (a, b) in np.asarray(bonds):
        h += j * (site_op(sx, a) @ site_op(sx, b)
                  + site_op(sy, a) @ site_op(sy, b)
                  + delta * (site_op(sz, a) @ site_op(sz, b)))
    assert np.allclose(h.imag, 0.0, atol=1e-12)
    return h.real


@pytest.mark.parametrize("delta", [0.0, 0.6, 1.0, 1.8])
def test_xxz_matches_independent_kron_dense(delta):
    """XXZ anisotropy: both the jax connected()/diag() path and the
    bit-twiddling ED builder must equal a fully independent Kronecker
    construction of H = J sum [SxSx + SySy + delta SzSz]."""
    lat = chain(6)
    want = _kron_xxz(6, lat.nn_bonds, j=1.0, delta=delta)
    ham = Heisenberg(lat, j=1.0, marshall=False, delta=delta)
    got = exact.dense_from_hamiltonian(ham).real
    np.testing.assert_allclose(got, want, atol=1e-10)
    got_sp = exact.sparse_heisenberg(lat.n_sites, lat.nn_bonds, j=1.0,
                                     delta=delta).toarray()
    np.testing.assert_allclose(got_sp, want, atol=1e-10)


def test_xxz_marshall_spectrum_invariant():
    lat = chain(6)
    h_rot = exact.dense_from_hamiltonian(
        Heisenberg(lat, j=1.0, marshall=True, delta=0.5)).real
    h_plain = exact.dense_from_hamiltonian(
        Heisenberg(lat, j=1.0, marshall=False, delta=0.5)).real
    np.testing.assert_allclose(np.linalg.eigvalsh(h_rot),
                               np.linalg.eigvalsh(h_plain), atol=1e-8)


def test_tfim_longitudinal_field_matches_dense():
    lat = chain(8)
    ham = TFIM(lat, j=1.0, h=0.7, hz=0.3)
    got = exact.dense_from_hamiltonian(ham).real
    want = exact.sparse_tfim(lat.n_sites, lat.nn_bonds, j=1.0, h=0.7,
                             hz=0.3).toarray()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_j1j2_chain_matches_dense():
    lat = chain(8)
    ham = j1j2(lat, j1=1.0, j2=0.5, marshall=False)
    got = exact.dense_from_hamiltonian(ham).real
    want = exact.sparse_heisenberg(lat.n_sites, lat.nn_bonds, j=1.0,
                                   nnn_bonds=lat.nnn_bonds,
                                   j2=0.5).toarray()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_majumdar_ghosh_point_is_exact():
    """1D J1-J2 at J2/J1 = 1/2 (Majumdar-Ghosh): the ground energy of the
    periodic even chain is EXACTLY -3 N J / 8 (two degenerate dimer
    coverings) — an analytic pin on the NNN bond construction and the ED
    builder at a nontrivial coupling."""
    n = 12
    lat = chain(n)
    h = exact.sparse_heisenberg(n, lat.nn_bonds, j=1.0,
                                nnn_bonds=lat.nnn_bonds, j2=0.5)
    import scipy.sparse.linalg as spla
    evals = np.sort(spla.eigsh(h.asfptype(), k=3, which="SA",
                               return_eigenvectors=False))
    np.testing.assert_allclose(evals[0], -3.0 * n / 8.0, atol=1e-9)
    np.testing.assert_allclose(evals[1], -3.0 * n / 8.0, atol=1e-9)  # 2-fold
    assert evals[2] > -3.0 * n / 8.0 + 1e-6


def test_j1j2_triangular_matches_dense():
    """Triangular J1-J2 (both shells frustrated): connected() vs the
    independent bit-level builder over NN + sqrt(3)-shell NNN bonds.
    Enables the J1-J2 triangular spin-liquid window (J2/J1 ~ 0.07-0.15)
    with the existing Heisenberg machinery; marshall must stay off."""
    from qmcnn_tpu.lattice import triangular

    lat = triangular(3, 3)
    ham = j1j2(lat, j1=1.0, j2=0.12, marshall=False)
    got = exact.dense_from_hamiltonian(ham).real
    want = exact.sparse_heisenberg(
        lat.n_sites, lat.nn_bonds, j=1.0, nnn_bonds=lat.nnn_bonds, j2=0.12
    ).toarray()
    np.testing.assert_allclose(got, want, atol=1e-6)
    # shell counts on a torus big enough that sqrt(3)-offsets don't alias
    # (on 3x3 the period-3 offsets wrap pairs of NNN bonds onto each other
    # — the dense parity above covers that degenerate case too)
    big = triangular(4, 4)
    assert len(big.nn_bonds) == 3 * big.n_sites
    assert len(big.nnn_bonds) == 3 * big.n_sites
    with pytest.raises(ValueError):
        j1j2(lat, j1=1.0, j2=0.12, marshall=True)
