"""Native C++ ED matvec (ctypes) and Bethe-ansatz solver tests."""
import numpy as np
import pytest

from qmcnn_tpu.lattice import chain, square
from qmcnn_tpu.ops import bethe, exact
from qmcnn_tpu.ops import exact_native as edn


@pytest.mark.parametrize("n", [8, 12, 16])
def test_bethe_matches_ed(n):
    eb = bethe.ground_energy(n)
    ee = exact.ground_energy(exact.sparse_heisenberg(n, chain(n).nn_bonds))
    np.testing.assert_allclose(eb, ee, rtol=1e-11)


def test_bethe_n40_value_and_limit():
    e40 = bethe.ground_energy(40)
    # pinned: the BASELINE.md target for config 2
    np.testing.assert_allclose(e40, -17.746522788, rtol=1e-8)
    # finite-size energy sits above the thermodynamic limit and converges
    e_inf = bethe.energy_per_site_infinite()
    assert abs(e40 / 40 - e_inf) < 1e-3
    assert abs(bethe.ground_energy(100) / 100 - e_inf) < 2e-4
    with pytest.raises(ValueError):
        bethe.ground_energy(7)


needs_native = pytest.mark.skipif(not edn.available(),
                                  reason="no C++ toolchain")


@needs_native
def test_native_tfim_matvec_matches_sparse():
    n = 10
    lat = chain(n)
    sp = exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=0.7)
    op = edn.tfim_operator(n, lat.nn_bonds, j=1.0, h=0.7)
    rng = np.random.default_rng(0)
    for _ in range(3):
        v = rng.normal(size=1 << n)
        np.testing.assert_allclose(op @ v, sp @ v, rtol=1e-12, atol=1e-12)


@needs_native
def test_native_heisenberg_matvec_matches_sparse():
    lat = square(2, 4)
    n = lat.n_sites
    bonds = np.concatenate([lat.nn_bonds, lat.nnn_bonds])
    coup = np.concatenate([np.ones(len(lat.nn_bonds)),
                           0.5 * np.ones(len(lat.nnn_bonds))])
    sp = exact.sparse_heisenberg(n, lat.nn_bonds, j=1.0,
                                 nnn_bonds=lat.nnn_bonds, j2=0.5)
    op = edn.heisenberg_operator(n, bonds, coup)
    rng = np.random.default_rng(1)
    for _ in range(3):
        v = rng.normal(size=1 << n)
        np.testing.assert_allclose(op @ v, sp @ v, rtol=1e-12, atol=1e-12)


@needs_native
def test_native_ground_energies():
    n = 14
    lat = chain(n)
    e_native = edn.ground_energy(edn.heisenberg_operator(n, lat.nn_bonds))
    np.testing.assert_allclose(e_native, bethe.ground_energy(n), rtol=1e-9)
    e_tfim = edn.ground_energy(edn.tfim_operator(n, lat.nn_bonds))
    e_tfim_sp = exact.ground_energy(exact.sparse_tfim(n, lat.nn_bonds))
    np.testing.assert_allclose(e_tfim, e_tfim_sp, rtol=1e-10)


@pytest.mark.skipif(not edn.available(), reason="no native toolchain")
def test_sector_matvec_matches_full_hilbert():
    """Sector-restricted matvec == full matvec projected to the sector
    (combinadic ranking + Gosper enumeration oracle), J1-J2 couplings."""
    lat = square(4)
    n = lat.n_sites
    bonds = np.concatenate([lat.nn_bonds, lat.nnn_bonds])
    coup = np.concatenate([np.ones(len(lat.nn_bonds)),
                           0.5 * np.ones(len(lat.nnn_bonds))])
    op_full = edn.heisenberg_operator(n, bonds, coup)
    op_sec = edn.heisenberg_sector_operator(n, bonds, coup)
    from math import comb
    dim = comb(n, n // 2)
    assert op_sec.shape == (dim, dim)
    # basis bookkeeping: embed a random sector vector into the full space,
    # apply the full operator, pull back — must equal the sector matvec
    states = np.array(
        [b for b in range(1 << n) if bin(b).count("1") == n // 2],
        np.int64)
    rng = np.random.default_rng(0)
    v = rng.normal(size=dim)
    v_full = np.zeros(1 << n)
    v_full[states] = v
    want = (op_full @ v_full)[states]
    got = op_sec @ v
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.skipif(not edn.available(), reason="no native toolchain")
def test_sector_ground_energy_matches_full():
    """The AFM ground state lives in S^z=0: sector Lanczos == full
    Lanczos (Heisenberg chain) and == scipy sparse (J1-J2 4x4)."""
    n = 14
    lat = chain(n)
    e_sec = edn.ground_energy(
        edn.heisenberg_sector_operator(n, lat.nn_bonds))
    e_full = edn.ground_energy(edn.heisenberg_operator(n, lat.nn_bonds))
    np.testing.assert_allclose(e_sec, e_full, rtol=1e-10)

    lat2 = square(4)
    bonds = np.concatenate([lat2.nn_bonds, lat2.nnn_bonds])
    coup = np.concatenate([np.ones(len(lat2.nn_bonds)),
                           0.5 * np.ones(len(lat2.nnn_bonds))])
    e_sec2 = edn.ground_energy(
        edn.heisenberg_sector_operator(16, bonds, coup))
    e_sp = exact.ground_energy(exact.sparse_heisenberg(
        16, lat2.nn_bonds, nnn_bonds=lat2.nnn_bonds, j2=0.5))
    np.testing.assert_allclose(e_sec2, e_sp, rtol=1e-9)
