import numpy as np
import pytest

from qmcnn_tpu.lattice import Lattice, chain, square


def test_chain_bonds():
    lat = chain(6)
    assert lat.n_sites == 6
    bonds = {tuple(sorted(b)) for b in lat.nn_bonds.tolist()}
    assert bonds == {(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)}


def test_chain_open():
    lat = chain(5, pbc=False)
    assert len(lat.nn_bonds) == 4


def test_chain_nnn():
    lat = chain(6)
    bonds = {tuple(sorted(b)) for b in lat.nnn_bonds.tolist()}
    assert bonds == {(0, 2), (1, 3), (2, 4), (3, 5), (0, 4), (1, 5)}


def test_square_bond_counts():
    lat = square(4)
    assert lat.n_sites == 16
    assert len(lat.nn_bonds) == 2 * 16  # +x and +y under PBC
    assert len(lat.nnn_bonds) == 2 * 16  # both diagonals
    # no duplicated pairs
    pairs = [tuple(sorted(b)) for b in lat.nn_bonds.tolist()]
    assert len(pairs) == len(set(pairs))


def test_square_bonds_are_neighbors():
    lat = square(4, 6)
    for (i, j) in lat.nn_bonds:
        ci, cj = lat.coords[i], lat.coords[j]
        d = (cj - ci) % np.asarray(lat.shape)
        d = np.minimum(d, np.asarray(lat.shape) - d)
        assert d.sum() == 1, (ci, cj)


def test_sublattice_checkerboard():
    lat = square(4)
    for (i, j) in lat.nn_bonds:
        assert lat.sublattice_mask[i] != lat.sublattice_mask[j]
    for (i, j) in lat.nnn_bonds:
        assert lat.sublattice_mask[i] == lat.sublattice_mask[j]
    assert lat.is_bipartite_compatible


def test_odd_chain_not_bipartite():
    assert not chain(5).is_bipartite_compatible


def test_validation():
    with pytest.raises(ValueError):
        Lattice((2, 2, 2))
    with pytest.raises(ValueError):
        Lattice((1,))
