"""Kagome-lattice geometry tests: 3-site-basis bond structure validated
against a CARTESIAN distance oracle (NN shell a/2, NNN shell sqrt(3)a/2),
non-bipartite guards, dense-oracle Hamiltonian parity, cell-translation
invariance of the basis-channel CNN, and a short frustrated VMC train vs ED.

Physics anchor: the kagome Heisenberg AF is the canonical maximally
frustrated 2D lattice (corner-sharing triangles, degree 4); tests validate
against our OWN ED on small periodic cell grids — no literature numbers
asserted.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.builder import build
from qmcnn_tpu.configs import from_yaml
from qmcnn_tpu.lattice import kagome
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import Heisenberg

A1 = np.array([1.0, 0.0])
A2 = np.array([0.5, np.sqrt(3.0) / 2.0])
BASIS_POS = np.stack([0.0 * A1, A1 / 2.0, A2 / 2.0])


def _positions(lat) -> np.ndarray:
    """[n_sites, 2] Cartesian positions (lattice constant a = 1)."""
    c = lat.coords
    return (c[:, :1] * A1 + c[:, 1:2] * A2 + BASIS_POS[c[:, 2]])


def _min_image_dist(lat, i: int, j: int) -> float:
    """Distance between sites i, j minimized over periodic images."""
    p = _positions(lat)
    lx, ly = lat.shape
    best = np.inf
    for wx in (-1, 0, 1):
        for wy in (-1, 0, 1):
            d = p[j] + (wx * lx) * A1 + (wy * ly) * A2 - p[i]
            best = min(best, float(np.linalg.norm(d)))
    return best


def test_kagome_bond_counts_and_degree():
    lat = kagome(3, 4)
    assert lat.n_sites == 36
    assert lat.basis == 3
    assert len(lat.nn_bonds) == 6 * 12      # 6 bonds per cell, degree 4
    assert len(lat.nnn_bonds) == 6 * 12     # 4 second neighbors per site
    for bonds, want_deg in [(lat.nn_bonds, 4), (lat.nnn_bonds, 4)]:
        deg = np.zeros(lat.n_sites, int)
        for i, j in bonds:
            deg[i] += 1
            deg[j] += 1
        assert np.all(deg == want_deg)


def test_kagome_bond_shells_match_cartesian_distances():
    """Every NN bond must have length exactly a/2 and every NNN bond
    exactly sqrt(3)a/2 (min over periodic images) — the geometric oracle
    that pins the basis offsets and cell-offset triples."""
    lat = kagome(4, 4)
    for i, j in lat.nn_bonds:
        np.testing.assert_allclose(_min_image_dist(lat, i, j), 0.5,
                                   atol=1e-9)
    for i, j in lat.nnn_bonds:
        np.testing.assert_allclose(_min_image_dist(lat, i, j),
                                   np.sqrt(3.0) / 2.0, atol=1e-9)
    # and the two shells are exhaustive: any pair at distance a/2 is an
    # NN bond, any at sqrt(3)a/2 an NNN bond
    nn = {(min(i, j), max(i, j)) for i, j in lat.nn_bonds}
    nnn = {(min(i, j), max(i, j)) for i, j in lat.nnn_bonds}
    for i in range(lat.n_sites):
        for j in range(i + 1, lat.n_sites):
            d = _min_image_dist(lat, i, j)
            if abs(d - 0.5) < 1e-9:
                assert (i, j) in nn
            elif abs(d - np.sqrt(3.0) / 2.0) < 1e-9:
                assert (i, j) in nnn


def test_kagome_never_bipartite():
    lat = kagome(4)
    assert not lat.is_bipartite_compatible
    with pytest.raises(ValueError, match="bipartite"):
        Heisenberg(lat, marshall=True)


def test_kagome_heisenberg_matches_dense_oracle():
    """connected()/diag() vs the independent bit-level sparse builder."""
    lat = kagome(2, 2)
    ham = Heisenberg(lat, marshall=False)
    n = lat.n_sites
    h_dense = exact.sparse_heisenberg(n, lat.nn_bonds).toarray()
    spins = np.array(list(itertools.product([1.0, -1.0], repeat=n)),
                     np.float32)[:48]
    idx = ((spins < 0).astype(np.int64)
           * (2 ** np.arange(n, dtype=np.int64))).sum(-1)
    for s_row, i_row in list(zip(spins, idx))[:10]:
        s_prime, mel, mask = ham.connected(jnp.asarray(s_row))
        diag = float(ham.diag(jnp.asarray(s_row)))
        np.testing.assert_allclose(diag, h_dense[int(i_row), int(i_row)],
                                   atol=1e-5)
        total = np.zeros(h_dense.shape[0])
        for sp, m, ok in zip(np.asarray(s_prime), np.asarray(mel),
                             np.asarray(mask)):
            if not ok:
                continue
            jdx = int(((sp < 0).astype(np.int64)
                       * (2 ** np.arange(n, dtype=np.int64))).sum())
            total[jdx] += m
        row = h_dense[int(i_row)].copy()
        row[int(i_row)] = 0.0
        np.testing.assert_allclose(total, row, atol=1e-5)


def test_cnn_invariant_under_cell_translations_only():
    """log psi invariant under CELL translations; permuting the basis
    channels (A->B->C within each cell) is not imposed by the ansatz."""
    lat = kagome(3, 4)
    model = LogPsiCNN(lattice_shape=tuple(lat.shape), channels=(4, 4),
                      basis=lat.basis, param_scale=0.3)
    params = model.init(jax.random.key(0),
                        jnp.ones((1, lat.n_sites), jnp.float32))
    s = (2.0 * jax.random.bernoulli(jax.random.key(1), 0.5,
                                    (5, lat.n_sites)) - 1.0
         ).astype(jnp.float32)
    base = log_psi_apply(model, params, s)
    for dx, dy in [(1, 0), (0, 1), (2, 3)]:
        perm = np.array([lat.site_index((c[0] + dx, c[1] + dy, c[2]))
                         for c in lat.coords])
        shifted = s[:, np.argsort(perm)]
        got = log_psi_apply(model, params, shifted)
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(base.re),
                                   rtol=1e-5, atol=1e-5)
    roll = np.arange(lat.n_sites).reshape(-1, 3)[:, [1, 2, 0]].reshape(-1)
    got = log_psi_apply(model, params, s[:, roll])
    assert not np.allclose(np.asarray(got.re), np.asarray(base.re),
                           rtol=1e-4, atol=1e-4)


def _kagome_cfg():
    return from_yaml("""
name: kagome_heis_test
lattice: {shape: [2, 3], geometry: kagome}
model: {kind: cnn, channels: [12, 12], complex_params: true, param_scale: 0.05}
hamiltonian: {kind: heisenberg, marshall: false}
sampler: {n_walkers: 256, move: exchange_anti, n_therm_sweeps: 20}
optimizer: {kind: sgd, lr: 0.05, schedule: cosine}
sr: {enabled: true, solver: minsr, diag_shift0: 0.1, diag_shift_decay: 0.97,
     diag_shift_min: 0.01}
run: {n_steps: 800, seed: 0}
""")


@pytest.mark.slow
def test_kagome_heisenberg_trains_toward_ed():
    """2x3-cell (18-site) kagome Heisenberg AF: complex basis-channel CNN
    (no sign rule exists) + minSR descends toward the exact ground energy.

    The bar is deliberately loose (15%): the kagome HAF is the hardest
    sign structure in this suite — the measured plateau of this
    small-CNN recipe is ~11% (probed at 800-1600 steps; deeper/wider
    variants either NaN under this lr or initialize dead at this scale),
    and state-of-the-art kagome NQS needs far richer ansatzes. The test
    pins (a) that the full train loop runs on a 3-site-basis geometry and
    (b) that optimization makes real progress against ED — exactness of
    the Hamiltonian itself is pinned by the dense-oracle test above.
    """
    cfg = _kagome_cfg()
    vmc, params, lattice = build(cfg)
    e_ed = exact.ground_energy(
        exact.sparse_heisenberg(lattice.n_sites, lattice.nn_bonds))
    state = vmc.init_state(jax.random.key(0), cfg.sampler.n_walkers, params)
    ids = jnp.arange(cfg.sampler.n_walkers)
    state = vmc.thermalize(state, jax.random.key(1), ids, 20)
    run = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, 100))
    energies = []
    for chunk in range(8):
        state, metrics = run(state, jax.random.key(100 + chunk))
        energies.append(np.asarray(metrics.energy_re))
    e_tail = float(np.concatenate(energies[-2:]).mean())
    rel = abs(e_tail - e_ed) / abs(e_ed)
    assert rel < 0.15, (e_tail, e_ed, rel)
