"""Honeycomb-lattice geometry tests: 2-site-basis bond structure, basis
bipartiteness (Marshall applies), dense-oracle Hamiltonian parity,
cell-translation invariance of the basis-channel CNN, builder guards, and
a short VMC train vs ED.

Physics anchor: the honeycomb Heisenberg AF is bipartite and Neel-ordered
(thermodynamic E/site ~ -0.5445 per QMC literature); tests validate against
our OWN ED on small periodic cell grids — no literature numbers asserted.
"""
import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.builder import build
from qmcnn_tpu.configs import from_yaml
from qmcnn_tpu.lattice import honeycomb
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import Heisenberg


def test_honeycomb_bond_counts_and_degree():
    lat = honeycomb(3, 4)
    assert lat.n_sites == 24
    assert lat.basis == 2
    assert len(lat.nn_bonds) == 3 * 12      # 3 bonds per cell
    assert len(lat.nnn_bonds) == 6 * 12     # 3 offsets x 2 sublattices
    deg = np.zeros(lat.n_sites, int)
    for i, j in lat.nn_bonds:
        deg[i] += 1
        deg[j] += 1
    assert np.all(deg == 3)
    deg2 = np.zeros(lat.n_sites, int)
    for i, j in lat.nnn_bonds:
        deg2[i] += 1
        deg2[j] += 1
    assert np.all(deg2 == 6)


def test_honeycomb_bipartite_by_basis():
    for shape in [(2, 2), (3, 3), (3, 4)]:   # odd sizes included
        lat = honeycomb(*shape)
        assert lat.is_bipartite_compatible
        mask = lat.sublattice_mask
        for i, j in lat.nn_bonds:
            assert mask[i] != mask[j]
        for i, j in lat.nnn_bonds:
            assert mask[i] == mask[j]


def test_marshall_allowed_and_spectrum_invariant():
    """D H D has the same spectrum as H (Marshall is a basis rotation) and
    makes all off-diagonal mels negative on the bipartite honeycomb."""
    lat = honeycomb(2, 2)
    h_rot = exact.dense_from_hamiltonian(
        Heisenberg(lat, marshall=True)).real
    h_plain = exact.dense_from_hamiltonian(
        Heisenberg(lat, marshall=False)).real
    np.testing.assert_allclose(np.linalg.eigvalsh(h_rot),
                               np.linalg.eigvalsh(h_plain), atol=1e-8)
    off = h_rot - np.diag(np.diag(h_rot))
    assert off.max() <= 1e-9


def test_honeycomb_heisenberg_matches_dense_oracle():
    """connected()/diag() vs the independent bit-level sparse builder."""
    lat = honeycomb(2, 3)
    ham = Heisenberg(lat, marshall=False)
    n = lat.n_sites
    h_dense = exact.sparse_heisenberg(n, lat.nn_bonds).toarray()
    spins = np.array(list(itertools.product([1.0, -1.0], repeat=n)),
                     np.float32)[:48]
    idx = ((spins < 0).astype(np.int64)
           * (2 ** np.arange(n, dtype=np.int64))).sum(-1)
    for s_row, i_row in list(zip(spins, idx))[:12]:
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
    """log psi must be invariant under CELL translations (a permutation of
    flat sites) — and the basis channels mean a half-cell 'translation'
    (swapping A and B roles) generally changes the value."""
    lat = honeycomb(3, 4)
    model = LogPsiCNN(lattice_shape=tuple(lat.shape), channels=(4, 4),
                      basis=lat.basis, param_scale=0.3)
    params = model.init(jax.random.key(0),
                        jnp.ones((1, lat.n_sites), jnp.float32))
    s = (2.0 * jax.random.bernoulli(jax.random.key(1), 0.5,
                                    (5, lat.n_sites)) - 1.0
         ).astype(jnp.float32)
    base = log_psi_apply(model, params, s)

    # cell translation by (dx, dy): site (x,y,b) -> (x+dx, y+dy, b)
    for dx, dy in [(1, 0), (0, 1), (2, 3)]:
        perm = np.array([lat.site_index((c[0] + dx, c[1] + dy, c[2]))
                         for c in lat.coords])
        shifted = s[:, np.argsort(perm)]  # shifted[new] = s[old]
        got = log_psi_apply(model, params, shifted)
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(base.re),
                                   rtol=1e-5, atol=1e-5)

    # basis swap (A<->B within each cell) is NOT imposed by the ansatz
    swap = np.arange(lat.n_sites).reshape(-1, 2)[:, ::-1].reshape(-1)
    got = log_psi_apply(model, params, s[:, swap])
    assert not np.allclose(np.asarray(got.re), np.asarray(base.re),
                           rtol=1e-4, atol=1e-4)


def _honey_cfg():
    return from_yaml("""
name: honeycomb_heis_test
lattice: {shape: [2, 3], geometry: honeycomb}
model: {kind: cnn, channels: [10, 10], param_scale: 0.05}
hamiltonian: {kind: heisenberg, marshall: true}
sampler: {n_walkers: 256, move: exchange_anti, n_therm_sweeps: 20}
optimizer: {kind: sgd, lr: 0.05, schedule: cosine}
sr: {enabled: true, solver: minsr, diag_shift0: 0.1, diag_shift_decay: 0.97,
     diag_shift_min: 0.01}
run: {n_steps: 300, seed: 0}
""")


def test_builder_guards_honeycomb():
    cfg = _honey_cfg()
    for field, value, match in [
        ("kind", "gcnn", "C4v"),
        ("translation_average", True, "cell"),
        ("point_group_average", True, "cell"),
    ]:
        bad = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, **{field: value}))
        with pytest.raises(ValueError, match=match):
            build(bad)
    bad = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, kind="rbm", rbm_tie_translations=True))
    with pytest.raises(ValueError, match="tie"):
        build(bad)
    bad = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, kind="arnn", arnn_conv_kernel=3))
    with pytest.raises(ValueError, match="MADE"):
        build(bad)


@pytest.mark.slow
def test_honeycomb_heisenberg_trains_toward_ed():
    """2x3-cell (12-site) honeycomb Heisenberg: basis-channel CNN +
    Marshall + minSR reaches ~1% of the exact ground energy quickly
    (bipartite, sign-free after rotation — much easier than triangular)."""
    cfg = _honey_cfg()
    vmc, params, lattice = build(cfg)
    e_ed = exact.ground_energy(
        exact.sparse_heisenberg(lattice.n_sites, lattice.nn_bonds))
    state = vmc.init_state(jax.random.key(0), cfg.sampler.n_walkers, params)
    ids = jnp.arange(cfg.sampler.n_walkers)
    state = vmc.thermalize(state, jax.random.key(1), ids, 20)
    run = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, 50))
    energies = []
    for chunk in range(6):
        state, metrics = run(state, jax.random.key(100 + chunk))
        energies.append(np.asarray(metrics.energy_re))
    e_tail = float(np.concatenate(energies[-2:]).mean())
    rel = abs(e_tail - e_ed) / abs(e_ed)
    assert rel < 2e-2, (e_tail, e_ed, rel)


def test_honeycomb_j1j2_matches_dense_oracle():
    """The frustrated honeycomb (NNN shell = 6 same-sublattice neighbors)
    through the generic J1-J2 machinery vs the independent bit-level
    sparse builder — pins the nnn_bonds shell and both couplings."""
    from qmcnn_tpu.ops.hamiltonians import j1j2 as mk_j1j2

    # NNN coordination on a torus large enough to avoid image merging:
    # 6 same-sublattice neighbors -> 3 bonds/site
    assert len(honeycomb(3, 3).nnn_bonds) == 3 * 18
    lat = honeycomb(2, 3)  # dense-tractable; wrapped shell is fine here
    n = lat.n_sites
    ham = mk_j1j2(lat, j1=1.0, j2=0.2, marshall=False)
    h_dense = exact.sparse_heisenberg(
        n, lat.nn_bonds, nnn_bonds=lat.nnn_bonds, j2=0.2).toarray()
    spins = np.array(list(itertools.product([1.0, -1.0], repeat=n)),
                     np.float32)[64:64 + 12]
    idx = ((spins < 0).astype(np.int64)
           * (2 ** np.arange(n, dtype=np.int64))).sum(-1)
    for s_row, i_row in zip(spins, idx):
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
