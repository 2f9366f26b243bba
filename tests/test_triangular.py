"""Triangular-lattice geometry tests: bond structure, non-bipartite
guards, dense-oracle Hamiltonian parity, and a short VMC train vs ED.

Physics sanity anchor: the triangular Heisenberg AF is the canonical
geometrically frustrated model (120-degree order; thermodynamic E/site
~ -0.5445 per QMC/DMRG literature). Tests validate against our OWN exact
diagonalization on small periodic clusters — no literature numbers are
asserted.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.builder import build
from qmcnn_tpu.configs import from_yaml
from qmcnn_tpu.lattice import triangular
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import Heisenberg


def test_triangular_bond_counts():
    lat = triangular(4)
    assert lat.n_sites == 16
    assert len(lat.nn_bonds) == 3 * 16   # 6 NN per site, each bond once
    assert len(lat.nnn_bonds) == 3 * 16  # sqrt(3) shell: also coordination 6
    pairs = [tuple(sorted(b)) for b in lat.nn_bonds.tolist()]
    assert len(pairs) == len(set(pairs))


def test_triangular_every_site_has_six_neighbors():
    lat = triangular(4, 6)
    deg = np.zeros(lat.n_sites, int)
    for i, j in lat.nn_bonds:
        deg[i] += 1
        deg[j] += 1
    assert np.all(deg == 6)


def test_triangular_contains_triangles():
    """Odd cycles must exist: site 0, its +a1 neighbor, and their common
    +a2 / a1-a2 neighbor close a 3-cycle."""
    lat = triangular(4)
    pairs = {tuple(sorted(b)) for b in lat.nn_bonds.tolist()}
    i = lat.site_index((0, 0))
    j = lat.site_index((1, 0))
    k = lat.site_index((0, 1))  # j - k = (1,-1): also a NN offset
    assert tuple(sorted((i, j))) in pairs
    assert tuple(sorted((i, k))) in pairs
    assert tuple(sorted((j, k))) in pairs
    assert not lat.is_bipartite_compatible


def test_marshall_rejected_on_triangular():
    with pytest.raises(ValueError, match="bipartite"):
        Heisenberg(triangular(4), marshall=True)


def test_triangular_heisenberg_matches_dense_oracle():
    """connected()/diag() vs the independent bit-level sparse builder on
    every computational basis state of a 3x4 periodic cluster."""
    lat = triangular(3, 4)
    ham = Heisenberg(lat, marshall=False)
    n = lat.n_sites
    h_dense = exact.sparse_heisenberg(n, lat.nn_bonds).toarray()
    spins = np.array(list(itertools.product([1.0, -1.0], repeat=n)),
                     np.float32)[:64]  # subsample rows for speed
    idx = ((spins < 0).astype(np.int64)
           * (2 ** np.arange(n, dtype=np.int64))).sum(-1)

    def row_oracle(s_row, i_row):
        s_prime, mel, mask = ham.connected(jnp.asarray(s_row))
        diag = float(ham.diag(jnp.asarray(s_row)))
        np.testing.assert_allclose(diag, h_dense[i_row, i_row], atol=1e-5)
        total = np.zeros(h_dense.shape[0])
        for sp, m, ok in zip(np.asarray(s_prime), np.asarray(mel),
                             np.asarray(mask)):
            if not ok:
                continue
            jdx = int(((sp < 0).astype(np.int64)
                       * (2 ** np.arange(n, dtype=np.int64))).sum())
            total[jdx] += m
        row = h_dense[i_row].copy()
        row[i_row] = 0.0
        np.testing.assert_allclose(total, row, atol=1e-5)

    for s_row, i_row in list(zip(spins, idx))[:16]:
        row_oracle(s_row, int(i_row))


def _tri_cfg():
    return from_yaml("""
name: tri_heis_test
lattice: {shape: [3, 4], geometry: triangular}
model: {kind: cnn, channels: [8, 8], complex_params: true, param_scale: 0.05}
hamiltonian: {kind: heisenberg, marshall: false}
sampler: {n_walkers: 256, move: exchange_anti, n_therm_sweeps: 20}
optimizer: {kind: sgd, lr: 0.05, schedule: cosine}
sr: {enabled: true, solver: minsr, diag_shift0: 0.1, diag_shift_decay: 0.97,
     diag_shift_min: 0.01}
run: {n_steps: 400, seed: 0}
""")


def test_builder_guards_triangular():
    # model.kind gcnn on a triangular lattice routes to the D6 TriGCNN
    # (models/tgcnn.py), which needs a square torus — the 3x4 cfg here
    # must be refused with ITS message, not the old C4v refusal
    cfg = _tri_cfg()
    import dataclasses
    bad = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, kind="gcnn"))
    with pytest.raises(ValueError, match="square 2D torus"):
        build(bad)
    bad2 = dataclasses.replace(cfg, hamiltonian=dataclasses.replace(
        cfg.hamiltonian, marshall=True))
    with pytest.raises(ValueError, match="bipartite"):
        build(bad2)


@pytest.mark.slow
def test_triangular_heisenberg_trains_toward_ed():
    """Frustrated 3x4 triangular Heisenberg: complex CNN + minSR reaches
    a few percent of the exact ground energy in 400 steps (the sign
    structure is genuinely hard; the bar here is machinery correctness,
    not production accuracy)."""
    cfg = _tri_cfg()
    vmc, params, lattice = build(cfg)
    e_ed = exact.ground_energy(
        exact.sparse_heisenberg(lattice.n_sites, lattice.nn_bonds))
    state = vmc.init_state(jax.random.key(0), cfg.sampler.n_walkers, params)
    ids = jnp.arange(cfg.sampler.n_walkers)
    state = vmc.thermalize(state, jax.random.key(1), ids, 20)
    run = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, 50))
    energies = []
    for chunk in range(8):
        state, metrics = run(state, jax.random.key(100 + chunk))
        energies.append(np.asarray(metrics.energy_re))
    e_tail = float(np.concatenate(energies[-2:]).mean())
    rel = abs(e_tail - e_ed) / abs(e_ed)
    assert rel < 5e-2, (e_tail, e_ed, rel)
