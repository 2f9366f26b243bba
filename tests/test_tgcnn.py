"""Triangular D6 GCNN (models/tgcnn.py): group tables, exact p6m
symmetry of log psi, builder wiring, and a train-vs-ED integration run.

The symmetry oracle is exact: for random parameters, log psi must be
bit-close under every lattice translation and all 12 D6 point-group
site permutations (character-signed), with NO averaging in the test —
the symmetry is built into the features.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.builder import build, build_model
from qmcnn_tpu.configs import from_yaml
from qmcnn_tpu.lattice import triangular
from qmcnn_tpu.models.cnn import log_psi_apply
from qmcnn_tpu.models.tgcnn import (LogPsiTriGCNN, d6_site_perms, d6_tables)
from qmcnn_tpu.ops import exact


# ------------------------------------------------------------- tables
def test_d6_tables_group_structure():
    G, offsets, inv, elem_idx, tap_perm, chars, mats = d6_tables(1)
    assert G == 12
    assert len(offsets) == 7          # center + NN hexagon
    # R has order 6; R^3 = inversion
    R = mats[1]
    np.testing.assert_array_equal(np.linalg.matrix_power(R, 6), np.eye(2))
    np.testing.assert_array_equal(np.linalg.matrix_power(R, 3), -np.eye(2))
    # every element's inverse composes to identity in elem_idx terms
    for g in range(G):
        np.testing.assert_array_equal(mats[inv[g]] @ mats[g], np.eye(2))
    # tap_perm rows are permutations
    for g in range(G):
        assert sorted(tap_perm[g]) == list(range(len(offsets)))
    # A2 character: +1 on rotations, -1 on reflections
    assert chars["A2"][0] == 1 and chars["A2"][6] == -1


def test_d6_tables_radius2_star():
    _, offsets, *_ = d6_tables(2)
    assert len(offsets) == 19
    # closed under the NN offsets' span: contains the sqrt(3) and 2a shells
    offs = {tuple(o) for o in offsets.tolist()}
    assert (1, 1) in offs and (2, 0) in offs and (2, -2) in offs


def test_d6_site_perms_are_automorphisms():
    lat = triangular(3)
    perms = d6_site_perms(tuple(lat.shape))
    bonds = {tuple(sorted(b)) for b in lat.nn_bonds.tolist()}
    for g in range(12):
        p = perms[g]
        assert sorted(p) == list(range(lat.n_sites))
        # the NN graph is invariant: permuted bonds are bonds.
        # perm maps position -> source site; bonds transform by the
        # inverse permutation (site relabeling), which preserves the
        # bond SET either way for a group element.
        inv_p = np.argsort(p)
        for i, j in bonds:
            assert tuple(sorted((inv_p[i], inv_p[j]))) in bonds


# ------------------------------------------------------- exact symmetry
def _model_and_params(character="A1", complex_params=True, seed=0,
                      channels=(4, 4), shape=(3, 3), radius=1):
    # the symmetry identity is exact, but TESTING it needs per-element
    # sums S_g with O(0.1) genuine spread: at tiny fixed init all S_g
    # coincide and the sign characters' readout sum_g chi(g) e^{S_g}
    # cancels to rounding noise (sum chi = 0 for non-trivial irreps),
    # while large init amplifies conv-order noise through e^{S}. The
    # fan_in/selu recipe lands exactly in the tame middle regime.
    m = LogPsiTriGCNN(lattice_shape=shape, channels=channels, radius=radius,
                      complex_params=complex_params, param_scale=1.0,
                      init_mode="fan_in", activation="selu",
                      character=character)
    n = shape[0] * shape[1]
    key = jax.random.key(seed)
    s0 = jnp.ones((1, n), jnp.float32)
    v = m.init(key, s0)
    return m, v, n


def test_tgcnn_regular_representation():
    """The complete symmetry content in one tight test: the per-element
    sums transform by the regular representation, S_h(g.s) =
    S_{g^-1 h}(s), elementwise for ALL 12 group elements — every
    character readout follows from this by 3 lines of algebra (and the
    A1 end-to-end test below covers that algebra on log psi itself).

    Why not assert psi directly for the sign characters: a SHALLOW stack
    leaves S_g nearly degenerate on {1, R^3} x {1, M'} cosets, whose
    character-sum vanishes for A2/B1/B2 — the readout is then a ~10-digit
    f32 cancellation (a near-null projected state, not a bug; see the
    LogPsiTriGCNN.__call__ docstring). The regular-rep identity has no
    cancellation channel and pins the same math."""
    m, v, n = _model_and_params("A2")
    s = jnp.asarray(1.0 - 2.0 * jax.random.bernoulli(
        jax.random.key(7), 0.5, (16, n)), jnp.float32)
    base = m.apply(v, s, method="elements")
    base_re, base_im = np.asarray(base.re), np.asarray(base.im)
    G, _, _, elem_idx, _, chars, _ = d6_tables(1)
    perms = d6_site_perms((3, 3))
    for g in range(G):
        got = m.apply(v, s[:, perms[g]], method="elements")
        np.testing.assert_allclose(np.asarray(got.re),
                                   base_re[:, elem_idx[g]],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got.im),
                                   base_im[:, elem_idx[g]],
                                   rtol=2e-4, atol=2e-4)


def test_tgcnn_a1_symmetry_end_to_end():
    """A1 (the ground-state sector): log psi itself is invariant under
    all 12 point-group site permutations."""
    m, v, n = _model_and_params("A1")
    s = jnp.asarray(1.0 - 2.0 * jax.random.bernoulli(
        jax.random.key(7), 0.5, (16, n)), jnp.float32)
    base = log_psi_apply(m, v, s)
    perms = d6_site_perms((3, 3))
    for g in range(12):
        got = log_psi_apply(m, v, s[:, perms[g]])
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(base.re),
                                   rtol=2e-5, atol=2e-5)
        dphi = np.asarray(got.im) - np.asarray(base.im)
        np.testing.assert_allclose(np.mod(dphi + np.pi, 2 * np.pi) - np.pi,
                                   0.0, atol=3e-5)


def test_tgcnn_translation_invariance():
    m, v, n = _model_and_params()
    s = jnp.asarray(1.0 - 2.0 * jax.random.bernoulli(
        jax.random.key(11), 0.5, (8, n)), jnp.float32)
    base = log_psi_apply(m, v, s)
    grid = s.reshape(-1, 3, 3)
    for dx, dy in ((1, 0), (0, 1), (2, 2)):
        rolled = jnp.roll(grid, (dx, dy), axis=(1, 2)).reshape(-1, n)
        got = log_psi_apply(m, v, rolled)
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(base.re),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(base.im),
                                   rtol=2e-5, atol=2e-5)


def test_tgcnn_radius2_symmetry_on_6x6():
    m, v, n = _model_and_params(shape=(6, 6), radius=2, channels=(3, 3),
                                complex_params=False)
    s = jnp.asarray(1.0 - 2.0 * jax.random.bernoulli(
        jax.random.key(5), 0.5, (4, n)), jnp.float32)
    base = log_psi_apply(m, v, s)
    perms = d6_site_perms((6, 6))
    for g in (1, 6, 7):  # R, M, RM
        got = log_psi_apply(m, v, s[:, perms[g]])
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(base.re),
                                   rtol=2e-5, atol=2e-5)


def test_tgcnn_guards():
    with pytest.raises(ValueError, match="square"):
        _model_and_params(shape=(3, 6))
    with pytest.raises(ValueError, match="character"):
        m = LogPsiTriGCNN(lattice_shape=(3, 3), character="E1")
        m.init(jax.random.key(0), jnp.ones((1, 9), jnp.float32))
    with pytest.raises(ValueError, match="radius"):
        d6_tables(3)


# ------------------------------------------------------------- builder
def _cfg(extra_model=""):
    return from_yaml(f"""
name: tgcnn_test
lattice: {{shape: [3, 3], geometry: triangular}}
model: {{kind: gcnn, channels: [4, 4], kernel_size: 3,
        complex_params: true, param_scale: 1.0, init_mode: fan_in,
        activation: selu{extra_model}}}
hamiltonian: {{kind: heisenberg, marshall: false}}
sampler: {{n_walkers: 128, move: flip, n_therm_sweeps: 10}}
optimizer: {{kind: sgd, lr: 0.05, schedule: cosine}}
sr: {{enabled: true, solver: minsr, diag_shift0: 0.1,
     diag_shift_decay: 0.97, diag_shift_min: 0.01}}
run: {{n_steps: 300, seed: 0}}
""")


def test_builder_routes_gcnn_to_tri_d6():
    model = build_model(_cfg(), triangular(3))
    from qmcnn_tpu.models.gcnn import SpinFlipSymmetrized

    inner = model
    assert isinstance(inner, LogPsiTriGCNN)
    model2 = build_model(_cfg(", spin_flip_sector: 1"), triangular(3))
    assert isinstance(model2, SpinFlipSymmetrized)
    assert isinstance(model2.inner, LogPsiTriGCNN)


def test_builder_routes_kagome_gcnn():
    # r3: kagome + gcnn is now SUPPORTED (models/kgcnn.py — the
    # depleted-triangular embedding; tests/test_kgcnn.py owns its
    # invariance oracles). The builder must route there, not reject.
    from qmcnn_tpu.lattice import kagome
    from qmcnn_tpu.models.kgcnn import LogPsiKagomeGCNN

    cfg = _cfg()
    cfg = dataclasses.replace(cfg, lattice=dataclasses.replace(
        cfg.lattice, geometry="kagome", shape=[2, 2]))
    model = build_model(cfg, kagome(2, 2))
    inner = model
    while not isinstance(inner, LogPsiKagomeGCNN):
        inner = inner.inner
    assert inner.cell_shape == (2, 2)


# -------------------------------------------------------- integration
@pytest.mark.slow
def test_tgcnn_trains_toward_ed():
    """3x3 triangular Heisenberg: the D6-equivariant complex GCNN + the
    120-degree prior + minSR trains to within ~10% of ED in 300 steps.

    The prior is REQUIRED here: the r2 recipe scan (BASELINE.md
    2026-08-18) measured the p6m net WITHOUT it stalling at 28.6-30.5%
    under every optimizer variant (and this test reproduced 28.7% when it
    first ran prior-less) — on frustrated lattices the sign prior
    dominates equivariance at small size; the shipped tri6x6_tgcnn.yaml
    is prior-on for the same reason."""
    cfg = _cfg(extra_model=", phase_bias: sublattice_120")
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
    assert rel < 1.2e-1, (e_tail, e_ed, rel)
