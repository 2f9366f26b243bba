"""Kagome-equivariant GCNN (models/kgcnn.py; model.kind=gcnn +
lattice.geometry=kagome).

Oracles:
  * the fine embedding is a bijection onto the non-(odd,odd) fine sites.
  * exact invariance of log psi under every TRUE kagome isometry, applied
    as a site permutation built from lattice positions: cell translations,
    the 60-degree rotation about a hexagon center (an EMPTY fine site —
    kagome has no 6-fold axis through a site), and a reflection.
  * NON-invariance of a generic (non-symmetric) permutation — the
    invariance tests are not trivially passing.
  * builder routing + spin-flip/prior composition build and run.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.builder import build_lattice, build_model
from qmcnn_tpu.models.cnn import log_psi_apply
from qmcnn_tpu.models.kgcnn import LogPsiKagomeGCNN, fine_embedding


def _cfg(l=2, **model_kw):
    kw = dict(kind="gcnn", channels=(4, 4), kernel_size=3,
              complex_params=True, param_scale=0.05)
    kw.update(model_kw)
    return cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(l, l), geometry="kagome"),
        model=cfglib.ModelConfig(**kw),
        hamiltonian=cfglib.HamiltonianConfig(kind="heisenberg",
                                             marshall=False),
        run=cfglib.RunConfig(seed=0, chunk_size=None),
    )


def test_fine_embedding_bijection():
    idx, mask = fine_embedding((2, 3))
    assert len(set(idx.tolist())) == 18           # injective
    assert mask.sum() == 18                       # onto the occupied set
    fv = 6
    for j in np.flatnonzero(~mask):
        u, v = divmod(int(j), fv)
        assert u % 2 == 1 and v % 2 == 1          # empty = (odd, odd)


def _site_perm_from_fine_map(l, f):
    """Site permutation perm[i] = j when fine map f sends site i's fine
    coords to site j's; f acts on (u, v) mod 2l."""
    idx, _ = fine_embedding((l, l))
    fv = 2 * l
    fine_to_site = {int(j): i for i, j in enumerate(idx)}
    perm = np.zeros(3 * l * l, np.int64)
    for i, j in enumerate(idx):
        u, v = divmod(int(j), fv)
        u2, v2 = f(u, v)
        perm[i] = fine_to_site[(u2 % (2 * l)) * fv + (v2 % (2 * l))]
    return perm


def _rand_s(key, m, n):
    return 2.0 * jax.random.bernoulli(key, 0.5, (m, n)).astype(jnp.float32) - 1.0


@pytest.fixture(scope="module")
def model_and_params():
    l = 2
    cfg = _cfg(l)
    lat = build_lattice(cfg)
    model = build_model(cfg, lat)
    s = _rand_s(jax.random.key(0), 6, lat.n_sites)
    params = model.init(jax.random.key(1), s)
    return l, model, params, s


def _check_perm_invariance(model, params, s, perm, invariant=True):
    o0 = log_psi_apply(model, params, s)
    # perm[i] = destination of site i's spin: new_s[:, perm[i]] = s[:, i]
    s2 = jnp.zeros_like(s).at[:, jnp.asarray(perm)].set(s)
    o1 = log_psi_apply(model, params, s2)
    if invariant:
        np.testing.assert_allclose(np.asarray(o1.re), np.asarray(o0.re),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(o1.im), np.asarray(o0.im),
                                   atol=2e-4)
    else:
        assert not np.allclose(np.asarray(o1.re), np.asarray(o0.re),
                               atol=1e-5)


def test_cell_translation_invariance(model_and_params):
    l, model, params, s = model_and_params
    for (du, dv) in ((2, 0), (0, 2), (2, 2)):   # cell = 2 fine steps
        perm = _site_perm_from_fine_map(
            l, lambda u, v: (u + du, v + dv))
        _check_perm_invariance(model, params, s, perm)


def test_rotation_about_hexagon_center_invariance(model_and_params):
    """60-degree rotation about the empty fine site c = (1, 1):
    p -> c + R(p - c) with R(u, v) = (-v, u + v) in triangular coords."""
    l, model, params, s = model_and_params

    def rot(u, v):
        du, dv = u - 1, v - 1
        ru, rv = -dv, du + dv
        return 1 + ru, 1 + rv

    perm = _site_perm_from_fine_map(l, rot)
    # sanity: a 6-fold rotation, orbit of order 6
    p = np.arange(len(perm))
    for _ in range(6):
        p = perm[p]
    assert (p == np.arange(len(perm))).all()
    _check_perm_invariance(model, params, s, perm)


def test_reflection_invariance(model_and_params):
    """Mirror u <-> v (the a1 <-> a2 swap is a D6 reflection; it fixes
    the A sublattice and swaps B and C)."""
    l, model, params, s = model_and_params
    perm = _site_perm_from_fine_map(l, lambda u, v: (v, u))
    assert (perm[perm] == np.arange(len(perm))).all()
    _check_perm_invariance(model, params, s, perm)


def test_generic_permutation_not_invariant(model_and_params):
    l, model, params, s = model_and_params
    rng = np.random.default_rng(3)
    perm = rng.permutation(3 * l * l)
    _check_perm_invariance(model, params, s, perm, invariant=False)


def test_builder_composition_with_prior_and_spin_flip():
    cfg = _cfg(2, spin_flip_sector=1, phase_bias="sublattice_120")
    lat = build_lattice(cfg)
    model = build_model(cfg, lat)
    s = _rand_s(jax.random.key(2), 4, lat.n_sites)
    params = model.init(jax.random.key(3), s)
    out = log_psi_apply(model, params, s)
    assert np.isfinite(np.asarray(out.re)).all()
    # spin-parity projection: psi(-s) == psi(s) in the +1 sector
    o2 = log_psi_apply(model, params, -s)
    np.testing.assert_allclose(np.asarray(o2.re), np.asarray(out.re),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2.im), np.asarray(out.im),
                               atol=1e-5)


def test_rect_torus_refused():
    cfg = _cfg(2)
    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(2, 3), geometry="kagome"),
        model=cfg.model, hamiltonian=cfg.hamiltonian, run=cfg.run)
    lat = build_lattice(cfg)
    model = build_model(cfg, lat)
    with pytest.raises(ValueError, match="square"):
        model.init(jax.random.key(0), jnp.ones((1, lat.n_sites)))
