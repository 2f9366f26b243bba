"""ViT ansatz: exact translation invariance (relpos attention + sub-patch
projection), patchify layout, builder wiring/guards, gradient sanity, and a
TFIM train-vs-ED integration gate (SURVEY.md §4 unit+integration tiers; the
ViT family itself is beyond-reference — SURVEY.md §2.1 R2 ships only a CNN).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qmcnn_tpu import builder
from qmcnn_tpu.configs import Config, LatticeConfig, ModelConfig
from qmcnn_tpu.models.cnn import log_psi_apply
from qmcnn_tpu.models.vit import LogPsiViT, _patchify, _relpos_index


def _init(model, n_sites, seed=0):
    return model.init(jax.random.key(seed),
                      jnp.ones((1, n_sites), jnp.float32))


def _rand_spins(key, batch, n_sites):
    return jax.random.choice(key, jnp.asarray([-1.0, 1.0]),
                             (batch, n_sites))


@pytest.mark.parametrize("factored", [True, False])
@pytest.mark.parametrize("complex_params", [True, False])
def test_translation_invariance_2d(factored, complex_params):
    """log psi must be exactly invariant under EVERY lattice translation —
    patch-grid shifts via the relpos attention, sub-patch shifts via the
    explicit logmeanexp projection."""
    shape = (4, 4)
    n = int(np.prod(shape))
    model = LogPsiViT(lattice_shape=shape, channels=(16, 16), patch=2,
                      n_heads=2, factored=factored,
                      complex_params=complex_params, param_scale=0.1)
    params = _init(model, n)
    s = _rand_spins(jax.random.key(1), 5, n)
    base = log_psi_apply(model, params, s)
    grid = s.reshape(-1, *shape)
    for shift in [(1, 0), (0, 1), (2, 1), (3, 3), (1, 2)]:
        rolled = jnp.roll(grid, shift, axis=(1, 2)).reshape(-1, n)
        got = log_psi_apply(model, params, rolled)
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(base.re),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(base.im),
                                   rtol=0, atol=1e-4)


def test_translation_invariance_chain():
    n = 8
    model = LogPsiViT(lattice_shape=(n,), channels=(16,), patch=2,
                      n_heads=2, complex_params=True, param_scale=0.1)
    params = _init(model, n)
    s = _rand_spins(jax.random.key(2), 4, n)
    base = log_psi_apply(model, params, s)
    for shift in range(1, n):
        got = log_psi_apply(model, params, jnp.roll(s, shift, axis=1))
        np.testing.assert_allclose(np.asarray(got.re), np.asarray(base.re),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.im), np.asarray(base.im),
                                   rtol=0, atol=1e-4)


def test_patchify_layout():
    """Token t holds the row-major p x p patch at patch-grid position t."""
    shape, p = (4, 6), 2
    n = 24
    x = jnp.arange(n, dtype=jnp.float32).reshape(1, *shape)
    tok = _patchify(x, shape, p)  # [1, 6, 4]
    assert tok.shape == (1, (4 // p) * (6 // p), p * p)
    arr = np.arange(n).reshape(shape)
    for ti, (gi, gj) in enumerate(np.ndindex(4 // p, 6 // p)):
        expect = arr[gi * p:(gi + 1) * p, gj * p:(gj + 1) * p].reshape(-1)
        np.testing.assert_array_equal(np.asarray(tok[0, ti]), expect)


def test_relpos_index_is_relative():
    """rel[i,j] depends only on the periodic displacement pos_i - pos_j."""
    rel = _relpos_index((3, 4))
    t = 12
    coords = np.stack(np.unravel_index(np.arange(t), (3, 4)), -1)
    for i in range(t):
        for j in range(t):
            d = tuple((coords[i] - coords[j]) % np.asarray((3, 4)))
            assert rel[i, j] == np.ravel_multi_index(d, (3, 4))
    # zero displacement on the diagonal
    np.testing.assert_array_equal(np.diag(rel), 0)


def test_validation_errors():
    n = 16
    s = jnp.ones((1, n), jnp.float32)
    with pytest.raises(ValueError, match="does not divide"):
        LogPsiViT(lattice_shape=(4, 4), patch=3).init(jax.random.key(0), s)
    with pytest.raises(ValueError, match="constant-width"):
        LogPsiViT(lattice_shape=(4, 4), channels=(16, 32),
                  patch=2).init(jax.random.key(0), s)
    with pytest.raises(ValueError, match="not divisible"):
        LogPsiViT(lattice_shape=(4, 4), channels=(18,), patch=2,
                  n_heads=4).init(jax.random.key(0), s)


def _vit_config(**model_kw):
    base = Config()
    return dataclasses.replace(
        base,
        lattice=LatticeConfig(shape=[4, 4], pbc=True),
        model=ModelConfig(kind="vit", channels=(16, 16), vit_patch=2,
                          vit_heads=2, complex_params=True, **model_kw),
    )


def test_builder_wiring_and_guards():
    cfg = _vit_config(spin_flip_sector=1, point_group_average=True)
    lat = builder.build_lattice(cfg)
    model = builder.build_model(cfg, lat)
    params = _init(model, lat.n_sites)
    s = _rand_spins(jax.random.key(3), 3, lat.n_sites)
    out = log_psi_apply(model, params, s)
    assert out.re.shape == (3,)
    assert np.all(np.isfinite(np.asarray(out.re)))
    # spin-flip projection holds
    flipped = log_psi_apply(model, params, -s)
    np.testing.assert_allclose(np.asarray(flipped.re),
                               np.asarray(out.re), atol=1e-4)
    # point-group projection holds (90-degree rotation)
    rot = jnp.rot90(s.reshape(-1, 4, 4), k=1, axes=(1, 2)).reshape(-1, 16)
    rot_out = log_psi_apply(model, params, rot)
    np.testing.assert_allclose(np.asarray(rot_out.re),
                               np.asarray(out.re), atol=1e-4)

    with pytest.raises(ValueError, match="translation invariant"):
        builder.build_model(_vit_config(translation_average=True), lat)
    obc = dataclasses.replace(
        _vit_config(), lattice=LatticeConfig(shape=[4, 4], pbc=False))
    with pytest.raises(ValueError, match="periodic"):
        builder.build_model(obc, builder.build_lattice(obc))


def test_gradients_finite_and_nonzero():
    shape = (4, 4)
    n = 16
    model = LogPsiViT(lattice_shape=shape, channels=(16, 16), patch=2,
                      n_heads=2, complex_params=True, param_scale=0.1)
    params = _init(model, n)
    s = _rand_spins(jax.random.key(4), 8, n)

    def loss(p):
        out = log_psi_apply(model, p, s)
        return jnp.sum(out.re) + jnp.sum(out.im)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert total > 0.0


@pytest.mark.slow
def test_vit_tfim_train_vs_ed():
    """BASELINE config-1 style gate on the new family: 1D TFIM chain,
    factored-attention ViT, SGD — tail energy within 1.5e-2 of ED (the CI
    tolerance used by the CNN integration test)."""
    import optax

    from qmcnn_tpu.lattice import chain
    from qmcnn_tpu.ops import exact
    from qmcnn_tpu.ops.hamiltonians import TFIM
    from qmcnn_tpu.sampler.metropolis import MetropolisSampler
    from qmcnn_tpu.vmc import VMC

    n = 8
    lat = chain(n)
    ham = TFIM(lat, j=1.0, h=1.0)
    e_exact = exact.ground_energy(
        exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=1.0))

    model = LogPsiViT(lattice_shape=(n,), channels=(16, 16), patch=2,
                      n_heads=2, factored=True, complex_params=False,
                      param_scale=0.1)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = _init(model, n)
    sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="flip")
    vmc = VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
              optimizer=optax.adam(0.01), n_sweeps=2)
    m = 256
    ids = jnp.arange(m)
    state = vmc.init_state(jax.random.key(1), m, params)
    state = vmc.thermalize(state, jax.random.key(2), ids, n_sweeps=20)
    step = jax.jit(vmc.step)

    energies = []
    for it in range(300):
        state, metrics = step(
            state, jax.random.fold_in(jax.random.key(3), it), ids)
        energies.append(float(metrics.energy_re))
        assert np.isfinite(energies[-1])
    e_tail = np.mean(energies[-50:])
    rel_err = abs(e_tail - e_exact) / abs(e_exact)
    assert rel_err < 1.5e-2, (
        f"E_vmc={e_tail:.4f} vs E_exact={e_exact:.4f} rel_err={rel_err:.2e}")
