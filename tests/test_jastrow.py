"""Two-body Jastrow factor (models/jastrow.py): distance-shell classes,
zero-init identity, a brute-force pair-sum oracle, isometry invariance,
and an end-to-end training win on a model where the Jastrow is exact.

Oracles: the class matrix is checked against geometric facts (NN bonds =
shell 0, symmetry, sentinel diagonal), the quadratic form against an
explicit O(N^2) Python double loop, invariance against rolled/transposed
configurations, and the training gate against dense ED — for the
ferromagnetic-bond Ising chain in a field, exp(quadratic) structure is
close to exact, so a Jastrow-wrapped tiny net must beat its bare twin.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.builder import build_model
from qmcnn_tpu.configs import Config, LatticeConfig, ModelConfig
from qmcnn_tpu.lattice import (Lattice, chain, honeycomb, kagome, square,
                               triangular)
from qmcnn_tpu.models.cnn import log_psi_apply
from qmcnn_tpu.models.jastrow import Jastrow, distance_classes, wrap_jastrow

ALL_LATTICES = [chain(8), square(4), triangular(3, 3), honeycomb(2, 2),
                kagome(2, 2)]


def _random_s(key, lat, batch=7):
    return (2.0 * jax.random.bernoulli(key, 0.5, (batch, lat.n_sites))
            - 1.0).astype(jnp.float32)


# ------------------------------------------------------------- classes
@pytest.mark.parametrize("lat", ALL_LATTICES, ids=lambda l: l.geometry)
def test_class_matrix_structure(lat):
    cm, n_shells = distance_classes(lat)
    n = lat.n_sites
    assert cm.shape == (n, n)
    np.testing.assert_array_equal(cm, cm.T)  # distance is symmetric
    assert np.all(np.diag(cm) == n_shells)  # sentinel diagonal
    off = cm[~np.eye(n, dtype=bool)]
    assert set(np.unique(off)) == set(range(n_shells))  # every shell used
    # shell 0 is exactly the NN shell: every NN bond sits in it
    i, j = lat.nn_bonds[:, 0], lat.nn_bonds[:, 1]
    assert np.all(cm[i, j] == 0)


def test_nn_shell_is_only_nn_pairs_square():
    lat = square(4)
    cm, _ = distance_classes(lat)
    pairs = {(int(a), int(b)) for a, b in np.argwhere(cm == 0)}
    bonds = {(int(i), int(j)) for i, j in lat.nn_bonds}
    bonds |= {(j, i) for i, j in bonds}
    assert pairs == bonds


def test_minimal_image_wraps():
    # on a periodic 4-chain, sites 0 and 3 are NN (distance 1, not 3)
    cm, _ = distance_classes(chain(4))
    assert cm[0, 3] == 0
    # and open boundaries do NOT wrap
    cm_open, n_shells_open = distance_classes(chain(4, pbc=False))
    assert cm_open[0, 3] == n_shells_open - 1  # furthest shell
    assert cm_open[0, 3] != 0


def test_kagome_positions_all_nn_bonds_same_length():
    lat = kagome(3, 3)
    pos = lat.site_positions
    cm, _ = distance_classes(lat)
    i, j = lat.nn_bonds[:, 0], lat.nn_bonds[:, 1]
    assert np.all(cm[i, j] == 0)
    # in-cell distances are exactly a/2
    d01 = np.linalg.norm(pos[0] - pos[1])
    assert np.isclose(d01, 0.5)


# --------------------------------------------------------------- module
import flax.linen as nn  # noqa: E402


class _ScalarInner(nn.Module):
    """Minimal real log-amplitude: one learned site-field dot product."""

    @nn.compact
    def __call__(self, s):
        w = self.param("w", nn.initializers.normal(1.0),
                       (s.shape[-1],), jnp.float32)
        return s @ w  # [B]


@pytest.mark.parametrize("lat", ALL_LATTICES, ids=lambda l: l.geometry)
def test_zero_init_is_identity(lat):
    inner = _ScalarInner()
    wrapped = wrap_jastrow(inner, lat)
    s = _random_s(jax.random.key(0), lat)
    vi = inner.init(jax.random.key(1), s)
    vw = wrapped.init(jax.random.key(1), s)
    np.testing.assert_array_equal(np.asarray(vw["params"]["v"]), 0.0)
    out_i = log_psi_apply(inner, vi, s)
    out_w = log_psi_apply(wrapped, {"params": {
        "inner": vi["params"], "v": vw["params"]["v"]}}, s)
    np.testing.assert_array_equal(np.asarray(out_w.re), np.asarray(out_i.re))
    np.testing.assert_array_equal(np.asarray(out_w.im), np.asarray(out_i.im))


@pytest.mark.parametrize("lat", [square(4), kagome(2, 2)],
                         ids=lambda l: l.geometry)
def test_quadratic_form_vs_pair_sum_oracle(lat):
    wrapped = wrap_jastrow(_ScalarInner(), lat)
    s = _random_s(jax.random.key(2), lat, batch=5)
    variables = wrapped.init(jax.random.key(3), s)
    rng = np.random.default_rng(0)
    v = rng.normal(size=variables["params"]["v"].shape).astype(np.float32)
    variables = {"params": {**variables["params"], "v": jnp.asarray(v)}}
    base = {"params": {**variables["params"],
                       "v": jnp.zeros_like(variables["params"]["v"])}}
    got = (np.asarray(log_psi_apply(wrapped, variables, s).re)
           - np.asarray(log_psi_apply(wrapped, base, s).re))
    cm, n_shells = distance_classes(lat)
    sn = np.asarray(s)
    want = np.zeros(s.shape[0])
    for b in range(s.shape[0]):
        acc = 0.0
        for i in range(lat.n_sites):
            for j in range(lat.n_sites):
                if i != j:
                    acc += 0.5 * v[cm[i, j]] * sn[b, i] * sn[b, j]
        want[b] = acc
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_isometry_invariance_of_jastrow_term():
    lat = square(4)
    wrapped = wrap_jastrow(_ScalarInner(), lat)
    s = _random_s(jax.random.key(4), lat, batch=3)
    variables = wrapped.init(jax.random.key(5), s)
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=variables["params"]["v"].shape)
                    .astype(np.float32))
    variables = {"params": {**variables["params"], "v": v}}
    base = {"params": {**variables["params"], "v": jnp.zeros_like(v)}}

    def term(cfgs):
        return (np.asarray(log_psi_apply(wrapped, variables, cfgs).re)
                - np.asarray(log_psi_apply(wrapped, base, cfgs).re))

    grid = np.asarray(s).reshape(3, 4, 4)
    for transform in (lambda g: np.roll(g, 1, axis=1),       # translation
                      lambda g: np.roll(g, (1, 2), (1, 2)),  # translation
                      lambda g: np.rot90(g, axes=(1, 2)),    # C4 rotation
                      lambda g: np.transpose(g, (0, 2, 1))):  # reflection
        t = jnp.asarray(transform(grid).reshape(3, 16).copy())
        np.testing.assert_allclose(term(t), term(s), rtol=1e-5, atol=1e-5)


# -------------------------------------------------------------- builder
def test_builder_wires_jastrow_and_arnn_rejects():
    lat = square(4)
    cfg = Config(name="t", lattice=LatticeConfig(shape=(4, 4)),
                 model=ModelConfig(kind="cnn", channels=(4,), jastrow=True))
    model = build_model(cfg, lat)
    s = _random_s(jax.random.key(6), lat)
    variables = model.init(jax.random.key(7), s)
    flat = jax.tree_util.tree_leaves_with_path(variables)
    assert any("'v'" in jax.tree_util.keystr(p) for p, _ in flat)

    bad = Config(name="t", lattice=LatticeConfig(shape=(4, 4)),
                 model=ModelConfig(kind="arnn", channels=(8,), jastrow=True))
    with pytest.raises(ValueError, match="jastrow"):
        build_model(bad, lat)


@pytest.mark.slow
def test_jastrow_learns_end_to_end():
    """TFIM chain: a Jastrow-wrapped tiny CNN must train to ED accuracy
    and its shell couplings must actually move off the zero init (the
    factor participates in SGD/SR, it is not a frozen spectator)."""
    import optax

    from qmcnn_tpu.configs import HamiltonianConfig
    from qmcnn_tpu.ops import exact
    from qmcnn_tpu.ops.hamiltonians import TFIM
    from qmcnn_tpu.sampler.metropolis import MetropolisSampler

    n = 8
    lat = chain(n)
    e0 = exact.ground_energy(exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=1.0))

    cfg = Config(name="jast", lattice=LatticeConfig(shape=(n,)),
                 model=ModelConfig(kind="cnn", channels=(4,), kernel_size=3,
                                   jastrow=True),
                 hamiltonian=HamiltonianConfig(kind="tfim", h=1.0))
    model = build_model(cfg, lat)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, n), jnp.float32))
    from qmcnn_tpu.vmc import VMC

    ham = TFIM(lat, j=1.0, h=1.0)
    sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="flip")
    vmc = VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
              optimizer=optax.adam(0.02), n_sweeps=2)
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
    e_tail = np.mean(energies[-50:])
    rel_err = abs(e_tail - e0) / abs(e0)
    assert rel_err < 1.5e-2, f"rel_err={rel_err:.3e}"
    v = np.asarray(state.params["params"]["v"])
    assert np.any(np.abs(v) > 1e-3), "jastrow couplings never moved"


def test_warm_start_from_bare_checkpoint_params():
    """Turning model.jastrow on over a plateaued BARE run is the
    documented use case: transfer_params must copy every conv leaf across
    the wrapper's 'inner/' nesting (and the reverse direction too)."""
    from qmcnn_tpu.utils.transfer import transfer_params

    cfg_bare = Config(lattice=LatticeConfig(shape=(6,)),
                      model=ModelConfig(channels=(4,)))
    cfg_j = dataclasses.replace(
        cfg_bare, model=dataclasses.replace(cfg_bare.model, jastrow=True))
    lat = chain(6)
    key = jax.random.key(0)
    x = jnp.ones((1, 6), jnp.float32)
    bare = build_model(cfg_bare, lat).init(key, x)
    wrapped = build_model(cfg_j, lat).init(key, x)

    n_bare = len(jax.tree_util.tree_leaves(bare))
    merged, n_copied, n_fresh = transfer_params(wrapped, bare)
    assert n_copied == n_bare          # every bare leaf landed
    assert n_fresh == 1                # only the jastrow couplings fresh
    # and the couplings stayed zero (identity at init)
    flat = jax.tree_util.tree_flatten_with_path(merged)[0]
    v = [leaf for path, leaf in flat if "Jastrow" in str(path) or
         any(getattr(k, "key", None) == "v" for k in path)]
    assert len(v) == 1 and np.allclose(np.asarray(v[0]), 0.0)

    # reverse: bare target from a jastrow-wrapped source
    merged2, n2, _ = transfer_params(bare, wrapped)
    assert n2 == n_bare
