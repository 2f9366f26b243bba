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


# ----------------------------------------------------------- pair phases
@pytest.mark.parametrize("lat", [square(4), triangular(3, 3)],
                         ids=lambda l: l.geometry)
def test_phase_factor_oracle_and_amplitude_preserved(lat):
    """jastrow_phase: the imaginary shift equals the explicit pair sum
    and |psi| (the real part) is bit-identical to the inner model."""
    inner = _ScalarInner()
    wrapped = wrap_jastrow(inner, lat, amplitude=False, phase=True)
    s = _random_s(jax.random.key(8), lat, batch=5)
    vi = inner.init(jax.random.key(9), s)
    vw = wrapped.init(jax.random.key(9), s)
    assert "u" in vw["params"] and "v" not in vw["params"]
    rng = np.random.default_rng(7)
    u = rng.normal(size=vw["params"]["u"].shape).astype(np.float32)
    variables = {"params": {"inner": vi["params"], "u": jnp.asarray(u)}}
    out_w = log_psi_apply(wrapped, variables, s)
    out_i = log_psi_apply(inner, vi, s)
    np.testing.assert_array_equal(np.asarray(out_w.re), np.asarray(out_i.re))
    cm, _ = distance_classes(lat)
    sn = np.asarray(s)
    want = np.zeros(s.shape[0])
    for b in range(s.shape[0]):
        acc = 0.0
        for i in range(lat.n_sites):
            for j in range(lat.n_sites):
                if i != j:
                    acc += 0.5 * u[cm[i, j]] * sn[b, i] * sn[b, j]
        want[b] = acc
    np.testing.assert_allclose(np.asarray(out_w.im) - np.asarray(out_i.im),
                               want, rtol=2e-5, atol=2e-5)


def test_builder_phase_wiring():
    """jastrow_phase wires through the builder, disqualifies the
    real-log-psi SR fast path, and composes with the ARNN (pure phase
    preserves the exact-sampling normalization)."""
    from qmcnn_tpu.builder import model_log_psi_is_real

    lat = square(4)
    cfg = Config(name="t", lattice=LatticeConfig(shape=(4, 4)),
                 model=ModelConfig(kind="cnn", channels=(4,),
                                   jastrow_phase=True))
    model = build_model(cfg, lat)
    s = _random_s(jax.random.key(10), lat)
    variables = model.init(jax.random.key(11), s)
    flat = jax.tree_util.tree_leaves_with_path(variables)
    assert any("'u'" in jax.tree_util.keystr(p) for p, _ in flat)
    assert not any("'v'" in jax.tree_util.keystr(p) for p, _ in flat)
    assert not model_log_psi_is_real(cfg)

    arnn = Config(name="t", lattice=LatticeConfig(shape=(4, 4)),
                  model=ModelConfig(kind="arnn", channels=(8,),
                                    jastrow_phase=True))
    build_model(arnn, lat)  # must not raise


def test_arnn_pair_phase_preserves_exact_sampling():
    """jastrow_phase on the ARNN: the builder wraps the model (so
    estimators see the pair phases: a 'u' param exists and Im log psi
    moves with it) while |psi| and the exact normalization are
    bit-untouched — and the DirectSampler still reaches the inner
    conditionals through the wrapper."""
    from qmcnn_tpu.builder import build
    from qmcnn_tpu.configs import HamiltonianConfig
    from qmcnn_tpu.ops.tdvp import all_states

    n = 8
    cfg = Config(name="t", lattice=LatticeConfig(shape=(n,)),
                 model=ModelConfig(kind="arnn", channels=(16,),
                                   complex_params=True, jastrow_phase=True),
                 hamiltonian=HamiltonianConfig(kind="heisenberg"))
    vmc, params, lat = build(cfg)
    assert "u" in params["params"]

    states = jnp.asarray(all_states(n, sz_zero=True), jnp.float32)
    out0 = vmc.log_psi_fn(params, states)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=params["params"]["u"].shape)
                    .astype(np.float32))
    params_u = {"params": {**params["params"], "u": u}}
    out1 = vmc.log_psi_fn(params_u, states)
    # |psi| untouched, phases moved
    np.testing.assert_array_equal(np.asarray(out1.re), np.asarray(out0.re))
    assert np.max(np.abs(np.asarray(out1.im) - np.asarray(out0.im))) > 0.01
    # exact normalization survives (the ARNN's defining contract)
    norm = float(np.exp(2.0 * np.asarray(out1.re, np.float64)).sum())
    np.testing.assert_allclose(norm, 1.0, rtol=1e-4)
    # the sampler runs through the wrapper (conditionals reached via
    # the 'inner' params) and stays in the sector
    state = vmc.init_state(jax.random.key(0), 64, params_u)
    state = vmc.thermalize(state, jax.random.key(1), jnp.arange(64),
                           n_sweeps=1)
    assert np.all(np.asarray(state.walkers.s).sum(axis=1) == 0)


def test_phase_zero_is_a_saddle_for_real_states():
    """Design fact the docstring documents: at u = 0 over a REAL state
    the pair-phase gradient vanishes identically (E(u) is even under
    conjugation: dE/du = i<[H, Q]> = 0), so deterministic training from
    a real inner never moves u. Verified exactly by full-sum autodiff."""
    from qmcnn_tpu.configs import HamiltonianConfig
    from qmcnn_tpu.ops import exact

    lat = triangular(3, 3)
    n = lat.n_sites
    h_d = jnp.asarray(
        exact.sparse_heisenberg(n, lat.nn_bonds).toarray(), jnp.float32)
    states = jnp.asarray(exact._spins(n), jnp.float32)
    cfg = Config(name="t", lattice=LatticeConfig(shape=(3, 3),
                                                 geometry="triangular"),
                 model=ModelConfig(kind="cnn", channels=(4,), kernel_size=3,
                                   init_mode="fan_in", activation="selu",
                                   param_scale=1.0, jastrow_phase=True),
                 hamiltonian=HamiltonianConfig(kind="heisenberg"))
    model = build_model(cfg, lat)
    params = model.init(jax.random.key(12), states[:1])

    def energy(p):
        out = log_psi_apply(model, p, states)
        m = jnp.max(out.re)
        pr = jnp.exp(out.re - m) * jnp.cos(out.im)
        pi = jnp.exp(out.re - m) * jnp.sin(out.im)
        num = pr @ (h_d @ pr) + pi @ (h_d @ pi)
        return num / (pr @ pr + pi @ pi)

    g = jax.grad(energy)(params)
    np.testing.assert_allclose(np.asarray(g["params"]["u"]), 0.0, atol=1e-7)
    # conv gradients are NOT zero — only the phase direction is the saddle
    gnorm = sum(float(jnp.abs(leaf).sum())
                for leaf in jax.tree_util.tree_leaves(g["params"]["inner"]))
    assert gnorm > 1e-3


def test_phase_breaks_the_positive_ansatz_floor():
    """Frustrated oracle: on the J1-J2 chain past the Majumdar-Ghosh
    point the ground-state sign structure is NOT Marshall, so a sign-free
    ansatz (real CNN + amplitude Jastrow) has a variational floor
    strictly above E0; learnable pair phases must break through it.
    Full-sum Rayleigh quotient in the S^z = 0 sector (the unrestricted
    basis lets adam park on the polarized eigenstate — measured),
    matched adam budgets, deterministic; u is perturbed off its saddle
    (see test above) exactly as a warm start from a real checkpoint
    would be."""
    import optax

    from qmcnn_tpu.configs import HamiltonianConfig
    from qmcnn_tpu.ops import exact
    from qmcnn_tpu.ops.tdvp import all_states

    lat = chain(8)
    n, j2 = lat.n_sites, 0.6
    h_full = exact.sparse_heisenberg(n, lat.nn_bonds,
                                     nnn_bonds=lat.nnn_bonds,
                                     j2=j2).toarray()
    states_np = all_states(n, sz_zero=True)
    ix = ((states_np + 1) // 2 @ (1 << np.arange(n))).astype(np.int64)
    h_d = jnp.asarray(h_full[np.ix_(ix, ix)], jnp.float32)
    states = jnp.asarray(states_np, jnp.float32)

    def run(phase: bool, steps=400):
        cfg = Config(name="t", lattice=LatticeConfig(shape=(n,)),
                     model=ModelConfig(kind="cnn", channels=(6, 6),
                                       kernel_size=3, init_mode="fan_in",
                                       activation="selu", param_scale=1.0,
                                       jastrow=True, jastrow_phase=phase),
                     hamiltonian=HamiltonianConfig(kind="j1j2", j2=j2))
        model = build_model(cfg, lat)
        params = model.init(jax.random.key(12), states[:1])
        if phase:
            u0 = 0.05 * jax.random.normal(jax.random.key(13),
                                          params["params"]["u"].shape)
            params = {"params": {**params["params"], "u": u0}}

        def energy(p):
            out = log_psi_apply(model, p, states)
            m = jnp.max(out.re)
            pr = jnp.exp(out.re - m) * jnp.cos(out.im)
            pi = jnp.exp(out.re - m) * jnp.sin(out.im)
            num = pr @ (h_d @ pr) + pi @ (h_d @ pi)
            return num / (pr @ pr + pi @ pi)

        opt = optax.adam(0.01)  # 0.03+ collapses onto product states
        ostate = opt.init(params)

        @jax.jit
        def gd(p, o):
            e, g = jax.value_and_grad(energy)(p)
            up, o = opt.update(g, o)
            return optax.apply_updates(p, up), o, e

        for _ in range(steps):
            params, ostate, e = gd(params, ostate)
        return float(energy(params))

    e_amp = run(phase=False)
    e_phase = run(phase=True)
    e0 = float(np.linalg.eigvalsh(np.asarray(h_d, np.float64))[0])
    # measured: amp floor -1.1996, phase arm -2.20, E0 -3.09
    assert e_phase < e_amp - 0.3, (e_amp, e_phase, e0)
    assert e_phase > e0 - 1e-4  # still variational
