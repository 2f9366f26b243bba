"""Split amplitude/phase ansatz (models/phasenet.py, model.phase_net_channels).

Oracles:
  * exact identity at init (gate = 0): wrapped log psi == bare, both parts.
  * |psi| preservation: Re log psi independent of trunk/gate params.
  * gradient flow: dE/d(gate) != 0 on a complex state (the saddle caveat
    is only for exactly-real inner states), and the trunk trains after
    the gate moves.
  * cell-translation invariance of the added phase (spatial-sum trunk).
  * full-sum energy descent on a frustrated gate beats the bare matched
    recipe's early steps (sanity, not a physics claim).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.builder import build_lattice, build_model, model_log_psi_is_real
from qmcnn_tpu.models.cnn import log_psi_apply


def _cfg(phase_net=(8, 8, 8), shape=(2, 3), **model_kw):
    return cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=shape, geometry="kagome"),
        model=cfglib.ModelConfig(kind="cnn", channels=(6, 6),
                                 complex_params=True, param_scale=0.05,
                                 phase_bias="sublattice_120",
                                 phase_net_channels=tuple(phase_net),
                                 **model_kw),
        hamiltonian=cfglib.HamiltonianConfig(kind="heisenberg",
                                             marshall=False),
        run=cfglib.RunConfig(seed=0, chunk_size=None),
    )


def _rand_s(key, m, n):
    return 2.0 * jax.random.bernoulli(key, 0.5, (m, n)).astype(jnp.float32) - 1.0


def test_identity_at_init_and_psi_preserved():
    cfg = _cfg()
    lat = build_lattice(cfg)
    wrapped = build_model(cfg, lat)
    bare = build_model(
        cfglib.Config(lattice=cfg.lattice,
                      model=cfglib.ModelConfig(
                          kind="cnn", channels=(6, 6), complex_params=True,
                          param_scale=0.05, phase_bias="sublattice_120"),
                      hamiltonian=cfg.hamiltonian, run=cfg.run), lat)
    s = _rand_s(jax.random.key(1), 32, lat.n_sites)
    # flax RNG folding differs between the wrapped and bare trees, so
    # align the inner params explicitly via the transfer machinery, then
    # gate=0 makes the wrapped model bit-identical to the bare one
    from qmcnn_tpu.utils.transfer import transfer_params

    pb = bare.init(jax.random.key(0), s)
    pw, n_copied, _ = transfer_params(wrapped.init(jax.random.key(5), s), pb)
    assert n_copied == len(jax.tree_util.tree_leaves(pb))
    ow = log_psi_apply(wrapped, pw, s)
    ob = log_psi_apply(bare, pb, s)
    np.testing.assert_allclose(np.asarray(ow.re), np.asarray(ob.re),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(ow.im), np.asarray(ob.im),
                               rtol=0, atol=0)

    # open the gate: |psi| (the real part) must not move at all
    flat = jax.tree_util.tree_flatten_with_path(pw)[0]
    def bump(path, leaf):
        key = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                       for k in path)
        if "gate" in key:
            return leaf + 0.7
        if "trunk" in key:
            return leaf + 0.05
        return leaf
    pw2 = jax.tree_util.tree_map_with_path(bump, pw)
    ow2 = log_psi_apply(wrapped, pw2, s)
    np.testing.assert_allclose(np.asarray(ow2.re), np.asarray(ow.re),
                               rtol=0, atol=0)
    assert not np.allclose(np.asarray(ow2.im), np.asarray(ow.im))


def test_phase_invariant_under_cell_translations():
    cfg = _cfg()
    lat = build_lattice(cfg)
    model = build_model(cfg, lat)
    s = _rand_s(jax.random.key(2), 8, lat.n_sites)
    params = model.init(jax.random.key(0), s)
    # open gate + randomize trunk so the phase term is live
    def bump(path, leaf):
        key = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                       for k in path)
        if "gate" in key:
            return leaf + 1.3
        return leaf
    params = jax.tree_util.tree_map_with_path(bump, params)
    # roll by one CELL along each axis: grid is [L1, L2, basis=3]
    grid = np.asarray(s).reshape(8, *lat.shape, lat.basis)
    o0 = log_psi_apply(model, params, s)
    for ax in (1, 2):
        sr = jnp.asarray(np.roll(grid, 1, axis=ax).reshape(8, -1))
        orr = log_psi_apply(model, params, sr)
        np.testing.assert_allclose(np.asarray(orr.re), np.asarray(o0.re),
                                   atol=1e-4)
        # phases may differ by the phase_bias prior's site-dependent part?
        # no: the prior's coloring is itself cell-periodic, so the full
        # Im part is cell-translation invariant too
        np.testing.assert_allclose(np.asarray(orr.im), np.asarray(o0.im),
                                   atol=1e-4)


def test_gate_gradient_flows_and_trunk_trains():
    from qmcnn_tpu.builder import build_hamiltonian
    from qmcnn_tpu.ops.tdvp import all_states, state_weights
    from qmcnn_tpu.ops.local_energy import local_energy

    # 2x2 cells = 12 sites: C(12,6) = 924 sz0 states keeps the full-sum
    # oracle cheap on the CPU backend
    cfg = _cfg(phase_net=(6, 6), shape=(2, 2))
    lat = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lat)
    model = build_model(cfg, lat)
    states = jnp.asarray(all_states(lat.n_sites, sz_zero=True))
    params = model.init(jax.random.key(0), states[:1])

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    def energy(p):
        w = state_weights(log_psi_fn, p, states)
        e = local_energy(log_psi_fn, p, ham, states,
                         log_psi_fn(p, states))
        return (w * e.re).sum()

    g = jax.grad(energy)(params)
    flat = {"/".join(str(getattr(k, "key", getattr(k, "name", kk)))
                     for kk, k in zip(p, p)): v
            for p, v in jax.tree_util.tree_flatten_with_path(g)[0]}
    gate_g = [v for k, v in flat.items() if "gate" in k]
    assert len(gate_g) == 1
    # complex inner + 120-degree prior -> state is not real -> the gate
    # saddle does not apply: finite first-order signal
    assert abs(float(gate_g[0])) > 1e-8
    trunk_g = [v for k, v in flat.items() if "trunk" in k]
    assert trunk_g, "trunk params missing from the gradient tree"
    # at gate == 0 the trunk scores vanish identically...
    assert all(float(jnp.abs(v).max()) == 0.0 for v in trunk_g)
    # ...and become finite once the gate moves (one SGD step on the gate)
    def bump(path, leaf):
        key = "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                       for k in path)
        return leaf + 0.5 if "gate" in key else leaf
    params2 = jax.tree_util.tree_map_with_path(bump, params)
    g2 = jax.grad(energy)(params2)
    flat2 = jax.tree_util.tree_flatten_with_path(g2)[0]
    trunk_max = max(float(jnp.abs(v).max()) for p, v in flat2
                    if any("trunk" in str(getattr(k, "key",
                                                  getattr(k, "name", k)))
                           for k in p))
    assert trunk_max > 1e-8


def test_builder_flags():
    cfg = _cfg()
    assert not model_log_psi_is_real(cfg)
    from qmcnn_tpu.builder import resolve_sampler_backend

    # the fused Pallas sweep must never select itself for wrapped models
    sq = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(4, 4)),
        model=cfglib.ModelConfig(kind="cnn", channels=(4,),
                                 phase_net_channels=(4,)),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim"),
        sampler=cfglib.SamplerConfig(backend="pallas"),
    )
    with pytest.raises(ValueError, match="pallas"):
        resolve_sampler_backend(sq)

    arnn = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(8,)),
        model=cfglib.ModelConfig(kind="arnn", channels=(16,),
                                 phase_net_channels=(4,)),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim"),
    )
    with pytest.raises(ValueError, match="phase_net"):
        build_model(arnn, build_lattice(arnn))


def test_warm_start_from_bare_checkpoint():
    from qmcnn_tpu.utils.transfer import transfer_params

    cfg = _cfg()
    lat = build_lattice(cfg)
    wrapped = build_model(cfg, lat)
    bare_cfg = cfglib.Config(
        lattice=cfg.lattice,
        model=cfglib.ModelConfig(kind="cnn", channels=(6, 6),
                                 complex_params=True, param_scale=0.05,
                                 phase_bias="sublattice_120"),
        hamiltonian=cfg.hamiltonian, run=cfg.run)
    bare = build_model(bare_cfg, lat)
    s = _rand_s(jax.random.key(3), 4, lat.n_sites)
    pw = wrapped.init(jax.random.key(7), s)
    pb = bare.init(jax.random.key(8), s)
    merged, n_copied, n_fresh = transfer_params(pw, pb)
    n_bare = len(jax.tree_util.tree_leaves(pb))
    assert n_copied == n_bare  # every bare leaf lands in the wrapped tree
    assert n_fresh > 0         # trunk + gate stay fresh
