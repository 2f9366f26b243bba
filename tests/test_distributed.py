"""Distributed tests on 8 virtual CPU devices (SURVEY.md section 4,
'Distributed' tier): the n-device shard_map run must match the 1-device run
walker-for-walker (same global walker seeds), which also catches the classic
double-pmean bug (any mis-placed collective changes values by ~n_dev)."""
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops.hamiltonians import TFIM, Heisenberg
from qmcnn_tpu.parallel.mesh import make_sharded_vmc, walker_mesh
from qmcnn_tpu.sampler.metropolis import MetropolisSampler
from qmcnn_tpu.sr import SR
from qmcnn_tpu.vmc import VMC

N = 8
M = 64


def build(axis_name, move="flip", sr=None):
    lat = chain(N)
    ham = TFIM(lat, h=1.0) if move == "flip" else Heisenberg(lat)
    model = LogPsiCNN(lattice_shape=(N,), channels=(4,), param_scale=0.1)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, N), jnp.float32))
    bonds = lat.nn_bonds if move.startswith("exchange") else None
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move=move, bonds=bonds)
    vmc = VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
              optimizer=optax.sgd(0.02), n_sweeps=1, sr=sr,
              axis_name=axis_name)
    return vmc, params


def flat(tree):
    return np.asarray(jax.flatten_util.ravel_pytree(tree)[0])


@pytest.mark.slow
@pytest.mark.parametrize("move", ["flip", "exchange", "exchange_anti"])
def test_sharded_step_matches_single_device(eight_devices, move):
    mesh = walker_mesh(8)
    vmc1, params = build(axis_name=None, move=move)
    vmc8, _ = build(axis_name="dp", move=move)

    state1 = vmc1.init_state(jax.random.key(1), M, params)
    sharded = make_sharded_vmc(vmc8, mesh, state1)
    state8 = sharded.init_state(jax.random.key(1), M, params)

    np.testing.assert_array_equal(np.asarray(state1.walkers.s),
                                  np.asarray(state8.walkers.s))

    step1 = jax.jit(vmc1.step)
    ids = jnp.arange(M)
    for it in range(3):
        key = jax.random.fold_in(jax.random.key(2), it)
        state1, m1 = step1(state1, key, ids)
        state8, m8 = sharded.step(state8, key)
        # identical proposals/accepts -> identical walkers
        np.testing.assert_array_equal(np.asarray(state1.walkers.s),
                                      np.asarray(state8.walkers.s))
        # estimators equal up to reduction order
        np.testing.assert_allclose(float(m1.energy_re), float(m8.energy_re),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(float(m1.energy_var), float(m8.energy_var),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(float(m1.accept_rate),
                                   float(m8.accept_rate), rtol=1e-6)
        np.testing.assert_allclose(flat(state1.params), flat(state8.params),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_sharded_sr_matches_single_device(eight_devices):
    """Distributed CG: pmean inside every matvec must reproduce the global
    solve (SURVEY.md P2)."""
    mesh = walker_mesh(8)
    sr = SR(solver="cg", diag_shift0=0.1, diag_shift_decay=1.0,
            diag_shift_min=0.1, cg_tol=1e-6, cg_maxiter=200)
    vmc1, params = build(axis_name=None, sr=sr)
    vmc8, _ = build(axis_name="dp", sr=sr)
    state1 = vmc1.init_state(jax.random.key(1), M, params)
    sharded = make_sharded_vmc(vmc8, mesh, state1)
    state8 = sharded.init_state(jax.random.key(1), M, params)

    key = jax.random.key(5)
    state1, m1 = jax.jit(vmc1.step)(state1, key, jnp.arange(M))
    state8, m8 = sharded.step(state8, key)
    np.testing.assert_allclose(flat(state1.params), flat(state8.params),
                               rtol=5e-3, atol=5e-6)
    np.testing.assert_allclose(float(m1.energy_re), float(m8.energy_re),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_pcg_and_dense_run(eight_devices):
    """pcg/dense SR backends execute under shard_map and stay finite."""
    mesh = walker_mesh(8)
    for solver in ["pcg", "dense"]:
        sr = SR(solver=solver, diag_shift0=0.1, diag_shift_decay=1.0,
                diag_shift_min=0.1)
        vmc8, params = build(axis_name="dp", sr=sr)
        tmpl_vmc, _ = build(axis_name=None, sr=None)
        tmpl = tmpl_vmc.init_state(jax.random.key(1), M, params)
        sharded = make_sharded_vmc(vmc8, mesh, tmpl)
        state = sharded.init_state(jax.random.key(1), M, params)
        state, m = sharded.step(state, jax.random.key(6))
        assert np.isfinite(float(m.energy_re)), solver
        assert np.all(np.isfinite(flat(state.params))), solver


def test_thermalize_sharded(eight_devices):
    mesh = walker_mesh(8)
    vmc8, params = build(axis_name="dp")
    tmpl_vmc, _ = build(axis_name=None)
    tmpl = tmpl_vmc.init_state(jax.random.key(1), M, params)
    sharded = make_sharded_vmc(vmc8, mesh, tmpl)
    state = sharded.init_state(jax.random.key(1), M, params)
    out = sharded.thermalize(state, jax.random.key(7), n_sweeps=2)
    assert out.walkers.s.shape == (M, N)
    # matches unsharded thermalize walker-for-walker
    tmpl_therm = tmpl_vmc.thermalize(tmpl, jax.random.key(7), jnp.arange(M),
                                     n_sweeps=2)
    np.testing.assert_array_equal(np.asarray(out.walkers.s),
                                  np.asarray(tmpl_therm.walkers.s))


def test_mesh_validation():
    mesh = walker_mesh(8)
    vmc8, params = build(axis_name="dp")
    state = build(axis_name=None)[0].init_state(jax.random.key(1), 60, params)
    from qmcnn_tpu.parallel.mesh import shard_train_state
    with pytest.raises(ValueError):
        shard_train_state(state, mesh)  # 60 walkers not divisible by 8
    with pytest.raises(ValueError):
        vmc_bad, _ = build(axis_name=None)
        make_sharded_vmc(vmc_bad, mesh, state)

def test_run_steps_matches_stepwise(eight_devices):
    """K fused steps (one dispatch) == K individual step() calls."""
    mesh = walker_mesh(8)
    vmc8, params = build(axis_name="dp")
    tmpl = build(axis_name=None)[0].init_state(jax.random.key(1), M, params)
    sharded = make_sharded_vmc(vmc8, mesh, tmpl)

    base_key = jax.random.key(9)
    s0 = sharded.init_state(jax.random.key(1), M, params)
    fused, ms = sharded.run_steps(s0, base_key, 4)
    assert ms.energy_re.shape == (4,)

    loop = sharded.init_state(jax.random.key(1), M, params)
    singles = []
    for _ in range(4):
        key = jax.random.fold_in(base_key, loop.step)
        loop, m = sharded.step(loop, key)
        singles.append(float(m.energy_re))
    np.testing.assert_allclose(flat(fused.params), flat(loop.params),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ms.energy_re), singles, rtol=1e-5)
    assert int(fused.step) == 4


@pytest.mark.slow
def test_sharded_gcnn_matches_single_device(eight_devices):
    """GCNN under shard_map: the trace-time kernel-expansion gathers must
    behave identically inside the mesh-sharded step (walker-for-walker)."""
    from qmcnn_tpu.lattice import square
    from qmcnn_tpu.models.gcnn import LogPsiGCNN

    lat = square(4, 4)
    ham = Heisenberg(lat)
    model = LogPsiGCNN(lattice_shape=(4, 4), channels=(2, 2),
                       complex_params=True, param_scale=0.1)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, 16), jnp.float32))

    def make(axis_name):
        sampler = MetropolisSampler(log_psi_fn, n_sites=16, move="exchange",
                                    bonds=lat.nn_bonds)
        return VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
                   optimizer=optax.sgd(0.02), n_sweeps=1,
                   axis_name=axis_name)

    mesh = walker_mesh(8)
    vmc1, vmc8 = make(None), make("dp")
    state1 = vmc1.init_state(jax.random.key(1), M, params)
    sharded = make_sharded_vmc(vmc8, mesh, state1)
    state8 = sharded.init_state(jax.random.key(1), M, params)
    for it in range(2):
        key = jax.random.fold_in(jax.random.key(9), it)
        state1, m1 = jax.jit(vmc1.step)(state1, key, jnp.arange(M))
        state8, m8 = sharded.step(state8, key)
        np.testing.assert_array_equal(np.asarray(state1.walkers.s),
                                      np.asarray(state8.walkers.s))
        np.testing.assert_allclose(float(m1.energy_re), float(m8.energy_re),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(flat(state1.params), flat(state8.params),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_sharded_gcnn_minsr_hero_path_matches_single_device(eight_devices):
    """The production J1-J2 hero path — complex GCNN + spin-parity
    projection + exchange_anti moves + distributed minSR — must be
    walker-for-walker and parameter-identical to the single-device run
    (VERDICT r1 item 7: every hero path gets a sharded-equality
    guarantee)."""
    from qmcnn_tpu.lattice import square
    from qmcnn_tpu.models.gcnn import LogPsiGCNN, SpinFlipSymmetrized

    lat = square(4, 4)
    ham = Heisenberg(lat, j2=0.5)
    model = SpinFlipSymmetrized(
        inner=LogPsiGCNN(lattice_shape=(4, 4), channels=(2, 2),
                         complex_params=True, param_scale=0.1),
        sector=1)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, 16), jnp.float32))
    sr = SR(solver="minsr", diag_shift0=0.1, diag_shift_decay=1.0,
            diag_shift_min=0.1)

    def make(axis_name):
        sampler = MetropolisSampler(log_psi_fn, n_sites=16,
                                    move="exchange_anti",
                                    bonds=lat.nn_bonds)
        return VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
                   optimizer=optax.sgd(0.02), n_sweeps=1, sr=sr,
                   axis_name=axis_name)

    mesh = walker_mesh(8)
    vmc1, vmc8 = make(None), make("dp")
    state1 = vmc1.init_state(jax.random.key(1), M, params)
    sharded = make_sharded_vmc(vmc8, mesh, state1)
    state8 = sharded.init_state(jax.random.key(1), M, params)
    for it in range(2):
        key = jax.random.fold_in(jax.random.key(11), it)
        state1, m1 = jax.jit(vmc1.step)(state1, key, jnp.arange(M))
        state8, m8 = sharded.step(state8, key)
        np.testing.assert_array_equal(np.asarray(state1.walkers.s),
                                      np.asarray(state8.walkers.s))
        np.testing.assert_allclose(float(m1.energy_re), float(m8.energy_re),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(flat(state1.params), flat(state8.params),
                                   rtol=5e-4, atol=5e-6)


@pytest.mark.slow
def test_sharded_arnn_direct_sampler_matches_single_device(eight_devices):
    """The exact-sampling path (ARNN + DirectSampler + SR) under shard_map:
    ancestral draws are keyed by global walker id, so the n-device run must
    reproduce the 1-device samples walker-for-walker."""
    from qmcnn_tpu.models.arnn import LogPsiARNN, conditional_fn
    from qmcnn_tpu.sampler.direct import DirectSampler

    lat = chain(N)
    ham = Heisenberg(lat)
    model = LogPsiARNN(n_sites=N, hidden=(8, 8), sz_zero=True)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, N), jnp.float32))
    sr = SR(solver="minsr", diag_shift0=0.1, diag_shift_decay=1.0,
            diag_shift_min=0.1)

    def make(axis_name):
        sampler = DirectSampler(log_psi_fn, conditional_fn(model),
                                n_sites=N, sz_zero=True)
        return VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
                   optimizer=optax.sgd(0.02), n_sweeps=1, sr=sr,
                   axis_name=axis_name)

    mesh = walker_mesh(8)
    vmc1, vmc8 = make(None), make("dp")
    state1 = vmc1.init_state(jax.random.key(1), M, params)
    sharded = make_sharded_vmc(vmc8, mesh, state1)
    state8 = sharded.init_state(jax.random.key(1), M, params)
    for it in range(2):
        key = jax.random.fold_in(jax.random.key(12), it)
        state1, m1 = jax.jit(vmc1.step)(state1, key, jnp.arange(M))
        state8, m8 = sharded.step(state8, key)
        assert np.all(np.asarray(state1.walkers.s).sum(-1) == 0)
        np.testing.assert_array_equal(np.asarray(state1.walkers.s),
                                      np.asarray(state8.walkers.s))
        np.testing.assert_allclose(float(m1.energy_re), float(m8.energy_re),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(flat(state1.params), flat(state8.params),
                                   rtol=5e-4, atol=5e-6)


@pytest.mark.slow
def test_sharded_tempered_step_matches_single_device(eight_devices):
    """Parallel tempering under shard_map: replica rows stay with their
    walker's device (replica-fastest layout) and per-row streams key off
    global physical ids — 8-device == 1-device, swaps included."""
    lat = chain(N)
    ham = Heisenberg(lat)
    model = LogPsiCNN(lattice_shape=(N,), channels=(4,), param_scale=0.1)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, N), jnp.float32))

    def mk(axis_name):
        sampler = MetropolisSampler(
            log_psi_fn, n_sites=N, move="exchange_anti", bonds=lat.nn_bonds,
            betas=(1.0, 0.6, 0.3))
        return VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
                   optimizer=optax.sgd(0.02), n_sweeps=1,
                   axis_name=axis_name)

    mesh = walker_mesh(8)
    vmc1, vmc8 = mk(None), mk("dp")
    state1 = vmc1.init_state(jax.random.key(1), M, params)
    sharded = make_sharded_vmc(vmc8, mesh, state1)
    state8 = sharded.init_state(jax.random.key(1), M, params)
    assert state1.walkers.s.shape[0] == 3 * M

    step1 = jax.jit(vmc1.step)
    ids = jnp.arange(M)
    for it in range(3):
        key = jax.random.fold_in(jax.random.key(2), it)
        state1, m1 = step1(state1, key, ids)
        state8, m8 = sharded.step(state8, key)
        np.testing.assert_array_equal(np.asarray(state1.walkers.s),
                                      np.asarray(state8.walkers.s))
        np.testing.assert_allclose(float(m1.energy_re), float(m8.energy_re),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(flat(state1.params), flat(state8.params),
                                   rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_sharded_vit_minsr_matches_single_device(eight_devices):
    """The ViT family on the hero-style path — factored-attention ViT +
    spin-parity projection + exchange_anti + distributed minSR — must be
    walker-for-walker and parameter-identical to the single-device run
    (extends the per-family sharded-equality matrix to the new ansatz)."""
    from qmcnn_tpu.lattice import square
    from qmcnn_tpu.models.gcnn import SpinFlipSymmetrized
    from qmcnn_tpu.models.vit import LogPsiViT

    lat = square(4, 4)
    ham = Heisenberg(lat, j2=0.5)
    model = SpinFlipSymmetrized(
        inner=LogPsiViT(lattice_shape=(4, 4), channels=(8,), patch=2,
                        n_heads=2, complex_params=True, param_scale=0.1),
        sector=1)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, 16), jnp.float32))
    sr = SR(solver="minsr", diag_shift0=0.1, diag_shift_decay=1.0,
            diag_shift_min=0.1)

    def make(axis_name):
        sampler = MetropolisSampler(log_psi_fn, n_sites=16,
                                    move="exchange_anti",
                                    bonds=lat.nn_bonds)
        return VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
                   optimizer=optax.sgd(0.02), n_sweeps=1, sr=sr,
                   axis_name=axis_name)

    mesh = walker_mesh(8)
    vmc1, vmc8 = make(None), make("dp")
    state1 = vmc1.init_state(jax.random.key(1), M, params)
    sharded = make_sharded_vmc(vmc8, mesh, state1)
    state8 = sharded.init_state(jax.random.key(1), M, params)
    for it in range(2):
        key = jax.random.fold_in(jax.random.key(11), it)
        state1, m1 = jax.jit(vmc1.step)(state1, key, jnp.arange(M))
        state8, m8 = sharded.step(state8, key)
        np.testing.assert_array_equal(np.asarray(state1.walkers.s),
                                      np.asarray(state8.walkers.s))
        np.testing.assert_allclose(float(m1.energy_re), float(m8.energy_re),
                                   rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(flat(state1.params), flat(state8.params),
                                   rtol=5e-4, atol=5e-6)
