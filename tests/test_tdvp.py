"""t-VMC / TDVP tests (ops/tdvp.py, evolve.py).

Oracles, noise-free by construction (full-sum weights):
  * solver cross-check: dense [P,P] solve == minSR sample-space solve.
  * imaginary-time rhs == -1 x the SR minsr natural gradient (same shift).
  * expectation() == dense <psi|Op|psi>/<psi|psi>.
  * imaginary-time flow converges to the ED ground energy.
  * real-time quench: TDVP observable traces track exact
    expm-propagated Schrodinger evolution of the SAME initial vector.
"""
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import log_psi_apply
from qmcnn_tpu.models.rbm import LogPsiRBM
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import TFIM
from qmcnn_tpu.ops.tdvp import TDVP, all_states, expectation, state_weights
from qmcnn_tpu.sr import SR


def make_model(n, complex_params=True, alpha=4, seed=2, scale=0.05):
    model = LogPsiRBM(lattice_shape=(n,), alpha=alpha,
                      complex_params=complex_params, tie_translations=False,
                      param_scale=scale)
    params = model.init(jax.random.key(seed), jnp.ones((1, n), jnp.float32))

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    return params, log_psi_fn


def psi_vector(log_psi_fn, params, states):
    """Normalized complex wavefunction over the enumerated basis."""
    lp = log_psi_fn(params, jnp.asarray(states))
    psi = np.exp(lp.to_numpy().astype(np.complex128))
    return psi / np.linalg.norm(psi)


@pytest.mark.slow
def test_dense_equals_minsr():
    n = 6
    lat = chain(n)
    ham = TFIM(lat, h=1.2)
    params, log_psi_fn = make_model(n)
    states = jnp.asarray(all_states(n))
    w = state_weights(log_psi_fn, params, states)
    kw = dict(log_psi_fn=log_psi_fn, ham=ham, mode="real", diag_shift=1e-3)
    r_dense = TDVP(solver="dense", **kw).rhs(params, states, w)
    r_minsr = TDVP(solver="minsr", **kw).rhs(params, states, w)
    a, _ = jax.flatten_util.ravel_pytree(r_dense.theta_dot)
    b, _ = jax.flatten_util.ravel_pytree(r_minsr.theta_dot)
    scale = np.linalg.norm(np.asarray(a))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-3 * scale)
    np.testing.assert_allclose(float(r_dense.tdvp_error),
                               float(r_minsr.tdvp_error), atol=1e-3)


def test_imag_rhs_is_minus_sr_natural_gradient():
    """With uniform weights and equal shift, d theta/d tau == -delta_SR."""
    n = 6
    lat = chain(n)
    ham = TFIM(lat, h=0.9)
    params, log_psi_fn = make_model(n)
    # uniform weights over an arbitrary batch (what MC mode uses)
    key = jax.random.key(5)
    s = jnp.asarray(
        2 * jax.random.bernoulli(key, 0.5, (32, n)).astype(jnp.float32) - 1)
    w = jnp.full((32,), 1.0 / 32)

    shift = 0.05
    tdvp = TDVP(log_psi_fn=log_psi_fn, ham=ham, mode="imag", solver="minsr",
                diag_shift=shift)
    r = tdvp.rhs(params, s, w)

    # the SR path: F from the surrogate, then the minsr solve at the same
    # (constant) shift
    from qmcnn_tpu.vmc import energy_and_grad
    from qmcnn_tpu.sampler.metropolis import WalkerState

    lp = log_psi_fn(params, s)
    walkers = WalkerState(s=s, log_psi=lp,
                          n_accept=jnp.zeros((32,), jnp.int32),
                          n_prop=jnp.zeros((32,), jnp.int32))
    _, _, grads, e_loc, _ = energy_and_grad(log_psi_fn, ham, params, walkers)
    sr = SR(solver="minsr", diag_shift0=shift, diag_shift_decay=1.0,
            diag_shift_min=shift)
    delta, _, _ = sr.solve(log_psi_fn, params, s, grads,
                           jnp.zeros((), jnp.int32), e_loc=e_loc)
    a, _ = jax.flatten_util.ravel_pytree(r.theta_dot)
    d, _ = jax.flatten_util.ravel_pytree(delta)
    scale = np.linalg.norm(np.asarray(d))
    np.testing.assert_allclose(np.asarray(a), -np.asarray(d),
                               atol=2e-4 * max(scale, 1e-6))


def test_expectation_matches_dense():
    n = 6
    lat = chain(n)
    params, log_psi_fn = make_model(n)
    states = jnp.asarray(all_states(n))
    w = state_weights(log_psi_fn, params, states)
    sx_op = TFIM(lat, j=0.0, h=1.0)   # local value = -sum_i sigma_x
    got = expectation(log_psi_fn, params, sx_op, states, w)
    psi = psi_vector(log_psi_fn, params, states)
    h = exact.sparse_tfim(n, lat.nn_bonds, j=0.0, h=1.0).toarray()
    want = np.conj(psi) @ h @ psi  # = -<sum sigma_x>
    np.testing.assert_allclose(float(got.re), want.real, atol=1e-4)
    np.testing.assert_allclose(float(got.im), want.imag, atol=1e-4)


def test_imaginary_time_converges_to_ground_state():
    n = 8
    lat = chain(n)
    ham = TFIM(lat, h=1.0)
    params, log_psi_fn = make_model(n, complex_params=False, alpha=3)
    states = jnp.asarray(all_states(n))
    tdvp = TDVP(log_psi_fn=log_psi_fn, ham=ham, mode="imag", solver="minsr",
                diag_shift=1e-3, with_im=False)

    @jax.jit
    def step(p):
        w = state_weights(log_psi_fn, p, states)
        new, r = tdvp.step_heun(
            p, 0.05, states, w,
            resample=lambda q: (states, state_weights(log_psi_fn, q, states)))
        return new, r

    for _ in range(150):
        params, r = step(params)
    e0 = exact.ground_energy(exact.sparse_tfim(n, lat.nn_bonds, h=1.0))
    assert abs(float(r.energy.re) - e0) / abs(e0) < 1e-3
    # at a converged (near-)eigenstate the zero-variance property is the
    # flow diagnostic; tdvp_error -> 1 there by construction (whatever
    # variance remains is exactly the un-projectable part)
    assert float(r.e_var) < 5e-3
    assert abs(float(r.energy.im)) < 1e-5


def test_real_time_quench_tracks_exact_evolution():
    """TFIM quench: psi0 = (near-uniform) random complex RBM state, evolved
    under H(h=2.0). The exact propagator is applied to the SAME initial
    vector, so the only discrepancies are integrator + manifold error."""
    n = 6
    lat = chain(n)
    ham = TFIM(lat, h=2.0)
    params, log_psi_fn = make_model(n, complex_params=True, alpha=4,
                                    scale=0.03)
    states_np = all_states(n)
    states = jnp.asarray(states_np)
    h_sp = exact.sparse_tfim(n, lat.nn_bonds, h=2.0).tocsc()
    sx_sp = exact.sparse_tfim(n, lat.nn_bonds, j=0.0, h=1.0).tocsc()

    def sx_of(psi):
        return -np.real(np.conj(psi) @ (sx_sp @ psi)) / n

    tdvp = TDVP(log_psi_fn=log_psi_fn, ham=ham, mode="real", solver="minsr",
                diag_shift=1e-4)
    dt = 0.01
    sx_op = TFIM(lat, j=0.0, h=1.0)

    @jax.jit
    def step(p):
        w = state_weights(log_psi_fn, p, states)
        new, r = tdvp.step_heun(
            p, dt, states, w,
            resample=lambda q: (states, state_weights(log_psi_fn, q, states)))
        sx = -expectation(log_psi_fn, p, sx_op, states, w).re / n
        return new, r, sx

    psi0 = psi_vector(log_psi_fn, params, states)
    e0 = None
    for it in range(1, 51):
        params, r, sx_var = step(params)
        if e0 is None:
            e0 = float(r.energy.re)
        t = it * dt
        if it in (25, 50):
            psi_exact = spla.expm_multiply(-1j * t * h_sp, psi0)
            sx_exact = sx_of(psi_exact)
            np.testing.assert_allclose(float(sx_var), sx_exact, atol=2e-2)
    # unitarity diagnostics: energy conserved, projection error small
    assert abs(float(r.energy.re) - e0) < 5e-3 * abs(e0) + 1e-3
    assert float(r.tdvp_error) < 5e-2


def test_evolve_cli_fullsum_imag(tmp_path):
    """End-to-end evolve() driver: imaginary-time full-sum on TFIM N=6."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.evolve import evolve

    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(6,)),
        model=cfglib.ModelConfig(kind="rbm", rbm_alpha=3,
                                 rbm_tie_translations=False,
                                 param_scale=0.05),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim", h=1.0),
        run=cfglib.RunConfig(seed=1, chunk_size=None),
    )
    csv = str(tmp_path / "ite.csv")
    _, logger = evolve(cfg, mode="imag", dt=0.05, n_steps=120,
                       solver="dense", integrator="heun",
                       sampling="fullsum", csv_path=csv, log_every=20)
    lat = chain(6)
    e0 = exact.ground_energy(exact.sparse_tfim(6, lat.nn_bonds, h=1.0))
    rows = np.genfromtxt(csv, delimiter=",", names=True)
    assert abs(rows["energy_re"][-1] - e0) / abs(e0) < 2e-3


def test_evolve_mc_smoke():
    """MC-mode imaginary time: runs and lowers the energy."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.evolve import evolve

    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(6,)),
        model=cfglib.ModelConfig(kind="rbm", rbm_alpha=2,
                                 rbm_tie_translations=False,
                                 param_scale=0.05),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim", h=1.0),
        sampler=cfglib.SamplerConfig(n_walkers=128, n_therm_sweeps=20),
        run=cfglib.RunConfig(seed=3, chunk_size=None),
    )
    _, logger = evolve(cfg, mode="imag", dt=0.05, n_steps=40,
                       solver="minsr", integrator="euler", sampling="mc",
                       log_every=40)
    e_tail, _ = logger.tail_energy()
    lat = chain(6)
    e0 = exact.ground_energy(exact.sparse_tfim(6, lat.nn_bonds, h=1.0))
    # loose: MC noise + short run; just demand real progress toward E0 < 0
    assert e_tail < 0.6 * e0


def test_evolve_corr_csv_tracks_correlations(tmp_path):
    """--corr-csv: C(r, t) rows with exact invariants — C(0) = 1/4 (sz^2
    is constant), translation-averaged symmetry C(r) = C(-r), and under
    full-sum Born weights the t->0 row must match a direct enumeration of
    <psi|S^z_0 S^z_r|psi> / <psi|psi> for the initial state."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.evolve import evolve
    from qmcnn_tpu.models.cnn import log_psi_apply
    from qmcnn_tpu.builder import build_model

    n = 6
    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(n,)),
        model=cfglib.ModelConfig(kind="rbm", rbm_alpha=2,
                                 rbm_tie_translations=False,
                                 param_scale=0.05),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim", h=1.0),
        run=cfglib.RunConfig(seed=1, chunk_size=None),
    )
    corr_csv = str(tmp_path / "corr.csv")
    evolve(cfg, mode="imag", dt=0.02, n_steps=3, solver="dense",
           integrator="euler", sampling="fullsum", corr_csv=corr_csv,
           log_every=1)
    rows = np.genfromtxt(corr_csv, delimiter=",", names=True)
    assert rows.shape == (3,)
    cols = [f"c{r}" for r in range(n)]
    # C(0) = 1/4 on every row
    np.testing.assert_allclose(rows["c0"], 0.25, atol=1e-6)
    # PBC translation-averaged symmetry: C(r) == C(N - r)
    for r in range(1, n):
        np.testing.assert_allclose(rows[cols[r]], rows[cols[n - r]],
                                   atol=1e-6)

    # oracle for the first logged row: observables are evaluated on the
    # PRE-update state, so row 0 is the seed-1 initial state itself —
    # exact Born-weighted enumeration, no stepping
    lat = chain(n)
    model = build_model(cfg, lat)
    params = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.key(cfg.run.seed),
                   jnp.ones((1, n), jnp.float32)))
    from qmcnn_tpu.ops.tdvp import all_states, state_weights

    def lp(p, s):
        return log_psi_apply(model, p, s)

    states = jnp.asarray(all_states(n, sz_zero=False))
    w1 = np.asarray(state_weights(lp, params, states))
    s_np = np.asarray(states) / 2.0
    want = np.zeros(n)
    for r in range(n):
        acc = 0.0
        for i in range(n):
            acc += (w1 * s_np[:, i] * s_np[:, (i + r) % n]).sum()
        want[r] = acc / n
    got = np.array([rows[c][0] for c in cols])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_evolve_halts_on_nonfinite_state(tmp_path):
    """A capacity/stiffness blowup must end the trajectory at the first
    non-finite logged row instead of stepping NaNs to n_steps (the
    chain-12 full-sum quench burned ~7 min of chip doing that)."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.evolve import evolve

    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(6,)),
        model=cfglib.ModelConfig(kind="rbm", rbm_alpha=2,
                                 rbm_tie_translations=False,
                                 complex_params=True,
                                 param_scale=0.05),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim", h=1.0),
        run=cfglib.RunConfig(seed=1, chunk_size=None),
    )
    csv = str(tmp_path / "blowup.csv")
    # real-time Euler at an absurd dt diverges within a few steps
    evolve(cfg, mode="real", dt=50.0, n_steps=200, solver="dense",
           integrator="euler", sampling="fullsum", csv_path=csv,
           log_every=1)
    rows = np.genfromtxt(csv, delimiter=",", names=True)
    assert rows.size < 200, "trajectory was not halted"
    assert not np.isfinite(rows["energy_re"][-1])
    assert np.isfinite(rows["energy_re"][:-1]).all() or rows.size <= 2


def test_evolve_refuses_real_mode_on_real_ansatz(tmp_path):
    """mode='real' on a provably-real log psi is a silent no-op (the real
    tangent space is orthogonal to -i(H - <H>)|psi>, so theta-dot == 0 and
    tdvp_error pins at 1) — evolve must refuse with an actionable message
    instead of burning chip time on frozen 'dynamics'."""
    import pytest

    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.evolve import evolve

    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(6,)),
        model=cfglib.ModelConfig(kind="rbm", rbm_alpha=2,
                                 rbm_tie_translations=False,
                                 param_scale=0.05),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim", h=1.0),
        run=cfglib.RunConfig(seed=1, chunk_size=None),
    )
    with pytest.raises(ValueError, match="complex_params"):
        evolve(cfg, mode="real", dt=0.01, n_steps=5, solver="dense",
               integrator="euler", sampling="fullsum",
               csv_path=str(tmp_path / "x.csv"))
    # imaginary time on the same real ansatz remains legal
    evolve(cfg, mode="imag", dt=0.05, n_steps=2, solver="dense",
           integrator="euler", sampling="fullsum",
           csv_path=str(tmp_path / "ok.csv"))
