"""Integration test: BASELINE config 2 at CI scale — Heisenberg chain with
exchange (SWAP) moves, Marshall sign rule, and stochastic reconfiguration,
validated against exact diagonalization (SURVEY.md section 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import Heisenberg
from qmcnn_tpu.sampler.metropolis import MetropolisSampler
from qmcnn_tpu.sr import SR
from qmcnn_tpu.vmc import VMC


@pytest.mark.slow
def test_heisenberg_chain_sr_converges_to_ed():
    n = 12
    lat = chain(n)
    ham = Heisenberg(lat, marshall=True)
    e_exact = exact.ground_energy(exact.sparse_heisenberg(n, lat.nn_bonds))

    model = LogPsiCNN(lattice_shape=(n,), channels=(8, 8), param_scale=0.05)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, n), jnp.float32))
    sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="exchange",
                                bonds=lat.nn_bonds)
    sr = SR(solver="dense", diag_shift0=1.0, diag_shift_decay=0.93,
            diag_shift_min=1e-2)
    vmc = VMC(
        log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
        optimizer=optax.chain(optax.clip_by_global_norm(1.0),
                              optax.sgd(0.05)),
        n_sweeps=2, sr=sr,
    )

    m = 256
    ids = jnp.arange(m)
    state = vmc.init_state(jax.random.key(1), m, params)
    state = vmc.thermalize(state, jax.random.key(2), ids, n_sweeps=20)
    step = jax.jit(vmc.step)

    energies = []
    for it in range(200):
        state, metrics = step(
            state, jax.random.fold_in(jax.random.key(3), it), ids
        )
        energies.append(float(metrics.energy_re))
        assert np.isfinite(energies[-1])
        # exchange moves keep every walker in the S^z = 0 sector
        if it % 50 == 0:
            assert np.all(np.asarray(state.walkers.s).sum(axis=-1) == 0)

    e_tail = np.mean(energies[-40:])
    rel_err = abs(e_tail - e_exact) / abs(e_exact)
    assert rel_err < 1e-2, (
        f"E_vmc={e_tail:.4f} vs E_exact={e_exact:.4f}, rel_err={rel_err:.3e}"
    )


@pytest.mark.slow
def test_xxz_chain_sr_converges_to_ed():
    """XXZ anisotropy end-to-end: delta=0.5 chain trains to < 1% of ED
    with the same exchange/Marshall/SR recipe as the isotropic point."""
    n = 10
    delta = 0.5
    lat = chain(n)
    ham = Heisenberg(lat, marshall=True, delta=delta)
    e_exact = exact.ground_energy(
        exact.sparse_heisenberg(n, lat.nn_bonds, delta=delta))

    model = LogPsiCNN(lattice_shape=(n,), channels=(6, 6), param_scale=0.05)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, n), jnp.float32))
    sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="exchange",
                                bonds=lat.nn_bonds)
    sr = SR(solver="dense", diag_shift0=1.0, diag_shift_decay=0.93,
            diag_shift_min=1e-2)
    vmc = VMC(
        log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
        optimizer=optax.chain(optax.clip_by_global_norm(1.0),
                              optax.sgd(0.05)),
        n_sweeps=2, sr=sr,
    )
    m = 256
    ids = jnp.arange(m)
    state = vmc.init_state(jax.random.key(1), m, params)
    state = vmc.thermalize(state, jax.random.key(2), ids, n_sweeps=20)
    step = jax.jit(vmc.step)
    energies = []
    for it in range(150):
        state, metrics = step(
            state, jax.random.fold_in(jax.random.key(3), it), ids)
        energies.append(float(metrics.energy_re))
        assert np.isfinite(energies[-1])
    e_tail = np.mean(energies[-30:])
    rel_err = abs(e_tail - e_exact) / abs(e_exact)
    assert rel_err < 1e-2, (
        f"E_vmc={e_tail:.4f} vs E_exact={e_exact:.4f}, rel_err={rel_err:.3e}")
