"""Integration test: BASELINE config 1 at CI scale (SURVEY.md section 4).

Full train loop — sampler, local energy, surrogate gradient, optax SGD —
on the 1D TFIM, validated against exact diagonalization. CI gate is
rel. error < 1.5e-2 on the tail-averaged energy (the nightly/hardware gate
of < 1e-3 runs at larger scale via bench/train scripts)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import TFIM
from qmcnn_tpu.sampler.metropolis import MetropolisSampler
from qmcnn_tpu.vmc import VMC


@pytest.mark.slow
def test_tfim_chain_sgd_converges_to_ed():
    n = 10
    lat = chain(n)
    ham = TFIM(lat, j=1.0, h=1.0)
    e_exact = exact.ground_energy(
        exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=1.0)
    )

    model = LogPsiCNN(lattice_shape=(n,), channels=(8, 8), param_scale=0.05)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, n), jnp.float32))
    sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="flip")
    vmc = VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
              optimizer=optax.sgd(0.05), n_sweeps=2)

    m = 256
    ids = jnp.arange(m)
    state = vmc.init_state(jax.random.key(1), m, params)
    state = vmc.thermalize(state, jax.random.key(2), ids, n_sweeps=20)
    step = jax.jit(vmc.step)

    energies = []
    for it in range(300):
        state, metrics = step(state, jax.random.fold_in(jax.random.key(3), it),
                              ids)
        energies.append(float(metrics.energy_re))
        assert np.isfinite(energies[-1])

    e_tail = np.mean(energies[-50:])
    rel_err = abs(e_tail - e_exact) / abs(e_exact)
    assert rel_err < 1.5e-2, (
        f"E_vmc={e_tail:.4f} vs E_exact={e_exact:.4f}, rel_err={rel_err:.3e}"
    )
    # energy must have *decreased* substantially from the random start
    assert np.mean(energies[:10]) > e_tail + 1.0
