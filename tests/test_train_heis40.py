"""Integration test: BASELINE config 2 at FULL lattice size — 1D Heisenberg
chain N=40 (beyond ED) with Marshall rule + exchange moves + SR, validated
against the exact Bethe-ansatz finite-size energy from ops/bethe.py."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import bethe
from qmcnn_tpu.ops.hamiltonians import Heisenberg
from qmcnn_tpu.sampler.metropolis import MetropolisSampler
from qmcnn_tpu.sr import SR
from qmcnn_tpu.vmc import VMC


@pytest.mark.slow
def test_heisenberg_40_sr_converges_to_bethe():
    n = 40
    lat = chain(n)
    ham = Heisenberg(lat, marshall=True)
    e_exact = bethe.ground_energy(n)  # -17.7465228

    model = LogPsiCNN(lattice_shape=(n,), channels=(10, 10), kernel_size=5,
                      param_scale=0.05)

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
        n_sweeps=1, sr=sr,
    )
    m = 256
    ids = jnp.arange(m)
    state = vmc.init_state(jax.random.key(1), m, params)
    state = vmc.thermalize(state, jax.random.key(2), ids, n_sweeps=30)
    run = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, 50))
    es = []
    for blk in range(4):
        state, ms = run(state, jax.random.fold_in(jax.random.key(3), blk))
        es.extend(np.asarray(ms.energy_re).tolist())
    assert np.all(np.isfinite(es))
    tail = float(np.mean(es[-50:]))
    rel = abs(tail - e_exact) / abs(e_exact)
    assert rel < 1e-2, f"E={tail:.4f} vs Bethe {e_exact:.4f} rel={rel:.2e}"
