"""Integration tests: BASELINE configs 3 and 4 at CI scale (SURVEY.md
section 4) — 2D Heisenberg (4x4) and the frustrated J1-J2 model at
J2/J1=0.5 with complex-valued CNN amplitudes, both vs exact
diagonalization, both trained with SR through the fused multi-step path."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qmcnn_tpu.lattice import square
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import Heisenberg, j1j2
from qmcnn_tpu.sampler.metropolis import MetropolisSampler
from qmcnn_tpu.sr import SR
from qmcnn_tpu.vmc import VMC


def run_case(ham, sp, complex_params, lr, n_blocks, block=50):
    e_exact = exact.ground_energy(sp)
    model = LogPsiCNN(lattice_shape=(4, 4), channels=(8, 8),
                      param_scale=0.05, complex_params=complex_params)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, 16), jnp.float32))
    sampler = MetropolisSampler(log_psi_fn, n_sites=16, move="exchange",
                                bonds=ham.lattice.nn_bonds)
    sr = SR(solver="dense", diag_shift0=1.0, diag_shift_decay=0.93,
            diag_shift_min=1e-2)
    vmc = VMC(
        log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
        optimizer=optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(lr)),
        n_sweeps=2, sr=sr,
    )
    m = 256
    ids = jnp.arange(m)
    state = vmc.init_state(jax.random.key(1), m, params)
    state = vmc.thermalize(state, jax.random.key(2), ids, n_sweeps=20)
    run = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, block))
    es = []
    for blk in range(n_blocks):
        state, ms = run(state, jax.random.fold_in(jax.random.key(3), blk))
        es.extend(np.asarray(ms.energy_re).tolist())
    assert np.all(np.isfinite(es))
    tail = float(np.mean(es[-block:]))
    return tail, e_exact, state


@pytest.mark.slow
def test_heisenberg_2d_sr_converges_to_ed():
    lat = square(4, 4)
    ham = Heisenberg(lat, marshall=True)
    sp = exact.sparse_heisenberg(16, lat.nn_bonds)
    tail, e_exact, state = run_case(ham, sp, complex_params=False, lr=0.05,
                                    n_blocks=4)
    rel = abs(tail - e_exact) / abs(e_exact)
    assert rel < 1e-2, f"E={tail:.4f} vs {e_exact:.4f} rel={rel:.2e}"
    # sector preserved in 2D as well
    assert np.all(np.asarray(state.walkers.s).sum(-1) == 0)


@pytest.mark.slow
def test_j1j2_complex_cnn_sr_converges_to_ed():
    """Frustrated model: Marshall rule violated by J2, complex amplitudes
    required (BASELINE config 4). 4x4 at J2/J1 = 0.5."""
    lat = square(4, 4)
    ham = j1j2(lat, j1=1.0, j2=0.5)
    sp = exact.sparse_heisenberg(16, lat.nn_bonds, nnn_bonds=lat.nnn_bonds,
                                 j2=0.5)
    tail, e_exact, _ = run_case(ham, sp, complex_params=True, lr=0.03,
                                n_blocks=5)
    rel = abs(tail - e_exact) / abs(e_exact)
    assert rel < 3e-2, f"E={tail:.4f} vs {e_exact:.4f} rel={rel:.2e}"
