"""RBM ansatz tests: gradients vs finite differences, translation-tied
invariance, and a short TFIM training run to <2% of ED."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import log_psi_apply
from qmcnn_tpu.models.rbm import LogPsiRBM
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.ops.hamiltonians import TFIM
from qmcnn_tpu.sampler.metropolis import MetropolisSampler
from qmcnn_tpu.vmc import VMC

N = 8


def rand_spins(key, batch, n):
    return (2.0 * jax.random.bernoulli(key, 0.5, (batch, n)) - 1.0).astype(
        jnp.float32
    )


@pytest.mark.parametrize("complex_params", [False, True])
def test_rbm_grad_finite_difference(complex_params):
    model = LogPsiRBM(lattice_shape=(N,), alpha=2,
                      complex_params=complex_params, param_scale=0.2)
    s = rand_spins(jax.random.key(0), 1, N)
    v = model.init(jax.random.key(1), s)

    def f(params):
        out = model.apply({"params": params}, s)
        return out.re[0] + (0.5 * out.im[0] if complex_params else 0.0)

    g = jax.grad(f)(v["params"])
    leaf_name = "kernel_re"
    leaf = v["params"][leaf_name]
    eps, idx = 1e-3, (2, 3)

    def perturb(hh):
        p = jax.tree_util.tree_map(lambda y: y, v["params"])
        p[leaf_name] = leaf.at[idx].add(hh)
        return f(p)

    fd = (perturb(eps) - perturb(-eps)) / (2 * eps)
    np.testing.assert_allclose(g[leaf_name][idx], fd, rtol=2e-2, atol=1e-5)


@pytest.mark.parametrize("complex_params", [False, True])
def test_tied_rbm_translation_invariant(complex_params):
    model = LogPsiRBM(lattice_shape=(4, 4), alpha=2, tie_translations=True,
                      complex_params=complex_params, param_scale=0.3)
    s = rand_spins(jax.random.key(0), 3, 16)
    v = model.init(jax.random.key(1), s)
    base = model.apply(v, s)
    rolled = jnp.roll(s.reshape(3, 4, 4), (1, 2), axis=(1, 2)).reshape(3, 16)
    out = model.apply(v, rolled)
    np.testing.assert_allclose(np.asarray(out.re), np.asarray(base.re),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.im), np.asarray(base.im),
                               rtol=1e-4, atol=2e-5)


@pytest.mark.slow
def test_rbm_trains_tfim():
    lat = chain(N)
    ham = TFIM(lat, h=1.0)
    e_exact = exact.ground_energy(exact.sparse_tfim(N, lat.nn_bonds))
    model = LogPsiRBM(lattice_shape=(N,), alpha=2, param_scale=0.05)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, N), jnp.float32))
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip")
    vmc = VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
              optimizer=optax.sgd(0.05), n_sweeps=2)
    m = 256
    ids = jnp.arange(m)
    state = vmc.init_state(jax.random.key(1), m, params)
    state = vmc.thermalize(state, jax.random.key(2), ids, n_sweeps=10)
    run = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, 50))
    es = []
    for blk in range(6):
        state, ms = run(state, jax.random.fold_in(jax.random.key(3), blk))
        es.extend(np.asarray(ms.energy_re).tolist())
    tail = float(np.mean(es[-50:]))
    rel = abs(tail - e_exact) / abs(e_exact)
    assert rel < 2e-2, f"E={tail:.4f} vs {e_exact:.4f} rel={rel:.2e}"
