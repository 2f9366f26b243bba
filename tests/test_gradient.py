"""Gradient tests (SURVEY.md hard part #1, defused by real-pair params).

Two-layer validation:
 1. formula: F_k = Re[<O_k* dE>] under exact |psi|^2 weights equals half the
    finite-difference derivative of the exact Rayleigh quotient E(theta).
 2. implementation: energy_and_grad's jax.grad surrogate equals the dense-O
    formula evaluated on the same walker batch with uniform weights.
"""
import pytest
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import TFIM
from qmcnn_tpu.sampler.metropolis import WalkerState
from qmcnn_tpu.vmc import energy_and_grad

N = 6


def setup(complex_params=True):
    lat = chain(N)
    ham = TFIM(lat, h=0.8)
    model = LogPsiCNN(lattice_shape=(N,), channels=(3,), param_scale=0.3,
                      complex_params=complex_params)
    v = model.init(jax.random.key(3), jnp.ones((1, N), jnp.float32))

    def log_psi_fn(params, s):
        return log_psi_apply(model, params, s)

    return lat, ham, v, log_psi_fn


def dense_scores(log_psi_fn, params, configs):
    """O[M, P] complex: per-sample d log psi / d theta, flattened params."""
    flat, unravel = jax.flatten_util.ravel_pytree(params)

    def f_re(fp, s):
        return log_psi_fn(unravel(fp), s[None, :]).re[0]

    def f_im(fp, s):
        return log_psi_fn(unravel(fp), s[None, :]).im[0]

    j_re = jax.vmap(jax.grad(f_re), in_axes=(None, 0))(flat, configs)
    j_im = jax.vmap(jax.grad(f_im), in_axes=(None, 0))(flat, configs)
    return np.asarray(j_re) + 1j * np.asarray(j_im), unravel, flat


def rayleigh(log_psi_fn, params, ham, configs):
    lp = log_psi_fn(params, configs)
    psi = np.exp(lp.to_numpy().astype(np.complex128))
    h = exact.dense_from_hamiltonian(ham)
    return float(np.real(np.conj(psi) @ h @ psi) / np.real(np.conj(psi) @ psi))


def test_formula_matches_fd_of_exact_energy():
    lat, ham, v, log_psi_fn = setup()
    configs = jnp.asarray(exact.all_configs(N))
    lp = log_psi_fn(v, configs)
    psi = np.exp(lp.to_numpy().astype(np.complex128))
    p = np.abs(psi) ** 2
    p /= p.sum()
    from qmcnn_tpu.ops.local_energy import local_energy

    e_loc = local_energy(log_psi_fn, v, ham, configs, lp).to_numpy()
    e_mean = (p * e_loc).sum()
    o, unravel, flat = dense_scores(log_psi_fn, v, configs)
    de = e_loc - e_mean
    f_formula = np.real(np.conj(o).T @ (p * de))  # Re[<O* dE>]_p

    # central finite differences of the exact Rayleigh quotient
    eps = 3e-4
    fd = np.zeros_like(np.asarray(flat))
    idx = np.linspace(0, flat.size - 1, 7, dtype=int)  # subsample params
    for k in idx:
        ek = np.zeros(flat.size, np.float32)
        ek[k] = eps
        ep = rayleigh(log_psi_fn, unravel(flat + ek), ham, configs)
        em = rayleigh(log_psi_fn, unravel(flat - ek), ham, configs)
        fd[k] = (ep - em) / (2 * eps)
    # dE/dtheta = 2 * F  (real parameters)
    np.testing.assert_allclose(2 * f_formula[idx], fd[idx], rtol=2e-2,
                               atol=2e-4)


@pytest.mark.slow
def test_energy_and_grad_matches_dense_scores():
    lat, ham, v, log_psi_fn = setup()
    key = jax.random.key(0)
    s = (2.0 * jax.random.bernoulli(key, 0.5, (48, N)) - 1.0).astype(
        jnp.float32
    )
    lp = log_psi_fn(v, s)
    walkers = WalkerState(s=s, log_psi=lp,
                          n_accept=jnp.zeros(48, jnp.int32),
                          n_prop=jnp.ones(48, jnp.int32))
    e_mean, e_var, grads, e_loc, _ = energy_and_grad(log_psi_fn, ham, v, walkers)
    o, unravel, flat = dense_scores(log_psi_fn, v, s)
    de = e_loc.to_numpy() - e_loc.to_numpy().mean()
    want = np.real(np.conj(o).T @ de) / s.shape[0]
    got, _ = jax.flatten_util.ravel_pytree(grads)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-6)
    # variance check
    np.testing.assert_allclose(
        float(e_var), np.mean(np.abs(de) ** 2), rtol=1e-4
    )
