"""Momentum-sector OPTIMIZATION tests (vmc.sector_energy_and_grad).

The r4 (pi,pi) refutation (BASELINE.md) showed optimizing a
translation-projected net diverges because |P psi|^2 sampling sits on
nodal singularities. The named fix is the sector Rayleigh quotient
E_q = <psi|H P_q|psi>/<psi|P_q|psi> with every expectation under the
UNPROJECTED |psi|^2. Oracles here:

  * formula + estimator: the covariance gradient
    (1/D) E[O* (nhat - E_q what - kappa (what - D))] evaluated with
    EXACT |psi|^2 enumeration weights equals half the central finite
    difference of the dense objective E_q - kappa log|D| (same factor-2
    convention as the ground-state gradient, vmc.py module docstring)
  * value: the ratio estimator's E_q under exact weights equals the
    dense Rayleigh quotient of the explicitly projected vector
  * end-to-end (slow): an untied RBM trained in the q = pi sector of
    the N=6 TFIM chain under minSR lands on the dense sector-lowest
    eigenvalue, with sector weight driven toward 1 by the kappa term
"""
import itertools

import jax
import jax.flatten_util
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
from qmcnn_tpu.ops.observables import sector_energy_ratio
from qmcnn_tpu.sampler.metropolis import MetropolisSampler
from qmcnn_tpu.sr import SR
from qmcnn_tpu.vmc import VMC

N = 6


def all_configs(n):
    return jnp.asarray(
        np.array(list(itertools.product([-1.0, 1.0], repeat=n)), np.float32))


def make_rbm(key, scale=0.3, n=N, alpha=2):
    # untied: a translation-invariant ansatz has exactly zero q != 0
    # weight, which is the degenerate case the estimator's weight output
    # exposes — sector work needs the untied family
    model = LogPsiRBM(lattice_shape=(n,), alpha=alpha, complex_params=True,
                      param_scale=scale, tie_translations=False)
    v = model.init(key, jnp.ones((1, n), jnp.float32))
    return model, v


def psi_vector(log_psi_fn, params, s_all):
    lp = log_psi_fn(params, s_all)
    lpn = lp.to_numpy().astype(np.complex128)
    psi = np.exp(lpn - np.asarray(lp.re).max())
    return psi


def projected_vector(psi, n, m_q):
    """(P_q psi) over the enumeration, mirroring
    translation_projected_log_psi's roll + e^{+i k.shift} convention."""
    s_all = np.array(list(itertools.product([-1.0, 1.0], repeat=n)),
                     np.float32)
    index = {tuple(row): i for i, row in enumerate(s_all)}
    k = 2.0 * np.pi * m_q / n
    out = np.zeros_like(psi)
    for sh in range(n):
        phase = np.exp(1j * k * sh)
        for i, row in enumerate(s_all):
            rolled = tuple(np.roll(row, sh))
            out[i] += phase * psi[index[rolled]]
    return out / n


def dense_objective(log_psi_fn, params, ham, n, m_q, kappa):
    """(E_q, J = E_q - kappa log|D|, D) from dense enumeration."""
    s_all = all_configs(n)
    psi = psi_vector(log_psi_fn, params, s_all)
    h = exact.dense_from_hamiltonian(ham)
    p_psi = projected_vector(psi, n, m_q)
    norm = np.real(np.conj(psi) @ psi)
    d = (np.conj(psi) @ p_psi) / norm
    e_q = np.real(np.conj(psi) @ h @ p_psi) / np.real(np.conj(psi) @ p_psi)
    return float(e_q), float(e_q - kappa * np.log(np.abs(d))), complex(d)


def exact_weighted_grad(log_psi_fn, params, ham, n, m_q, kappa):
    """The implemented estimator contracted with EXACT |psi|^2 weights."""
    s_all = all_configs(n)
    lp = log_psi_fn(params, s_all)
    psi = psi_vector(log_psi_fn, params, s_all)
    p = np.abs(psi) ** 2
    p /= p.sum()
    num, den = sector_energy_ratio(log_psi_fn, params, s_all, lp, ham,
                                   (n,), (m_q,))
    nn = num.to_numpy().astype(np.complex128)
    dd = den.to_numpy().astype(np.complex128)
    n_mean = (p * nn).sum()
    d_mean = (p * dd).sum()
    e_q = n_mean / d_mean
    e_eff = (nn - e_q * dd - kappa * (dd - d_mean)) / d_mean

    flat, unravel = jax.flatten_util.ravel_pytree(params)

    def f_re(fp, s):
        return log_psi_fn(unravel(fp), s[None, :]).re[0]

    def f_im(fp, s):
        return log_psi_fn(unravel(fp), s[None, :]).im[0]

    j_re = jax.vmap(jax.grad(f_re), in_axes=(None, 0))(flat, s_all)
    j_im = jax.vmap(jax.grad(f_im), in_axes=(None, 0))(flat, s_all)
    o = np.asarray(j_re) + 1j * np.asarray(j_im)
    f = np.real(np.conj(o).T @ (p * e_eff))
    return f, float(np.real(e_q)), flat, unravel


@pytest.mark.parametrize("m_q", [1, 3])
def test_sector_gradient_matches_fd_of_dense_objective(m_q):
    lat = chain(N)
    ham = TFIM(lat, h=0.8)
    model, v = make_rbm(jax.random.key(5), scale=0.35)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    kappa = 0.4
    f, e_q_est, flat, unravel = exact_weighted_grad(
        log_psi_fn, v, ham, N, m_q, kappa)
    e_q_dense, j_dense, d = dense_objective(log_psi_fn, v, ham, N, m_q,
                                            kappa)
    # value: ratio estimator under exact weights == dense Rayleigh
    # quotient of the explicitly projected vector
    assert abs(e_q_est - e_q_dense) < 1e-4 * max(1.0, abs(e_q_dense)), (
        e_q_est, e_q_dense)
    assert abs(d) > 1e-3  # the untied init must put real weight in q

    eps = 3e-4
    idx = np.linspace(0, flat.size - 1, 9, dtype=int)
    for k in idx:
        ek = np.zeros(flat.size, np.float32)
        ek[k] = eps
        _, j_plus, _ = dense_objective(
            log_psi_fn, unravel(jnp.asarray(np.asarray(flat) + ek)), ham,
            N, m_q, kappa)
        _, j_minus, _ = dense_objective(
            log_psi_fn, unravel(jnp.asarray(np.asarray(flat) - ek)), ham,
            N, m_q, kappa)
        fd = (j_plus - j_minus) / (2 * eps)
        # same factor-2 convention as the ground-state gradient
        assert abs(f[k] - 0.5 * fd) < 2e-3 * max(1.0, abs(fd)), (
            k, f[k], 0.5 * fd)


def sector_lowest_dense(ham, n, m_q):
    h = exact.dense_from_hamiltonian(ham)
    dim = h.shape[0]
    s_all = np.array(list(itertools.product([-1.0, 1.0], repeat=n)),
                     np.float32)
    index = {tuple(row): i for i, row in enumerate(s_all)}
    k = 2.0 * np.pi * m_q / n
    p = np.zeros((dim, dim), np.complex128)
    for sh in range(n):
        phase = np.exp(1j * k * sh)
        for i, row in enumerate(s_all):
            p[i, index[tuple(np.roll(row, sh))]] += phase / n
    assert np.allclose(p @ p, p, atol=1e-10)       # idempotent
    assert np.allclose(p, p.conj().T, atol=1e-10)  # hermitian
    mu = 10.0 * np.abs(h).sum(axis=1).max()
    w = np.linalg.eigvalsh(p @ h @ p + mu * (np.eye(dim) - p))
    return float(w[0])


@pytest.mark.slow
def test_sector_training_finds_sector_lowest_under_minsr():
    """End-to-end: minimize E_pi of the N=6 TFIM chain with the ratio
    estimators riding minSR (the solver family the projected-net route
    diverged under), from a scratch untied RBM. kappa drives the sector
    weight up, so the tail state IS the in-sector state, not a mixture
    with an out-of-sector spectator."""
    n = 6
    m_q = 3  # q = pi
    lat = chain(n)
    ham = TFIM(lat, h=1.0)
    target = sector_lowest_dense(ham, n, m_q)

    model, params = make_rbm(jax.random.key(2), scale=0.2, n=n, alpha=4)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    steps = 900
    sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="flip")
    sr = SR(solver="minsr", diag_shift0=0.05, diag_shift_decay=1.0,
            diag_shift_min=0.05, momentum=0.9)
    sched = optax.cosine_decay_schedule(0.05, steps, alpha=0.05)
    vmc = VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
              optimizer=optax.chain(optax.clip_by_global_norm(1.0),
                                    optax.sgd(sched)),
              n_sweeps=1, sr=sr,
              sector_momentum=(m_q,), sector_kappa=0.5,
              lattice_shape=(n,))

    m = 512
    key = jax.random.key(7)
    st = vmc.init_state(key, m, params)
    ids = jnp.arange(m)
    st = vmc.thermalize(st, jax.random.fold_in(key, 1), ids, 30)
    run = jax.jit(lambda s, k: vmc.run_steps(s, k, ids, 50))
    for c in range(steps // 50):
        st, mm = run(st, jax.random.fold_in(key, 100 + c))
    e_tail = float(np.asarray(mm.energy_re)[-10:].mean())
    weight_tail = float(np.asarray(mm.overlap)[-10:].mean())
    assert abs(e_tail - target) / abs(target) < 0.03, (e_tail, target)
    assert weight_tail > 0.5, weight_tail
