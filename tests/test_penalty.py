"""Excited-state orthogonality penalty tests (ops/penalty.py).

Oracles:
  * estimator exactness: psi_live == uniform (zero-weight RBM) makes the
    full 2^N enumeration an exact live chain; the frozen chain is drawn by
    exact inverse-CDF sampling from the enumerated |psi_k|^2 — the
    two-chain F must match the enumerated overlap within the frozen
    chain's MC error
  * self-overlap: F(psi, psi) == 1 (both chains exact) and finite grads
  * collapse robustness: with live walkers collapsed onto ONE
    configuration, the two-chain F must NOT report 1 and the gradient
    must stay nonzero (the single-chain estimator's failure mode)
  * end-to-end (slow): TFIM N=6 first excited state via penalty against a
    pre-trained ground state, validated against dense ED eigenvalue #1
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import log_psi_apply
from qmcnn_tpu.models.rbm import LogPsiRBM
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import TFIM
from qmcnn_tpu.ops.penalty import (deflation_e_loc, make_frozen_state,
                                   penalty_value_and_grad)
from qmcnn_tpu.sampler.metropolis import MetropolisSampler
from qmcnn_tpu.sr import SR
from qmcnn_tpu.vmc import VMC

N = 8


def all_configs(n):
    return jnp.asarray(
        np.array(list(itertools.product([-1.0, 1.0], repeat=n)), np.float32))


def make_rbm(key, scale=0.3, n=N, alpha=2):
    model = LogPsiRBM(lattice_shape=(n,), alpha=alpha, complex_params=True,
                      param_scale=scale)
    v = model.init(key, jnp.ones((1, n), jnp.float32))
    return model, v


def exact_psi(model, v, s):
    lp = log_psi_apply(model, v, s)
    psi = np.exp(np.asarray(lp.re) - np.asarray(lp.re).max()) * np.exp(
        1j * np.asarray(lp.im))
    return psi / np.linalg.norm(psi)


def frozen_batch_exact(model, v, s_all, m0, seed=0):
    """Exact |psi|^2 sample by host inverse-CDF over the enumeration."""
    psi = exact_psi(model, v, s_all)
    p = np.abs(psi) ** 2
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(p), size=m0, p=p / p.sum())
    return jnp.asarray(np.asarray(s_all)[idx])


def test_two_chain_overlap_matches_enumeration():
    model, v_f = make_rbm(jax.random.key(1))
    _, v_0 = make_rbm(jax.random.key(2))
    v_zero = jax.tree_util.tree_map(jnp.zeros_like, v_0)  # uniform psi

    def log_psi_fn(p, ss):
        return log_psi_apply(model, p, ss)

    s_all = all_configs(N)
    m0 = 200_000
    frozen = make_frozen_state(
        log_psi_fn, v_f, frozen_batch_exact(model, v_f, s_all, m0))
    f_mc, _ = penalty_value_and_grad(log_psi_fn, v_zero, s_all, [frozen],
                                     beta=1.0)
    psi_f = exact_psi(model, v_f, s_all)
    psi_u = np.ones(len(s_all)) / np.sqrt(len(s_all))
    f_exact = abs(np.vdot(psi_f, psi_u)) ** 2
    np.testing.assert_allclose(float(f_mc), f_exact, rtol=0.03)


def test_self_overlap_is_one():
    model, v = make_rbm(jax.random.key(3))

    def log_psi_fn(p, ss):
        return log_psi_apply(model, p, ss)

    s_all = all_configs(N)
    live = frozen_batch_exact(model, v, s_all, 4096, seed=1)
    frozen = make_frozen_state(
        log_psi_fn, v, frozen_batch_exact(model, v, s_all, 4096, seed=2))
    f, grads = penalty_value_and_grad(log_psi_fn, v, live, [frozen],
                                      beta=2.0)
    np.testing.assert_allclose(float(f), 1.0, rtol=0.05)
    flatg = np.concatenate([np.ravel(np.asarray(g))
                            for g in jax.tree_util.tree_leaves(grads)])
    assert np.all(np.isfinite(flatg))


def test_collapse_robustness():
    """Live walkers all equal to ONE config: the single-chain estimator
    returns exactly 1 with zero gradient here; the two-chain form must
    keep a sub-1 value and a usable gradient."""
    model, v_f = make_rbm(jax.random.key(4))
    _, v = make_rbm(jax.random.key(5))

    def log_psi_fn(p, ss):
        return log_psi_apply(model, p, ss)

    s_all = all_configs(N)
    frozen = make_frozen_state(
        log_psi_fn, v_f, frozen_batch_exact(model, v_f, s_all, 4096))
    s_collapsed = jnp.tile(s_all[3][None, :], (256, 1))
    f, grads = penalty_value_and_grad(log_psi_fn, v, s_collapsed, [frozen],
                                      beta=1.0)
    assert not np.isclose(float(f), 1.0, atol=1e-4)
    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(gnorm) and gnorm > 1e-8


def test_deflation_e_loc_matches_enumeration():
    """<d_loc> over an exact live chain == |<psi_0|psi>|^2 (normalized),
    i.e. the deflation term's expectation is exactly the projector's
    Rayleigh quotient — the identity that makes H + c P0 deflation exact.
    Live psi == uniform (zero-param RBM) so the 2^N enumeration IS the
    live chain; frozen batch by exact inverse-CDF from |psi_0|^2."""
    model, v_f = make_rbm(jax.random.key(1))
    _, v_0 = make_rbm(jax.random.key(2))
    v_zero = jax.tree_util.tree_map(jnp.zeros_like, v_0)  # uniform psi

    def log_psi_fn(p, ss):
        return log_psi_apply(model, p, ss)

    s_all = all_configs(N)
    frozen = make_frozen_state(
        log_psi_fn, v_f, frozen_batch_exact(model, v_f, s_all, 200_000))
    lp_live = log_psi_fn(v_zero, s_all)
    d_loc, overlap = deflation_e_loc(log_psi_fn, v_zero, s_all, lp_live,
                                     [frozen])
    psi_f = exact_psi(model, v_f, s_all)
    psi_u = np.ones(len(s_all)) / np.sqrt(len(s_all))
    f_exact = abs(np.vdot(psi_f, psi_u)) ** 2
    # expectation identity (frozen-chain MC tolerance)
    np.testing.assert_allclose(float(np.asarray(d_loc.re).mean()), f_exact,
                               rtol=0.03)
    np.testing.assert_allclose(float(overlap), f_exact, rtol=0.03)
    # the imaginary parts must cancel in expectation (P0 Hermitian)
    assert abs(float(np.asarray(d_loc.im).mean())) < 0.03 * f_exact + 1e-5


def test_deflation_self_overlap():
    """psi == psi_0: <d_loc> == 1 and every value is finite."""
    model, v = make_rbm(jax.random.key(3))

    def log_psi_fn(p, ss):
        return log_psi_apply(model, p, ss)

    s_all = all_configs(N)
    live = frozen_batch_exact(model, v, s_all, 4096, seed=1)
    frozen = make_frozen_state(
        log_psi_fn, v, frozen_batch_exact(model, v, s_all, 4096, seed=2))
    d_loc, overlap = deflation_e_loc(log_psi_fn, v, live,
                                     log_psi_fn(v, live), [frozen])
    assert np.all(np.isfinite(np.asarray(d_loc.re)))
    assert np.all(np.isfinite(np.asarray(d_loc.im)))
    np.testing.assert_allclose(float(overlap), 1.0, rtol=0.05)


@pytest.mark.slow
def test_deflation_finds_first_excited_under_minsr():
    """THE r3 fix validation: under the sample-space minSR solver the
    additive beta-penalty collapses back onto the ground state (the
    solver rebuilds its update from e_loc residuals and never sees the
    penalty gradient — BASELINE.md r3, runs/j1j2_4x4_excited_minsr.csv);
    deflation folds the projector INTO e_loc, so the same solver must now
    find E1."""
    n = 6
    lat = chain(n)
    ham = TFIM(lat, h=1.0)
    h_dense = exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=1.0).toarray()
    evals = np.sort(np.linalg.eigvalsh(h_dense))
    e0, e1 = float(evals[0]), float(evals[1])

    model, params = make_rbm(jax.random.key(0), scale=0.1, n=n, alpha=4)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    def make_vmc(penalty=(), deflate_c=0.0, lr=0.03, steps=1500):
        sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="flip")
        sr = SR(solver="minsr", diag_shift0=0.05, diag_shift_decay=1.0,
                diag_shift_min=0.05)
        sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
        return VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
                   optimizer=optax.chain(optax.clip_by_global_norm(1.0),
                                         optax.sgd(sched)),
                   n_sweeps=1, sr=sr,
                   penalty_states=penalty, deflate_c=deflate_c)

    def train(vmc, p, key, n_steps, m=512):
        st = vmc.init_state(key, m, p)
        ids = jnp.arange(m)
        st = vmc.thermalize(st, jax.random.fold_in(key, 1), ids, 30)
        run = jax.jit(lambda s, k: vmc.run_steps(s, k, ids, 50))
        for c in range(n_steps // 50):
            st, mm = run(st, jax.random.fold_in(key, 100 + c))
        return st, mm

    st0, mm0 = train(make_vmc(steps=300), params, jax.random.key(10), 300)
    e_ground = float(np.asarray(mm0.energy_re)[-10:].mean())
    assert abs(e_ground - e0) / abs(e0) < 0.02

    s_all = all_configs(n)
    frozen = make_frozen_state(
        log_psi_fn, jax.lax.stop_gradient(st0.params),
        frozen_batch_exact(model, st0.params, s_all, 4096))
    noise = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.key(42), x.shape),
        st0.params)
    c = 3.0 * (e1 - e0)  # comfortably above the gap
    st1, mm = train(make_vmc((frozen,), deflate_c=c, steps=1500), noise,
                    jax.random.key(11), 1500)
    e_excited = float(np.asarray(mm.energy_re)[-10:].mean())
    f_final = float(np.asarray(mm.overlap)[-10:].mean())
    assert f_final < 0.1, f_final
    assert abs(e_excited - e1) / abs(e1) < 0.03, (e_excited, e1, e0)


@pytest.mark.slow
def test_penalty_finds_first_excited_tfim():
    n = 6
    lat = chain(n)
    ham = TFIM(lat, h=1.0)
    h_dense = exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=1.0).toarray()
    evals = np.sort(np.linalg.eigvalsh(h_dense))
    e0, e1 = float(evals[0]), float(evals[1])

    model, params = make_rbm(jax.random.key(0), scale=0.1, n=n, alpha=4)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    def make_vmc(penalty=(), beta=0.0, lr=0.03, steps=1500):
        sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="flip")
        sr = SR(solver="dense", diag_shift0=0.1, diag_shift_decay=1.0,
                diag_shift_min=0.1)
        sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
        return VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
                   optimizer=optax.chain(optax.clip_by_global_norm(1.0),
                                         optax.sgd(sched)),
                   n_sweeps=1, sr=sr,
                   penalty_states=penalty, penalty_beta=beta)

    def train(vmc, p, key, n_steps, m=512):
        st = vmc.init_state(key, m, p)
        ids = jnp.arange(m)
        st = vmc.thermalize(st, jax.random.fold_in(key, 1), ids, 30)
        run = jax.jit(lambda s, k: vmc.run_steps(s, k, ids, 50))
        for c in range(n_steps // 50):
            st, mm = run(st, jax.random.fold_in(key, 100 + c))
        return st, mm

    st0, mm0 = train(make_vmc(steps=300), params, jax.random.key(10), 300)
    e_ground = float(np.asarray(mm0.energy_re)[-10:].mean())
    assert abs(e_ground - e0) / abs(e0) < 0.02

    # frozen chain drawn exactly from the trained |psi_0|^2 enumeration
    s_all = all_configs(n)
    frozen = make_frozen_state(
        log_psi_fn, jax.lax.stop_gradient(st0.params),
        frozen_batch_exact(model, st0.params, s_all, 4096))
    noise = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.key(42), x.shape),
        st0.params)
    st1, mm = train(make_vmc((frozen,), beta=10.0, steps=1500), noise,
                    jax.random.key(11), 1500)
    e_excited = float(np.asarray(mm.energy_re)[-10:].mean())
    f_final = float(np.asarray(mm.overlap)[-10:].mean())
    assert f_final < 0.1, f_final
    assert abs(e_excited - e1) / abs(e1) < 0.03, (e_excited, e1, e0)


@pytest.mark.slow
def test_deflation_k2_finds_second_excited_under_minsr():
    """k=2 multi-state deflation gate (VERDICT r4 weak #3): with TWO
    frozen states (trained ground + trained first excited), minimizing
    H + c (P0 + P1) under the SAME sample-space minSR solver must land on
    E2 — exercising the `for f in frozen:` accumulation in
    deflation_e_loc with more than one state, against the dense TFIM n=6
    oracle (E2 = -5.657 is 3.4% below the next level, so a 3% gate
    separates success from slipping to E3)."""
    n = 6
    lat = chain(n)
    ham = TFIM(lat, h=1.0)
    h_dense = exact.sparse_tfim(n, lat.nn_bonds, j=1.0, h=1.0).toarray()
    evals = np.sort(np.linalg.eigvalsh(h_dense))
    e0, e1, e2 = float(evals[0]), float(evals[1]), float(evals[2])

    model, params = make_rbm(jax.random.key(0), scale=0.1, n=n, alpha=4)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    def make_vmc(penalty=(), deflate_c=0.0, lr=0.03, steps=1500):
        sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="flip")
        sr = SR(solver="minsr", diag_shift0=0.05, diag_shift_decay=1.0,
                diag_shift_min=0.05)
        sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
        return VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
                   optimizer=optax.chain(optax.clip_by_global_norm(1.0),
                                         optax.sgd(sched)),
                   n_sweeps=1, sr=sr,
                   penalty_states=penalty, deflate_c=deflate_c)

    def train(vmc, p, key, n_steps, m=512):
        st = vmc.init_state(key, m, p)
        ids = jnp.arange(m)
        st = vmc.thermalize(st, jax.random.fold_in(key, 1), ids, 30)
        run = jax.jit(lambda s, k: vmc.run_steps(s, k, ids, 50))
        for c in range(n_steps // 50):
            st, mm = run(st, jax.random.fold_in(key, 100 + c))
        return st, mm

    s_all = all_configs(n)

    def kick(p, key, scale=0.05):
        return jax.tree_util.tree_map(
            lambda x: x + scale * jax.random.normal(key, x.shape), p)

    # ground
    st0, mm0 = train(make_vmc(steps=300), params, jax.random.key(10), 300)
    assert abs(float(np.asarray(mm0.energy_re)[-10:].mean()) - e0) / abs(e0) < 0.02
    f0 = make_frozen_state(
        log_psi_fn, jax.lax.stop_gradient(st0.params),
        frozen_batch_exact(model, st0.params, s_all, 4096))

    # first excited (k=1 deflation, same recipe as the k=1 gate test)
    c1 = 3.0 * (e1 - e0)
    st1, mm1 = train(make_vmc((f0,), deflate_c=c1, steps=1500),
                     kick(st0.params, jax.random.key(42)),
                     jax.random.key(11), 1500)
    e_1 = float(np.asarray(mm1.energy_re)[-10:].mean())
    assert abs(e_1 - e1) / abs(e1) < 0.03, (e_1, e1)
    f1 = make_frozen_state(
        log_psi_fn, jax.lax.stop_gradient(st1.params),
        frozen_batch_exact(model, st1.params, s_all, 4096, seed=3))

    # second excited: TWO frozen states in one deflation sum
    c2 = 2.0 * (e2 - e0)  # above E2-E0 with margin
    st2, mm2 = train(make_vmc((f0, f1), deflate_c=c2, steps=2000),
                     kick(st1.params, jax.random.key(43)),
                     jax.random.key(12), 2000)
    e_2 = float(np.asarray(mm2.energy_re)[-10:].mean())
    f_final = float(np.asarray(mm2.overlap)[-10:].mean())
    assert f_final < 0.1, f_final
    assert abs(e_2 - e2) / abs(e2) < 0.03, (e_2, e2, e1, e0)
