"""<S^2> observable tests (ops/observables.total_spin_sq).

Oracles:
  * product state |+x>^N (uniform amplitudes): <S^2> = N^2/4 + N/2 in
    closed form; the full 2^N enumeration is an exact |psi|^2 chain
  * ED eigenvectors of the Heisenberg chain as table wavefunctions:
    the singlet ground state gives <S^2> ~ 0, the triplet first excited
    state gives <S^2> ~ 2 — sampled exactly by host inverse-CDF
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.ops.observables import total_spin_sq

N = 8


def all_configs(n):
    return jnp.asarray(
        np.array(list(itertools.product([-1.0, 1.0], repeat=n)), np.float32))


def table_log_psi(vec):
    """log-psi function backed by a dense 2^N vector (sign via i*pi)."""
    mag = np.log(np.maximum(np.abs(vec), 1e-30)).astype(np.float32)
    phase = np.where(vec < 0, np.pi, 0.0).astype(np.float32)
    mag_t, phase_t = jnp.asarray(mag), jnp.asarray(phase)
    pows = jnp.asarray(2 ** np.arange(N)[::-1], jnp.float32)

    def fn(params, s):
        idx = ((s < 0).astype(jnp.float32) @ pows).astype(jnp.int32)
        return C(mag_t[idx], phase_t[idx])

    return fn


def test_product_state_total_spin():
    s_all = all_configs(N)

    def log_psi_fn(params, s):
        z = jnp.zeros(s.shape[0])
        return C(z, z)  # uniform = |+x>^N

    lp = log_psi_fn(None, s_all)
    out = total_spin_sq(log_psi_fn, None, s_all, lp, chain(N),
                        pair_chunk=7)  # odd chunk: exercises the loop
    expect = N * N / 4.0 + N / 2.0
    np.testing.assert_allclose(float(out.re), expect, rtol=1e-5)
    np.testing.assert_allclose(float(out.im), 0.0, atol=1e-5)


def _ed_state(k):
    lat = chain(N)
    h = exact.sparse_heisenberg(N, lat.nn_bonds).toarray()
    evals, evecs = np.linalg.eigh(h)
    return evecs[:, k], evals


def _measure_on_vec(vec, m=40000, seed=0):
    s_all = all_configs(N)
    p = vec ** 2 / (vec ** 2).sum()
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(p), size=m, p=p)
    s = jnp.asarray(np.asarray(s_all)[idx])
    fn = table_log_psi(vec)
    lp = fn(None, s)
    return total_spin_sq(fn, None, s, lp, chain(N))


def test_singlet_ground_state():
    vec, evals = _ed_state(0)
    out = _measure_on_vec(vec)
    np.testing.assert_allclose(float(out.re), 0.0, atol=0.05)


def test_triplet_first_excited():
    # first excited of the AF Heisenberg chain is the S=1 triplet; pick
    # the eigenvector and check S(S+1) = 2
    vec, evals = _ed_state(1)
    out = _measure_on_vec(vec, seed=1)
    np.testing.assert_allclose(float(out.re), 2.0, atol=0.08)
