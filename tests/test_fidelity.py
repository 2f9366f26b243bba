"""Fidelity estimator tests: identity == 1 exactly, agreement with the
dense overlap on an enumerable system."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.fidelity import fidelity
from qmcnn_tpu.sampler.metropolis import MetropolisSampler

N = 8


def make(seed, scale=0.3):
    model = LogPsiCNN(lattice_shape=(N,), channels=(4,), param_scale=scale)
    v = model.init(jax.random.key(seed), jnp.ones((1, N), jnp.float32))

    def fn(p, s):
        return log_psi_apply(model, p, s)

    return fn, v


def dense_psi(fn, v):
    lp = fn(v, jnp.asarray(exact.all_configs(N)))
    psi = np.exp(np.asarray(lp.re, np.float64))
    return psi / np.linalg.norm(psi)


def samples_from(fn, v, n_walkers=768, seed=0):
    sampler = MetropolisSampler(fn, n_sites=N, move="flip")
    state = sampler.init_state(v, jax.random.key(seed), n_walkers)
    state = sampler.sample(v, state, jax.random.key(seed + 1),
                           jnp.arange(n_walkers), n_sweeps=25)
    return state.s


@pytest.mark.slow
def test_self_fidelity_is_one():
    fn, v = make(0)
    s1 = samples_from(fn, v, seed=3)
    s2 = samples_from(fn, v, seed=7)
    f = float(fidelity(fn, v, fn, v, s1, s2))
    np.testing.assert_allclose(f, 1.0, rtol=1e-4)


@pytest.mark.slow
def test_fidelity_matches_dense_overlap():
    fn1, v1 = make(1)
    fn2, v2 = make(2)
    psi1, psi2 = dense_psi(fn1, v1), dense_psi(fn2, v2)
    want = float(np.abs(psi1 @ psi2) ** 2)
    s1 = samples_from(fn1, v1, seed=11)
    s2 = samples_from(fn2, v2, seed=13)
    got = float(fidelity(fn1, v1, fn2, v2, s1, s2))
    np.testing.assert_allclose(got, want, rtol=0.15)  # MC tolerance
    assert 0.0 < got <= 1.1
