"""cplx pair-arithmetic tests against numpy complex (host-side oracle)."""
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C


def pair(z):
    z = np.asarray(z, np.complex64)
    return C(jnp.asarray(z.real), jnp.asarray(z.imag))


def rand_z(key, shape, scale=1.0):
    kr, ki = jax.random.split(jax.random.key(key))
    return np.asarray(
        scale * (np.asarray(jax.random.normal(kr, shape))
                 + 1j * np.asarray(jax.random.normal(ki, shape)))
    ).astype(np.complex64)


def test_arith():
    a, b = rand_z(0, (16,)), rand_z(1, (16,))
    np.testing.assert_allclose((pair(a) * pair(b)).to_numpy(), a * b, rtol=1e-5)
    np.testing.assert_allclose((pair(a) + pair(b)).to_numpy(), a + b, rtol=1e-5)
    np.testing.assert_allclose((pair(a) - pair(b)).to_numpy(), a - b, rtol=1e-5)
    np.testing.assert_allclose((pair(a) / pair(b)).to_numpy(), a / b, rtol=1e-4)
    np.testing.assert_allclose(pair(a).conj().to_numpy(), np.conj(a), rtol=1e-5)
    np.testing.assert_allclose(pair(a).abs2(), np.abs(a) ** 2, rtol=1e-5)
    np.testing.assert_allclose((2.0 * pair(a)).to_numpy(), 2.0 * a, rtol=1e-5)
    np.testing.assert_allclose((pair(a) * 3.0).to_numpy(), 3.0 * a, rtol=1e-5)


def test_exp_log():
    z = rand_z(2, (32,), scale=2.0)
    np.testing.assert_allclose(cplx.cexp(pair(z)).to_numpy(), np.exp(z),
                               rtol=1e-4, atol=1e-6)
    got = cplx.clog(pair(z)).to_numpy()
    np.testing.assert_allclose(np.exp(got), z, rtol=1e-4, atol=1e-6)


def test_lncosh_matches_numpy():
    z = rand_z(3, (64,), scale=3.0)
    got = cplx.lncosh(pair(z)).to_numpy()
    want = np.log(np.cosh(z.astype(np.complex128)))
    # compare through exp: Im may differ by 2 pi k across branch cuts
    np.testing.assert_allclose(np.exp(got), np.exp(want), rtol=2e-4, atol=1e-5)


def test_lncosh_no_overflow():
    z = pair(np.array([80.0 + 1.0j, -95.0 - 0.5j], np.complex64))
    out = cplx.lncosh(z)
    assert np.all(np.isfinite(out.re)) and np.all(np.isfinite(out.im))
    np.testing.assert_allclose(out.re, [80.0 - np.log(2), 95.0 - np.log(2)],
                               rtol=1e-5)


def test_lncosh_real_matches():
    x = jnp.linspace(-30, 30, 101)
    want = np.log(np.cosh(np.asarray(x, np.float64)))
    np.testing.assert_allclose(cplx.lncosh_real(x), want, rtol=1e-5, atol=1e-6)


def test_logmeanexp():
    z = rand_z(4, (7, 5))
    got = cplx.logmeanexp(pair(z), axis=0).to_numpy()
    want = np.log(np.mean(np.exp(z.astype(np.complex128)), axis=0))
    np.testing.assert_allclose(np.exp(got), np.exp(want), rtol=1e-4)


def test_pytree_flow():
    """C must flow through jit/vmap/scan as a pytree."""
    z = pair(rand_z(5, (8,)))

    @jax.jit
    def f(z):
        return (z * z).sum()

    out = f(z)
    want = (rand_z(5, (8,)).astype(np.complex128) ** 2).sum()
    np.testing.assert_allclose(out.to_numpy(), want, rtol=1e-4)
    out2 = jax.vmap(lambda zi: zi * zi)(z)
    assert out2.shape == (8,)
