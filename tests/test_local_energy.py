"""Local-energy tests with zero MC noise (SURVEY.md section 4): per-config
E_loc vs the dense (H psi)/psi, and the exact-enumeration Rayleigh quotient."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.lattice import chain, square
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import TFIM, Heisenberg, j1j2
from qmcnn_tpu.ops.local_energy import local_energy


def make_net(shape, complex_params=False, seed=5):
    n = int(np.prod(shape))
    model = LogPsiCNN(lattice_shape=shape, channels=(4,), param_scale=0.2,
                      complex_params=complex_params)
    v = model.init(jax.random.key(seed), jnp.ones((1, n), jnp.float32))

    def log_psi_fn(params, s):
        return log_psi_apply(model, params, s)

    return v, log_psi_fn


def dense_e_loc(ham, psi):
    """(H psi) / psi for every basis state, dense oracle."""
    h = exact.dense_from_hamiltonian(ham)
    return (h @ psi) / psi


@pytest.mark.parametrize("case", ["tfim", "heis", "heis_nomarshall", "j1j2"])
def test_e_loc_matches_dense(case):
    if case == "tfim":
        lat = chain(8)
        ham = TFIM(lat, j=1.0, h=0.9)
        complex_params = False
    elif case == "heis":
        lat = chain(8)
        ham = Heisenberg(lat, marshall=True)
        complex_params = False
    elif case == "heis_nomarshall":
        lat = chain(8)
        ham = Heisenberg(lat, marshall=False)
        complex_params = False
    else:
        lat = square(2, 4)
        ham = j1j2(lat, j1=1.0, j2=0.5)
        complex_params = True
    n = lat.n_sites
    v, log_psi_fn = make_net(lat.shape, complex_params)
    configs = jnp.asarray(exact.all_configs(n))
    lp = log_psi_fn(v, configs)
    psi = np.exp(lp.to_numpy().astype(np.complex128))
    e = local_energy(log_psi_fn, v, ham, configs, lp)
    want = dense_e_loc(ham, psi)
    np.testing.assert_allclose(e.to_numpy(), want, rtol=2e-3, atol=1e-4)


def test_exact_expectation_is_rayleigh_quotient():
    """sum_s p(s) E_loc(s) == <psi|H|psi>/<psi|psi> exactly (no MC noise)."""
    lat = chain(8)
    ham = TFIM(lat, h=1.0)
    v, log_psi_fn = make_net(lat.shape)
    configs = jnp.asarray(exact.all_configs(8))
    lp = log_psi_fn(v, configs)
    psi = np.exp(lp.to_numpy().astype(np.complex128))
    p = np.abs(psi) ** 2
    p /= p.sum()
    e = local_energy(log_psi_fn, v, ham, configs, lp).to_numpy()
    h = exact.dense_from_hamiltonian(ham)
    rq = np.real(np.conj(psi) @ h @ psi) / np.real(np.conj(psi) @ psi)
    np.testing.assert_allclose((p * e).sum().real, rq, rtol=1e-4)


def test_chunked_matches_unchunked():
    lat = chain(8)
    ham = Heisenberg(lat)
    v, log_psi_fn = make_net(lat.shape)
    s = jnp.asarray(exact.all_configs(8)[:64])
    lp = log_psi_fn(v, s)
    full = local_energy(log_psi_fn, v, ham, s, lp)
    chunked = local_energy(log_psi_fn, v, ham, s, lp, chunk_size=16)
    np.testing.assert_allclose(full.to_numpy(), chunked.to_numpy(), rtol=1e-5,
                               atol=1e-6)
    with pytest.raises(ValueError):
        local_energy(log_psi_fn, v, ham, s, lp, chunk_size=13)


def test_e_loc_jits():
    lat = chain(8)
    ham = TFIM(lat)
    v, log_psi_fn = make_net(lat.shape)
    s = jnp.asarray(exact.all_configs(8)[:32])
    lp = log_psi_fn(v, s)
    f = jax.jit(lambda p, s, lp: local_energy(log_psi_fn, p, ham, s, lp))
    out = f(v, s, lp)
    assert out.re.shape == (32,)
