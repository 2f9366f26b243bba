"""Observable estimator tests against exact enumeration (no MC noise)."""
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.lattice import chain, square
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact, observables
from qmcnn_tpu.ops.cplx import C


def test_magnetization_simple():
    s = jnp.asarray([[1.0, 1.0, 1.0, 1.0], [1.0, -1.0, 1.0, -1.0]])
    np.testing.assert_allclose(float(observables.magnetization(s)), 0.25)
    np.testing.assert_allclose(float(observables.magnetization_sq(s)), 0.125)


def test_staggered_magnetization():
    lat = chain(4)
    neel = jnp.asarray([[1.0, -1.0, 1.0, -1.0]])
    out = float(observables.staggered_magnetization_sq(neel, lat))
    np.testing.assert_allclose(out, 0.25)  # perfect Neel: (1/2)^2


def test_szsz_correlation_vs_site_indexing_oracle():
    """The roll-based C(r) estimator == an independent site-indexing oracle
    (catches displacement/row-major bookkeeping bugs) on uniform batches."""
    for lat in [chain(6), square(2, 4)]:
        n = lat.n_sites
        configs = jnp.asarray(exact.all_configs(n))
        got = np.asarray(observables.szsz_correlation(configs, lat))
        s_np = np.asarray(configs) / 2.0
        shape = np.asarray(lat.shape)
        # oracle: for displacement r (as lattice coords), average over sites
        # i of sz_i * sz_{i+r}, sites mapped with explicit modular arithmetic
        want = np.zeros(n)
        for r in range(n):
            disp = lat.coords[r]
            acc = 0.0
            for i in range(n):
                j = int(np.ravel_multi_index(
                    (lat.coords[i] + disp) % shape, lat.shape))
                acc += (s_np[:, i] * s_np[:, j]).mean()
            want[r] = acc / n
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(got[0], 0.25, rtol=1e-6)  # C(0) = 1/4


def test_structure_factor_neel_peak():
    lat = chain(8)
    neel = jnp.asarray(np.tile([1.0, -1.0], 4)[None, :])
    corr = observables.szsz_correlation(neel, lat)
    sq = observables.structure_factor(corr, lat)
    assert sq.argmax() == 4  # q = pi for N=8


def test_offdiag_observable_matches_energy_machinery():
    """offdiag_observable with the Hamiltonian's own connected() must equal
    local_energy's off-diagonal part (same machinery, independent path)."""
    from qmcnn_tpu.ops.hamiltonians import TFIM
    from qmcnn_tpu.ops.local_energy import local_energy

    lat = chain(6)
    ham = TFIM(lat, h=0.7)
    model = LogPsiCNN(lattice_shape=(6,), channels=(3,), param_scale=0.2)
    v = model.init(jax.random.key(1), jnp.ones((1, 6), jnp.float32))

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    s = jnp.asarray(exact.all_configs(6)[:32])
    lp = log_psi_fn(v, s)
    got = observables.offdiag_observable(log_psi_fn, v, s, lp, ham.connected)
    e = local_energy(log_psi_fn, v, ham, s, lp)
    want_re = float((np.asarray(e.re) - np.asarray(ham.diag_batch(s))).mean())
    np.testing.assert_allclose(float(got.re), want_re, rtol=1e-5)
