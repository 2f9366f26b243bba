"""XYZ Hamiltonian (beyond-reference operator class: S^z-violating pair
flips on aligned bonds + transverse/longitudinal S fields).

Oracle: a literal Kronecker-product dense build from 2x2 spin matrices —
fully independent of the mel derivation in ops/hamiltonians.py AND of the
bit-level ops/exact.py builder, both of which are checked against it
(SURVEY.md §4 unit tier: 'dense matrix built independently')."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu import builder
from qmcnn_tpu.configs import Config, HamiltonianConfig, LatticeConfig, \
    SamplerConfig
from qmcnn_tpu.lattice import chain, square
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import XYZ, Heisenberg
from qmcnn_tpu.ops.local_energy import local_energy

# basis-order convention matching exact._spins: site i = bit i of the state
# index, bit value 1 = spin up (+1). With np.kron(A, B) the B factor varies
# fastest, so site i sits at kron position n-1-i. 2x2 matrices in
# (down, up) = (index 0, index 1) order; the sigma_y sign convention is
# irrelevant here because only the Sy_i Sy_j *product* enters H.
_SX = np.array([[0.0, 1.0], [1.0, 0.0]]) / 2.0
_SY = np.array([[0.0, 1.0j], [-1.0j, 0.0]]) / 2.0
_SZ = np.array([[-1.0, 0.0], [0.0, 1.0]]) / 2.0


def _site_op(op: np.ndarray, i: int, n: int) -> np.ndarray:
    out = np.eye(1)
    for k in range(n - 1, -1, -1):
        out = np.kron(out, op if k == i else np.eye(2))
    return out


def kron_xyz(n, bonds, jx, jy, jz, hx=0.0, hz=0.0) -> np.ndarray:
    """Dense H = sum_bonds [Jx SxSx + Jy SySy + Jz SzSz] - hx sum Sx
    - hz sum Sz via literal Kronecker products."""
    dim = 1 << n
    h = np.zeros((dim, dim), dtype=complex)
    for (a, b) in np.asarray(bonds):
        for coef, op in ((jx, _SX), (jy, _SY), (jz, _SZ)):
            h += coef * _site_op(op, int(a), n) @ _site_op(op, int(b), n)
    for i in range(n):
        if hx:
            h -= hx * _site_op(_SX, i, n)
        if hz:
            h -= hz * _site_op(_SZ, i, n)
    assert np.allclose(h.imag, 0.0, atol=1e-12)
    return h.real


PARAMS = dict(jx=0.9, jy=0.4, jz=0.7, hx=0.3, hz=0.2)


def test_connected_matches_kronecker_oracle():
    lat = chain(6)
    ham = XYZ(lat, **PARAMS)
    got = exact.dense_from_hamiltonian(ham).real
    want = kron_xyz(6, lat.nn_bonds, **PARAMS)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_no_field_block_is_static():
    """hx == 0 drops the N single-flip rows from K entirely."""
    lat = chain(6)
    assert XYZ(lat, **PARAMS).n_conn == len(lat.nn_bonds) + 6
    no_field = dict(PARAMS, hx=0.0)
    ham = XYZ(lat, **no_field)
    assert ham.n_conn == len(lat.nn_bonds)
    np.testing.assert_allclose(exact.dense_from_hamiltonian(ham).real,
                               kron_xyz(6, lat.nn_bonds, **no_field),
                               atol=1e-6)


def test_sparse_xyz_matches_kronecker_oracle():
    lat = square(2, 3)
    sp = exact.sparse_xyz(6, lat.nn_bonds, **PARAMS).toarray()
    np.testing.assert_allclose(sp, kron_xyz(6, lat.nn_bonds, **PARAMS),
                               atol=1e-12)


def test_marshall_rotation_identity():
    """Marshall-rotated XYZ == D H D elementwise, and the spectrum is
    invariant (same test pattern as the Heisenberg R4a check)."""
    lat = chain(6)
    plain = exact.dense_from_hamiltonian(XYZ(lat, **PARAMS)).real
    rotated = exact.dense_from_hamiltonian(
        XYZ(lat, marshall=True, **PARAMS)).real
    d = np.diag(exact.marshall_signs(6, lat.sublattice_mask))
    np.testing.assert_allclose(rotated, d @ plain @ d, atol=1e-6)
    np.testing.assert_allclose(np.linalg.eigvalsh(rotated),
                               np.linalg.eigvalsh(plain), atol=1e-5)


def test_reduces_to_xxz_heisenberg():
    """jx = jy = J, jz = delta*J, no fields == Heisenberg(j=J, delta)."""
    lat = chain(8)
    x = XYZ(lat, jx=1.0, jy=1.0, jz=0.6, hx=0.0, hz=0.0)
    heis = Heisenberg(lat, j=1.0, delta=0.6, marshall=False)
    np.testing.assert_allclose(exact.dense_from_hamiltonian(x).real,
                               exact.dense_from_hamiltonian(heis).real,
                               atol=1e-6)
    assert x.conserves_sz and x.default_move == "exchange"
    assert XYZ(lat, jx=1.0, jy=0.5).default_move == "flip"
    assert XYZ(lat, hx=0.1).default_move == "flip"


def test_e_loc_rayleigh_quotient():
    """Exact-enumeration <E_loc> == <psi|H|psi>/<psi|psi> with the
    Kronecker H (zero MC noise; exercises the full local-energy path on
    the alignment-dependent mels)."""
    from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply

    n = 6
    lat = chain(n)
    ham = XYZ(lat, **PARAMS)
    model = LogPsiCNN(lattice_shape=(n,), channels=(4,), param_scale=0.2,
                      complex_params=True)
    v = model.init(jax.random.key(5), jnp.ones((1, n), jnp.float32))

    def log_psi_fn(params, s):
        return log_psi_apply(model, params, s)

    configs = jnp.asarray(exact.all_configs(n))
    logs = log_psi_fn(v, configs)
    psi = np.exp(np.asarray(logs.re)) * np.exp(1j * np.asarray(logs.im))
    e_loc = local_energy(log_psi_fn, v, ham, configs, logs)
    e_num = np.asarray(e_loc.re) + 1j * np.asarray(e_loc.im)
    w = np.abs(psi) ** 2
    got = np.sum(w * e_num) / np.sum(w)
    h = kron_xyz(n, lat.nn_bonds, **PARAMS)
    want = (psi.conj() @ h @ psi) / (psi.conj() @ psi)
    np.testing.assert_allclose(got.real, want.real, rtol=1e-4)
    np.testing.assert_allclose(got.imag, want.imag, atol=1e-4)


def _xyz_config(move="auto", **ham_kw):
    return dataclasses.replace(
        Config(),
        lattice=LatticeConfig(shape=[6], pbc=True),
        hamiltonian=HamiltonianConfig(kind="xyz", marshall=False, **ham_kw),
        sampler=dataclasses.replace(Config().sampler, move=move),
    )


def test_builder_wiring_and_move_guard():
    cfg = _xyz_config(jx=0.9, jy=0.4, jz=0.7, hx=0.3)
    lat = builder.build_lattice(cfg)
    ham = builder.build_hamiltonian(cfg, lat)
    assert isinstance(ham, XYZ) and ham.jy == 0.4 and ham.hx == 0.3
    assert builder.resolve_move(cfg) == "flip"
    # S^z-conserving xyz auto-selects exchange
    cons = _xyz_config(jx=1.0, jy=1.0, jz=0.5)
    assert builder.resolve_move(cons) == "exchange"
    # explicit exchange on a non-conserving xyz is rejected
    bad = _xyz_config(move="exchange", jx=0.9, jy=0.4)
    with pytest.raises(ValueError, match="conserve"):
        builder.resolve_move(bad)


@pytest.mark.slow
def test_xyz_train_vs_ed():
    """Integration: anisotropic XY chain in a transverse field — flip
    moves, complex CNN — converges toward ED (CI-scale tolerance).

    Marshall rotation matters here even though this is not XXZ: with
    jx > jy > 0 the rotated pair-flip elements are negative on BOTH
    alignments (anti: -(jx+jy)/4, aligned: -(jx-jy)/4), leaving only the
    small +-hx/2 single-flip signs — near-stoquastic. Measured: the same
    recipe without the rotation stalls at E ~ 0 (rel err 100%); with it,
    0.7% in 300 steps."""
    import optax

    from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
    from qmcnn_tpu.sampler.metropolis import MetropolisSampler
    from qmcnn_tpu.vmc import VMC

    n = 8
    lat = chain(n)
    kw = dict(jx=1.0, jy=0.4, jz=0.2, hx=0.5, hz=0.0)
    ham = XYZ(lat, marshall=True, **kw)
    e_exact = exact.ground_energy(exact.sparse_xyz(n, lat.nn_bonds, **kw))

    model = LogPsiCNN(lattice_shape=(n,), channels=(8, 8), param_scale=0.05,
                      complex_params=True)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    params = model.init(jax.random.key(0), jnp.ones((1, n), jnp.float32))
    sampler = MetropolisSampler(log_psi_fn, n_sites=n, move="flip")
    vmc = VMC(log_psi_fn=log_psi_fn, ham=ham, sampler=sampler,
              optimizer=optax.adam(0.01), n_sweeps=2)
    m = 256
    ids = jnp.arange(m)
    state = vmc.init_state(jax.random.key(1), m, params)
    state = vmc.thermalize(state, jax.random.key(2), ids, n_sweeps=20)
    step = jax.jit(vmc.step)
    energies = []
    for it in range(300):
        state, metrics = step(
            state, jax.random.fold_in(jax.random.key(3), it), ids)
        energies.append(float(metrics.energy_re))
        assert np.isfinite(energies[-1])
    e_tail = np.mean(energies[-50:])
    rel_err = abs(e_tail - e_exact) / abs(e_exact)
    assert rel_err < 1.5e-2, (
        f"E_vmc={e_tail:.4f} vs E_exact={e_exact:.4f} rel_err={rel_err:.2e}")
