"""Lanczos-step refinement vs dense exact enumeration (no MC noise).

Oracle: all 2^N configurations, exact |psi|^2 weights, dense H from the
independently-tested dense_from_hamiltonian. Validates (a) the G = H^2
moment plumbing (masks, mels, ratios, diagonal term) exactly, (b) the
closed-form minimizer against the dense Rayleigh quotient of
(1 + alpha H) psi, (c) variational monotonicity E(alpha*) <= E(0).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import TFIM, Heisenberg
from qmcnn_tpu.ops.lanczos import (h_moment_samples, lanczos_step,
                                   moments_from_samples)

N = 8


def setup(ham_kind, complex_params):
    lat = chain(N)
    if ham_kind == "tfim":
        ham = TFIM(lat, h=0.9)
    else:
        ham = Heisenberg(lat, marshall=True)
    model = LogPsiCNN(lattice_shape=(N,), channels=(3,), param_scale=0.3,
                      complex_params=complex_params)
    v = model.init(jax.random.key(7), jnp.ones((1, N), jnp.float32))

    def log_psi_fn(params, s):
        return log_psi_apply(model, params, s)

    return ham, v, log_psi_fn


@pytest.mark.parametrize("ham_kind,complex_params", [
    ("tfim", False),
    ("tfim", True),
    ("heisenberg", True),
])
def test_moments_match_dense(ham_kind, complex_params):
    ham, v, log_psi_fn = setup(ham_kind, complex_params)
    configs = jnp.asarray(exact.all_configs(N))
    lp = log_psi_fn(v, configs)
    psi = np.exp(lp.to_numpy().astype(np.complex128))
    p = np.abs(psi) ** 2
    p /= p.sum()
    h = exact.dense_from_hamiltonian(ham)
    norm = float(np.real(np.conj(psi) @ psi))
    hpsi = h @ psi
    h2psi = h @ hpsi
    want_h1 = float(np.real(np.conj(psi) @ hpsi) / norm)
    want_h2 = float(np.real(np.conj(hpsi) @ hpsi) / norm)
    want_h3 = float(np.real(np.conj(hpsi) @ h2psi) / norm)

    e1, g = h_moment_samples(log_psi_fn, v, ham, configs, lp, chunk_size=64)
    h1, h2, h3 = moments_from_samples(e1, g, weights=p)
    np.testing.assert_allclose(h1, want_h1, rtol=2e-5)
    np.testing.assert_allclose(h2, want_h2, rtol=2e-5)
    np.testing.assert_allclose(h3, want_h3, rtol=2e-5)

    # per-sample G itself must equal (H^2 psi)_s / psi_s
    g_want = h2psi / psi
    g_got = g.to_numpy().astype(np.complex128)
    np.testing.assert_allclose(g_got, g_want, rtol=2e-4, atol=1e-6)


def test_lanczos_energy_matches_dense_and_improves():
    ham, v, log_psi_fn = setup("heisenberg", True)
    configs = jnp.asarray(exact.all_configs(N))
    lp = log_psi_fn(v, configs)
    psi = np.exp(lp.to_numpy().astype(np.complex128))
    p = np.abs(psi) ** 2
    p /= p.sum()
    e1, g = h_moment_samples(log_psi_fn, v, ham, configs, lp)
    h1, h2, h3 = moments_from_samples(e1, g, weights=p)
    alpha, e_lz, e0 = lanczos_step(h1, h2, h3)

    h = exact.dense_from_hamiltonian(ham)

    def dense_e(a):
        phi = psi + a * (h @ psi)
        return float(np.real(np.conj(phi) @ h @ phi)
                     / np.real(np.conj(phi) @ phi))

    np.testing.assert_allclose(e_lz, dense_e(alpha), rtol=1e-6)
    assert e_lz < e0  # strict improvement for a non-eigenstate
    # alpha* is a genuine minimum of the dense energy curve
    # (tolerance: moments come through f32 forwards, so alpha* lands
    # within ~1e-7 relative of the true dense minimizer)
    for da in (-1e-3, 1e-3):
        assert dense_e(alpha + da) >= e_lz - 1e-6
    # and bounded below by the true ground state
    e_exact = float(np.linalg.eigvalsh(h.real).min())
    assert e_lz > e_exact - 1e-9


def test_lanczos_step_degenerate_eigenstate():
    """Exact eigenstate: k2 = 0 -> alpha = 0, energy unchanged."""
    alpha, e, e0 = lanczos_step(-3.0, 9.0, -27.0)
    assert alpha == 0.0 and e == -3.0 and e0 == -3.0


# ---- variational (1 + alpha H) ansatz (ops/lanczos.lanczos_wrap, r5) ----

def test_lanczos_wrap_matches_dense():
    """exp(wrapped log-amp) == (1 + alpha H) psi exactly, all 2^N configs."""
    from qmcnn_tpu.ops.lanczos import lanczos_init_alpha, lanczos_wrap

    ham, v, log_psi_fn = setup("heisenberg", True)
    alpha = 0.13
    wrapped = lanczos_wrap(log_psi_fn, ham)
    params = dict(v)
    params["lanczos"] = lanczos_init_alpha(alpha)
    configs = jnp.asarray(exact.all_configs(N))
    lp = log_psi_fn(v, configs)
    psi = np.exp(lp.to_numpy().astype(np.complex128))
    h = exact.dense_from_hamiltonian(ham)
    phi_want = psi + alpha * (h @ psi)
    lw = wrapped(params, configs)
    phi_got = np.exp(lw.to_numpy().astype(np.complex128))
    np.testing.assert_allclose(phi_got, phi_want, rtol=2e-4, atol=1e-8)


def test_lanczos_wrap_local_energy_and_alpha_gradient():
    """local_energy COMPOSES over the wrapped fn (the K^2 nested expansion)
    and matches the dense Rayleigh quotient of phi; d<E>/d alpha at the
    enumerated distribution is finite and pushes toward lanczos_step's
    alpha* > 0 side (nonzero descent direction)."""
    from qmcnn_tpu.ops.local_energy import local_energy
    from qmcnn_tpu.ops.lanczos import lanczos_wrap

    ham, v, log_psi_fn = setup("heisenberg", True)
    wrapped = lanczos_wrap(log_psi_fn, ham)
    configs = jnp.asarray(exact.all_configs(N))
    h = exact.dense_from_hamiltonian(ham)

    def e_of_alpha(a):
        p2 = dict(v)
        p2["lanczos"] = {"alpha": jnp.stack([a, jnp.zeros_like(a)])}
        lw = wrapped(p2, configs)
        logw = 2.0 * (lw.re - jax.lax.stop_gradient(jnp.max(lw.re)))
        w = jnp.exp(logw)
        w = w / jnp.sum(w)
        el = local_energy(wrapped, p2, ham, configs, lw, chunk_size=64)
        return jnp.sum(w * el.re)

    alpha = 0.11
    e_got = float(e_of_alpha(jnp.asarray(alpha)))
    lp = log_psi_fn(v, configs)
    psi = np.exp(lp.to_numpy().astype(np.complex128))
    phi = psi + alpha * (h @ psi)
    e_want = float(np.real(np.conj(phi) @ (h @ phi))
                   / np.real(np.conj(phi) @ phi))
    np.testing.assert_allclose(e_got, e_want, rtol=5e-5)
    g = float(jax.grad(e_of_alpha)(jnp.asarray(alpha)))
    assert np.isfinite(g) and abs(g) > 1e-8


def test_lanczos_wrap_builder_end_to_end():
    """builder wires model.lanczos_alpha: params gain the collection, one
    minSR train step runs, and the wrapped state's exact energy at init
    is BELOW the bare model's (alpha* from the measured moments)."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import build

    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(6,)),
        model=cfglib.ModelConfig(channels=(3,), kernel_size=3,
                                 complex_params=True, param_scale=0.3,
                                 lanczos_alpha=0.1),
        hamiltonian=cfglib.HamiltonianConfig(kind="heisenberg"),
        sampler=cfglib.SamplerConfig(n_walkers=32, move="exchange",
                                     n_therm_sweeps=2),
        sr=cfglib.SRConfig(solver="minsr"),
    )
    vmc, params, lattice = build(cfg)
    assert "lanczos" in params and params["lanczos"]["alpha"].shape == (2,)
    key = jax.random.key(0)
    state = vmc.init_state(key, 32, params)
    ids = jnp.arange(32)
    state2, metrics = jax.jit(vmc.step)(state, jax.random.fold_in(key, 1),
                                        ids)
    assert np.isfinite(float(metrics.energy_re))
    # alpha is a live parameter: one step must move it
    assert not np.allclose(np.asarray(state2.params["lanczos"]["alpha"]),
                           np.asarray(params["lanczos"]["alpha"]))
