"""Pallas fused-sweep kernel tests, interpreter mode on CPU (SURVEY.md K1 +
section 5: interpret-mode parity tests for every kernel).

The kernel consumes the same jax.random noise streams as the XLA sampler,
so the strongest test is direct: a fused Pallas sweep must reproduce
MetropolisSampler.sample decision-for-decision. Plus the exact bookkeeping
invariant (tracked log psi == recomputed log psi) and sector conservation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.kernels.metropolis_pallas import (
    pallas_sweep, prepare_circulant_params, sweep_noise,
)
from qmcnn_tpu.lattice import chain, square
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.sampler.metropolis import MetropolisSampler, init_walkers

N = 8


def make_model(shape, channels=(4,), scale=0.3, seed=7):
    n = int(np.prod(shape))
    model = LogPsiCNN(lattice_shape=shape, channels=channels,
                      param_scale=scale, conv_impl="circulant")
    v = model.init(jax.random.key(seed), jnp.ones((1, n), jnp.float32))
    return model, v


def test_forward_parity_recompute_mode():
    """n_props=0: in-kernel circulant forward == model forward."""
    for shape in [(8,), (4, 4)]:
        n = int(np.prod(shape))
        model, v = make_model(shape, channels=(4, 3))
        s = init_walkers(jax.random.key(0), 16, n)
        want = log_psi_apply(model, v, s).re
        _, got, _ = pallas_sweep(v, s, jnp.zeros(16),
                                 lattice_shape=shape, n_props=0,
                                 block=8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("move", ["flip", "exchange"])
def test_kernel_matches_xla_sampler(move):
    """THE parity test: fused kernel sweep == MetropolisSampler.sample,
    same noise streams, decision for decision."""
    shape = (N,)
    lat = chain(N)
    model, v = make_model(shape)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    bonds = lat.nn_bonds if move == "exchange" else None
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move=move,
                                bonds=bonds)
    m = 32
    state = sampler.init_state(v, jax.random.key(1), m)
    ids = jnp.arange(m)
    key = jax.random.key(4)
    want = sampler.sample(v, state, key, ids, n_sweeps=2)  # 2*N proposals

    s_out, lp_out, acc = pallas_sweep(
        v, state.s, state.log_psi.re, step_key=key, walker_ids=ids,
        lattice_shape=shape, n_props=2 * N, move=move, bonds=bonds,
        block=16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(s_out), np.asarray(want.s))
    np.testing.assert_allclose(np.asarray(lp_out),
                               np.asarray(want.log_psi.re), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(acc, np.int32),
                                  np.asarray(want.n_accept))


def test_tracked_logpsi_consistent_after_sweep():
    """After n_props proposals, tracked log psi == recomputed log psi."""
    model, v = make_model((N,))
    m = 32
    s = init_walkers(jax.random.key(0), m, N)
    lp = log_psi_apply(model, v, s).re
    s_out, lp_out, acc = pallas_sweep(
        v, s, lp, step_key=jax.random.key(3), walker_ids=jnp.arange(m),
        lattice_shape=(N,), n_props=24, block=16, interpret=True,
    )
    want = log_psi_apply(model, v, jnp.asarray(s_out)).re
    np.testing.assert_allclose(np.asarray(lp_out), np.asarray(want),
                               rtol=2e-4, atol=1e-4)
    assert set(np.unique(np.asarray(s_out))) <= {-1.0, 1.0}
    acc = np.asarray(acc)
    assert acc.sum() > 0 and np.all(acc <= 24)


def test_exchange_conserves_sz_2d():
    lat = square(2, 4)
    model, v = make_model((2, 4))
    m = 32
    s = init_walkers(jax.random.key(1), m, 8, sector="sz0")
    lp = log_psi_apply(model, v, s).re
    s_out, lp_out, acc = pallas_sweep(
        v, s, lp, step_key=jax.random.key(5), walker_ids=jnp.arange(m),
        lattice_shape=(2, 4), n_props=20, move="exchange",
        bonds=lat.nn_bonds, block=16, interpret=True,
    )
    assert np.all(np.asarray(s_out).sum(-1) == 0)
    want = log_psi_apply(model, v, jnp.asarray(s_out)).re
    np.testing.assert_allclose(np.asarray(lp_out), np.asarray(want),
                               rtol=2e-4, atol=1e-4)
    assert np.asarray(acc).sum() > 0


def test_validation_errors():
    model, v = make_model((N,))
    s = init_walkers(jax.random.key(0), 16, N)
    with pytest.raises(ValueError):
        pallas_sweep(v, s, jnp.zeros(16), step_key=jax.random.key(0),
                     walker_ids=jnp.arange(16), lattice_shape=(N,),
                     n_props=1, move="exchange", interpret=True)
    with pytest.raises(ValueError):
        pallas_sweep(v, s, jnp.zeros(16), step_key=jax.random.key(0),
                     walker_ids=jnp.arange(16), lattice_shape=(N,),
                     n_props=1, block=5, interpret=True)
    with pytest.raises(ValueError):
        pallas_sweep(v, s, jnp.zeros(16), lattice_shape=(N,), n_props=1,
                     interpret=True)  # no noise source
    cmodel = LogPsiCNN(lattice_shape=(N,), channels=(4,), complex_params=True)
    cv = cmodel.init(jax.random.key(0), jnp.ones((1, N), jnp.float32))
    with pytest.raises(ValueError):
        prepare_circulant_params(cv, (N,))


def test_sampler_backend_pallas_matches_xla():
    """MetropolisSampler(backend='pallas') == backend='xla' end to end."""
    model, v = make_model((N,))

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    common = dict(n_sites=N, move="flip", lattice_shape=(N,),
                  pallas_block=16)
    xla = MetropolisSampler(log_psi_fn, backend="xla", **common)
    pls = MetropolisSampler(log_psi_fn, backend="pallas", **common)
    state = xla.init_state(v, jax.random.key(1), 32)
    ids = jnp.arange(32)
    key = jax.random.key(8)
    a = xla.sample(v, state, key, ids, n_sweeps=2)
    b = pls.sample(v, state, key, ids, n_sweeps=2)
    np.testing.assert_array_equal(np.asarray(a.s), np.asarray(b.s))
    np.testing.assert_array_equal(np.asarray(a.n_accept),
                                  np.asarray(b.n_accept))
    assert int(b.n_prop[0]) == 2 * N


def test_pallas_backend_trains_tfim():
    """Few VMC steps with the pallas sampler backend: finite and improving."""
    import optax
    from qmcnn_tpu.ops.hamiltonians import TFIM
    from qmcnn_tpu.vmc import VMC

    lat = chain(N)
    model, v = make_model((N,), channels=(4,), scale=0.05)

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip",
                                backend="pallas", lattice_shape=(N,),
                                pallas_block=32)
    vmc = VMC(log_psi_fn=log_psi_fn, ham=TFIM(lat, h=1.0), sampler=sampler,
              optimizer=optax.sgd(0.05), n_sweeps=1)
    state = vmc.init_state(jax.random.key(1), 64, v)
    ids = jnp.arange(64)
    es = []
    for it in range(10):
        state, m = vmc.step(state, jax.random.fold_in(jax.random.key(2), it),
                            ids)
        es.append(float(m.energy_re))
    assert np.all(np.isfinite(es))
