"""Sampler tests (SURVEY.md section 4): exact-distribution chi-square on an
enumerable system, S^z sector preservation, and sharding-independence of the
per-walker random streams."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.sampler.metropolis import (
    MetropolisSampler, WalkerState, init_walkers,
)

N = 8


@pytest.fixture(scope="module")
def tiny_model():
    model = LogPsiCNN(lattice_shape=(N,), channels=(4,), param_scale=0.3)
    s0 = jnp.ones((1, N), jnp.float32)
    variables = model.init(jax.random.key(7), s0)

    def log_psi_fn(params, s):
        return log_psi_apply(model, params, s)

    return variables, log_psi_fn


def exact_probs(log_psi_fn, variables, configs):
    lp = log_psi_fn(variables, jnp.asarray(configs))
    w = np.exp(2 * (np.asarray(lp.re, np.float64) - np.asarray(lp.re).max()))
    return w / w.sum()


def collect_samples(sampler, variables, n_walkers, n_therm, n_snap, seed=0):
    state = sampler.init_state(variables, jax.random.key(seed), n_walkers)
    ids = jnp.arange(n_walkers)
    sample = jax.jit(sampler.sample, static_argnames="n_sweeps")
    state = sample(variables, state, jax.random.key(seed + 1), ids,
                   n_sweeps=n_therm)
    snaps = []
    for t in range(n_snap):
        state = sample(variables, state, jax.random.key(1000 + t), ids,
                       n_sweeps=2)
        snaps.append(np.asarray(state.s))
    return state, np.concatenate(snaps, axis=0)


def config_index(s):
    """Map {-1,+1}^N configs to basis integers (bit i set iff s_i=+1)."""
    bits = (s > 0).astype(np.int64)
    return bits @ (1 << np.arange(s.shape[-1]))


def test_flip_samples_exact_distribution(tiny_model):
    variables, log_psi_fn = tiny_model
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip")
    _, samples = collect_samples(sampler, variables, n_walkers=1500,
                                 n_therm=30, n_snap=12)
    counts = np.bincount(config_index(samples), minlength=2 ** N)
    p_emp = counts / counts.sum()
    p = exact_probs(log_psi_fn, variables, exact.all_configs(N))
    tv = 0.5 * np.abs(p_emp - p).sum()
    assert tv < 0.06, f"total variation {tv:.4f} too large"


def test_exchange_preserves_sz_and_samples_sector(tiny_model):
    variables, log_psi_fn = tiny_model
    lat = chain(N)
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="exchange",
                                bonds=lat.nn_bonds)
    state, samples = collect_samples(sampler, variables, n_walkers=1500,
                                     n_therm=30, n_snap=12)
    # sector preservation: every sample has sum(s) == 0
    assert np.all(samples.sum(axis=-1) == 0)
    # distribution within the S^z=0 sector
    all_cfg = exact.all_configs(N)
    sector = all_cfg.sum(axis=-1) == 0
    p = exact_probs(log_psi_fn, variables, all_cfg)
    p_sector = p * sector
    p_sector = p_sector / p_sector.sum()
    counts = np.bincount(config_index(samples), minlength=2 ** N)
    p_emp = counts / counts.sum()
    tv = 0.5 * np.abs(p_emp - p_sector).sum()
    assert tv < 0.06, f"total variation {tv:.4f} too large"


def test_acceptance_rate_tracked(tiny_model):
    variables, log_psi_fn = tiny_model
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip")
    state = sampler.init_state(variables, jax.random.key(0), 64)
    state = sampler.sample(variables, state, jax.random.key(1),
                           jnp.arange(64), n_sweeps=5)
    acc = float(MetropolisSampler.acceptance_rate(state))
    assert 0.05 < acc <= 1.0
    assert int(state.n_prop[0]) == 5 * N
    state = MetropolisSampler.reset_counters(state)
    assert int(state.n_prop.sum()) == 0


def test_walker_streams_independent_of_batching(tiny_model):
    """Walker w's trajectory depends only on its global id — running walkers
    together or in two halves gives identical configurations (the property
    the multi-chip sharding equivalence rests on)."""
    variables, log_psi_fn = tiny_model
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip")
    state = sampler.init_state(variables, jax.random.key(3), 8)
    key = jax.random.key(4)
    full = sampler.sample(variables, state, key, jnp.arange(8), n_sweeps=3)

    def slice_state(st, sl):
        return WalkerState(st.s[sl], st.log_psi[sl], st.n_accept[sl],
                           st.n_prop[sl])

    lo = sampler.sample(variables, slice_state(state, slice(0, 4)), key,
                        jnp.arange(0, 4), n_sweeps=3)
    hi = sampler.sample(variables, slice_state(state, slice(4, 8)), key,
                        jnp.arange(4, 8), n_sweeps=3)
    np.testing.assert_array_equal(np.asarray(full.s),
                                  np.concatenate([lo.s, hi.s]))
    np.testing.assert_allclose(np.asarray(full.log_psi.re),
                               np.concatenate([lo.log_psi.re, hi.log_psi.re]),
                               rtol=1e-6)


def test_init_walkers_sector():
    s = init_walkers(jax.random.key(0), 32, 10, sector="sz0")
    assert s.shape == (32, 10)
    assert np.all(np.asarray(s).sum(axis=-1) == 0)
    assert set(np.unique(np.asarray(s))) == {-1.0, 1.0}
    # odd N: the minimal-|S^z| sector is S^z = +1/2 (sum = +1); exchange
    # moves preserve it — unlocks odd-site lattices (27-site kagome)
    s = init_walkers(jax.random.key(0), 16, 7, sector="sz0")
    assert np.all(np.asarray(s).sum(axis=-1) == 1)


def test_refresh_recomputes_logpsi(tiny_model):
    variables, log_psi_fn = tiny_model
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip")
    state = sampler.init_state(variables, jax.random.key(0), 16)
    want = log_psi_fn(variables, state.s)
    np.testing.assert_allclose(np.asarray(state.log_psi.re),
                               np.asarray(want.re), rtol=1e-6)


def test_exchange_anti_samples_exact_sector_distribution(tiny_model):
    """Hastings-corrected anti-aligned proposals must sample the SAME
    sector distribution as plain exchange (catches correction bugs)."""
    variables, log_psi_fn = tiny_model
    lat = chain(N)
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="exchange_anti",
                                bonds=lat.nn_bonds)
    state, samples = collect_samples(sampler, variables, n_walkers=1500,
                                     n_therm=30, n_snap=12)
    assert np.all(samples.sum(axis=-1) == 0)
    all_cfg = exact.all_configs(N)
    sector = all_cfg.sum(axis=-1) == 0
    p = exact_probs(log_psi_fn, variables, all_cfg)
    p_sector = p * sector
    p_sector = p_sector / p_sector.sum()
    counts = np.bincount(config_index(samples), minlength=2 ** N)
    p_emp = counts / counts.sum()
    tv = 0.5 * np.abs(p_emp - p_sector).sum()
    assert tv < 0.06, f"total variation {tv:.4f} too large"


def test_exchange_anti_every_proposal_moves(tiny_model):
    """No identity proposals: every accepted step changes the state, and
    acceptance is high (no aligned-bond no-ops inflating it)."""
    variables, log_psi_fn = tiny_model
    lat = chain(N)
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="exchange_anti",
                                bonds=lat.nn_bonds)
    state = sampler.init_state(variables, jax.random.key(0), 64)
    s_before = np.asarray(state.s)
    state2 = sampler.sample(variables, state, jax.random.key(1),
                            jnp.arange(64), n_sweeps=1)
    acc = float(MetropolisSampler.acceptance_rate(state2))
    assert 0.2 < acc <= 1.0
    # walkers with accepted moves actually changed configuration
    changed = (np.asarray(state2.s) != s_before).any(axis=1)
    has_accepts = np.asarray(state2.n_accept) > 0
    assert np.array_equal(changed, has_accepts)
