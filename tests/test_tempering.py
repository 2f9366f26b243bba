"""Parallel tempering (replica exchange) tests.

The correctness contract: tempering is a MIXING aid only — the physical
beta = 1 chain's stationary distribution must remain exactly |psi|^2, and
each hot replica r must sample |psi|^{2 b_r}. Both are checked against
exact enumeration (TV distance), swaps included.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.lattice import chain
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.ops import exact
from qmcnn_tpu.sampler.metropolis import MetropolisSampler

N = 8
BETAS = (1.0, 0.6, 0.3)


@pytest.fixture(scope="module")
def tiny_model():
    model = LogPsiCNN(lattice_shape=(N,), channels=(4,), param_scale=0.3)
    variables = model.init(jax.random.key(7), jnp.ones((1, N), jnp.float32))

    def log_psi_fn(params, s):
        return log_psi_apply(model, params, s)

    return variables, log_psi_fn


def _exact_probs_beta(log_psi_fn, variables, configs, beta, sector=None):
    lp = np.asarray(log_psi_fn(variables, jnp.asarray(configs)).re,
                    np.float64)
    w = np.exp(2.0 * beta * (lp - lp.max()))
    if sector is not None:
        w = w * sector
    return w / w.sum()


def _collect(sampler, variables, n_walkers, n_therm, n_snap, seed=0):
    state = sampler.init_state(variables, jax.random.key(seed), n_walkers)
    ids = jnp.arange(n_walkers)   # PHYSICAL ids
    sample = jax.jit(sampler.sample, static_argnames="n_sweeps")
    state = sample(variables, state, jax.random.key(seed + 1), ids,
                   n_sweeps=n_therm)
    snaps = []
    for t in range(n_snap):
        state = sample(variables, state, jax.random.key(1000 + t), ids,
                       n_sweeps=2)
        snaps.append(np.asarray(state.s))
    return state, np.concatenate(snaps, axis=0)


def _config_index(s):
    bits = (s > 0).astype(np.int64)
    return bits @ (1 << np.arange(s.shape[-1]))


def test_every_replica_samples_its_tempered_distribution(tiny_model):
    """Rows r::R must be distributed as |psi|^{2 b_r} for every r —
    including r = 0 (the physical chain stays exactly |psi|^2). This is
    the theorem the swap acceptance rule has to get right; a wrong rule
    fails r = 0 within a few sweeps."""
    variables, log_psi_fn = tiny_model
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip",
                                betas=BETAS)
    _, samples = _collect(sampler, variables, n_walkers=1200,
                          n_therm=30, n_snap=12)
    r = len(BETAS)
    cfgs = exact.all_configs(N)
    for j, beta in enumerate(BETAS):
        rows = samples.reshape(-1, r, N)[:, j]
        counts = np.bincount(_config_index(rows), minlength=2 ** N)
        p_emp = counts / counts.sum()
        p = _exact_probs_beta(log_psi_fn, variables, cfgs, beta)
        tv = 0.5 * np.abs(p_emp - p).sum()
        assert tv < 0.06, f"replica {j} (beta={beta}): TV {tv:.4f}"


def test_tempered_exchange_preserves_sector_all_replicas(tiny_model):
    variables, log_psi_fn = tiny_model
    lat = chain(N)
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="exchange_anti",
                                bonds=lat.nn_bonds, betas=BETAS)
    state, samples = _collect(sampler, variables, n_walkers=800,
                              n_therm=30, n_snap=10)
    assert np.all(samples.sum(axis=-1) == 0)  # every replica stays in sz0
    # physical chain matches the sector-restricted |psi|^2
    cfgs = exact.all_configs(N)
    sector = (cfgs.sum(axis=-1) == 0).astype(np.float64)
    rows = samples.reshape(-1, len(BETAS), N)[:, 0]
    counts = np.bincount(_config_index(rows), minlength=2 ** N)
    p_emp = counts / counts.sum()
    p = _exact_probs_beta(log_psi_fn, variables, cfgs, 1.0, sector=sector)
    tv = 0.5 * np.abs(p_emp - p).sum()
    assert tv < 0.06, f"TV {tv:.4f}"


def test_physical_slices_beta1_rows(tiny_model):
    variables, log_psi_fn = tiny_model
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip",
                                betas=BETAS)
    state = sampler.init_state(variables, jax.random.key(0), 16)
    assert state.s.shape == (16 * len(BETAS), N)
    phys = sampler.physical(state)
    assert phys.s.shape == (16, N)
    np.testing.assert_array_equal(np.asarray(phys.s),
                                  np.asarray(state.s)[::len(BETAS)])
    np.testing.assert_array_equal(np.asarray(phys.log_psi.re),
                                  np.asarray(state.log_psi.re)[::3])


def test_tempered_streams_independent_of_batching(tiny_model):
    """Tempered trajectories depend only on global PHYSICAL walker ids —
    running 8 walkers at once or as two batches of 4 (with global ids)
    gives identical rows, the sharding-equivalence property."""
    variables, log_psi_fn = tiny_model
    sampler = MetropolisSampler(log_psi_fn, n_sites=N, move="flip",
                                betas=BETAS)
    state = sampler.init_state(variables, jax.random.key(3), 8)
    key = jax.random.key(4)
    full = sampler.sample(variables, state, key, jnp.arange(8), n_sweeps=3)
    r = len(BETAS)
    for lo, hi in [(0, 4), (4, 8)]:
        part = jax.tree_util.tree_map(lambda x: x[lo * r: hi * r], state)
        out = sampler.sample(variables, part, key,
                             jnp.arange(lo, hi), n_sweeps=3)
        np.testing.assert_array_equal(
            np.asarray(out.s), np.asarray(full.s)[lo * r: hi * r])


def test_beta_ladder_validation(tiny_model):
    variables, log_psi_fn = tiny_model
    for bad, match in [
        ((1.0,), ">= 2"),
        ((0.9, 0.5), "must be 1.0"),
        ((1.0, 1.0), "decreasing"),
        ((1.0, 0.5, 0.7), "decreasing"),
        ((1.0, 0.0), r"\(0, 1\]"),
        ((1.0, -0.5), r"\(0, 1\]"),
    ]:
        with pytest.raises(ValueError, match=match):
            MetropolisSampler(log_psi_fn, n_sites=N, move="flip", betas=bad)
    with pytest.raises(ValueError, match="xla"):
        MetropolisSampler(log_psi_fn, n_sites=N, move="flip",
                          betas=(1.0, 0.5), backend="pallas",
                          lattice_shape=(N,))


def test_builder_tempering_wiring_and_guards():
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import build

    cfg = cfglib.from_yaml("""
name: temper_test
lattice: {shape: [8]}
model: {channels: [4]}
hamiltonian: {kind: heisenberg}
sampler: {n_walkers: 16, move: exchange_anti,
          tempering_betas: [1.0, 0.6, 0.3], n_therm_sweeps: 2}
sr: {enabled: false}
run: {n_steps: 2, validate_against_ed: false}
""")
    vmc, params, lattice = build(cfg)
    assert vmc.sampler.betas == (1.0, 0.6, 0.3)
    # a full train step runs and the metrics stay finite; the stored
    # walker state keeps all replicas, estimators saw M physical walkers
    state = vmc.init_state(jax.random.key(0), 16, params)
    assert state.walkers.s.shape[0] == 48
    state, m = jax.jit(vmc.step)(state, jax.random.key(1), jnp.arange(16))
    assert np.isfinite(float(m.energy_re))
    assert state.walkers.s.shape[0] == 48

    import dataclasses
    bad = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, kind="arnn"))
    with pytest.raises(ValueError, match="tempering"):
        build(bad)
