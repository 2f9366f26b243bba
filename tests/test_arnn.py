"""ARNN ansatz + direct sampler tests.

Oracles (SURVEY.md section 4 test contract, extended to the autoregressive
family):
  * autoregressive property: conditional i is invariant to any change of
    s_j for j >= i (MADE mask correctness)
  * EXACT normalization: sum_s |psi(s)|^2 == 1 over the full 2^N
    enumeration (free model) and over the S^z=0 sector (sz_zero model) —
    the property MCMC-sampled ansatze cannot even state
  * sampler exactness: ancestral samples' empirical distribution matches
    the enumerated |psi|^2 (chi-square), and sz_zero samples never leave
    the sector
  * end-to-end: TFIM N=10 trains to ED energy with the direct sampler
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qmcnn_tpu.builder import build
from qmcnn_tpu.configs import Config, from_yaml
from qmcnn_tpu.models.arnn import LogPsiARNN, conditional_fn, made_masks
from qmcnn_tpu.ops import exact
from qmcnn_tpu.sampler.direct import DirectSampler

N = 8


def all_configs(n):
    """[2^n, n] float32 enumeration of spin configurations."""
    bits = np.array(list(itertools.product([-1.0, 1.0], repeat=n)),
                    np.float32)
    return jnp.asarray(bits)


def make_model(complex_params=False, sz_zero=False, n=N, conv=False):
    kwargs = {}
    if conv:
        assert n == 8
        kwargs = dict(conv_kernel=3, lattice_shape=(2, 4))
    model = LogPsiARNN(n_sites=n, hidden=(16, 16),
                       complex_params=complex_params, sz_zero=sz_zero,
                       param_scale=1.0, **kwargs)
    v = model.init(jax.random.key(1), jnp.ones((1, n), jnp.float32))
    return model, v


def test_made_masks_are_autoregressive():
    masks = made_masks(6, (11, 7))
    # composed connectivity input j -> output i must be strictly lower
    # triangular (output i sees inputs j < i only)
    conn = masks[0]
    for m in masks[1:]:
        conn = (conn @ m) > 0
        conn = conn.astype(np.float32)
    for i in range(6):
        for j in range(6):
            assert bool(conn[j, i]) == (j < i), (i, j)


@pytest.mark.parametrize("conv", [False, True])
@pytest.mark.parametrize("complex_params", [False, True])
@pytest.mark.parametrize("sz_zero", [False, True])
def test_conditional_i_ignores_future_sites(complex_params, sz_zero, conv):
    model, v = make_model(complex_params, sz_zero, conv=conv)
    key = jax.random.key(2)
    s = (2.0 * jax.random.bernoulli(key, 0.5, (5, N)) - 1.0).astype(
        jnp.float32)
    lp_up, lp_dn = model.apply(v, s, method="conditional_log_probs")
    for i in [0, 3, N - 1]:
        s_pert = s.at[:, i:].multiply(-1.0)  # flip site i and everything after
        lp_up2, lp_dn2 = model.apply(v, s_pert,
                                     method="conditional_log_probs")
        np.testing.assert_allclose(lp_up[:, i], lp_up2[:, i], atol=1e-6)
        np.testing.assert_allclose(lp_dn[:, i], lp_dn2[:, i], atol=1e-6)


@pytest.mark.parametrize("conv", [False, True])
@pytest.mark.parametrize("complex_params", [False, True])
def test_exact_normalization_free(complex_params, conv):
    model, v = make_model(complex_params, conv=conv)
    s = all_configs(N)
    lp = model.apply(v, s)
    z = float(jnp.exp(2.0 * lp.re).sum())
    np.testing.assert_allclose(z, 1.0, rtol=1e-5)


@pytest.mark.parametrize("conv", [False, True])
def test_exact_normalization_sz0_sector(conv):
    model, v = make_model(sz_zero=True, conv=conv)
    s = all_configs(N)
    lp = model.apply(v, s)
    p = np.asarray(jnp.exp(2.0 * lp.re))
    in_sector = np.asarray(s.sum(-1)) == 0
    np.testing.assert_allclose(p[in_sector].sum(), 1.0, rtol=1e-5)
    # out-of-sector amplitudes underflow to zero
    assert p[~in_sector].max() < 1e-30


def test_conv_trunk_masks_are_causal():
    from qmcnn_tpu.models.arnn import causal_conv_mask
    a = causal_conv_mask(3, include_center=False)
    b = causal_conv_mask(3, include_center=True)
    assert a.sum() == 4 and b.sum() == 5
    assert a[1, 1] == 0 and b[1, 1] == 1
    assert a[2].sum() == 0 and a[1, 2] == 0  # nothing below / right


def test_conv_trunk_direct_sampler_exact():
    """Ancestral samples from the PixelCNN trunk match enumerated
    |psi|^2 (chi-square)."""
    model, v = make_model(sz_zero=False, conv=True)
    s_all = all_configs(N)
    p = np.asarray(jnp.exp(2.0 * model.apply(v, s_all).re))
    p = p / p.sum()
    m = 8192
    _, counts = _sampled_counts(model, v, False, m)
    keep = p > 5.0 / m
    chi2 = float((((counts - m * p) ** 2 / np.maximum(m * p, 1e-12))[keep]
                  ).sum())
    dof = int(keep.sum()) - 1
    assert chi2 < dof + 5.0 * np.sqrt(2.0 * dof), (chi2, dof)


def _sampled_counts(model, v, sz_zero, m=4096):
    sampler = DirectSampler(
        lambda params, s: model.apply(params, s),
        conditional_fn(model), n_sites=N, sz_zero=sz_zero)
    state = sampler.init_state(v, jax.random.key(3), m)
    ids = jnp.arange(m)
    state = jax.jit(lambda st: sampler.sample(v, st, jax.random.key(4), ids)
                    )(state)
    s = np.asarray(state.s)
    # config index by binary encoding
    idx = ((s > 0).astype(np.int64) * (2 ** np.arange(N)[::-1])).sum(-1)
    return s, np.bincount(idx, minlength=2 ** N)


@pytest.mark.parametrize("sz_zero", [False, True])
def test_direct_sampler_matches_exact_distribution(sz_zero):
    model, v = make_model(sz_zero=sz_zero)
    s_all = all_configs(N)
    p = np.asarray(jnp.exp(2.0 * model.apply(v, s_all).re))
    p = p / p.sum()
    m = 8192
    s, counts = _sampled_counts(model, v, sz_zero, m)
    if sz_zero:
        assert np.all(s.sum(-1) == 0), "left the S^z=0 sector"
    # chi-square over states with non-negligible probability
    keep = p > 5.0 / m
    chi2 = float((((counts - m * p) ** 2 / np.maximum(m * p, 1e-12))[keep]
                  ).sum())
    dof = int(keep.sum()) - 1
    # 5-sigma-ish band for chi-square with dof
    assert chi2 < dof + 5.0 * np.sqrt(2.0 * dof), (chi2, dof)


def test_sampler_log_psi_consistent():
    model, v = make_model(complex_params=True)
    sampler = DirectSampler(lambda params, s: model.apply(params, s),
                            conditional_fn(model), n_sites=N)
    state = sampler.init_state(v, jax.random.key(5), 64)
    state = sampler.sample(v, state, jax.random.key(6), jnp.arange(64))
    lp = model.apply(v, state.s)
    np.testing.assert_allclose(np.asarray(state.log_psi.re),
                               np.asarray(lp.re), atol=1e-6)
    assert float(DirectSampler.acceptance_rate(state)) == 1.0


def _tfim_cfg(n_steps=300):
    return from_yaml(f"""
name: arnn_tfim_test
lattice: {{shape: [10]}}
model: {{kind: arnn, channels: [32, 32], activation: selu}}
hamiltonian: {{kind: tfim, h: 1.0}}
sampler: {{n_walkers: 512, n_therm_sweeps: 0}}
optimizer: {{kind: adam, lr: 0.01, schedule: cosine}}
run: {{n_steps: {n_steps}, seed: 0, steps_per_dispatch: 10}}
""")


def test_builder_wires_direct_sampler():
    cfg = _tfim_cfg()
    vmc, params, lattice = build(cfg)
    assert isinstance(vmc.sampler, DirectSampler)
    assert not vmc.sampler.sz_zero  # tfim: free sector
    # heisenberg auto-resolves to sz0
    cfg2 = from_yaml("""
lattice: {shape: [8]}
model: {kind: arnn}
hamiltonian: {kind: heisenberg}
""")
    vmc2, _, _ = build(cfg2)
    assert vmc2.sampler.sz_zero


def test_builder_rejects_direct_for_non_arnn():
    cfg = from_yaml("""
model: {kind: cnn}
sampler: {kind: direct}
""")
    with pytest.raises(ValueError, match="autoregressive"):
        build(cfg)


def test_builder_rejects_symmetrized_arnn():
    cfg = from_yaml("""
model: {kind: arnn, spin_flip_sector: 1}
""")
    with pytest.raises(ValueError, match="normalized"):
        build(cfg)


@pytest.mark.slow
def test_arnn_tfim_trains_to_ed():
    cfg = _tfim_cfg()
    vmc, params, lattice = build(cfg)
    state = vmc.init_state(jax.random.key(0), cfg.sampler.n_walkers, params)
    ids = jnp.arange(cfg.sampler.n_walkers)
    run = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, 50))
    energies = []
    for chunk in range(6):
        state, metrics = run(state, jax.random.key(100 + chunk))
        energies.append(np.asarray(metrics.energy_re))
    e_ed = exact.ground_energy(
        exact.sparse_tfim(10, lattice.nn_bonds, j=1.0, h=1.0))
    e_tail = float(np.concatenate(energies[-2:]).mean())
    rel = abs(e_tail - e_ed) / abs(e_ed)
    assert rel < 2e-2, (e_tail, e_ed, rel)
