"""Phase priors (models/phase.py): 3-coloring, phase purity, the
closed-form 120-degree energy, and exact equivalence with the mel-folded
Marshall rule.

Oracles are all exact: proper-coloring checks are combinatorial, the
uniform-state energies are closed-form (+n_bonds/4 polarized saddle vs
-n_bonds/8 for the 120-degree coherent state), and the Marshall cross-check
compares full-enumeration Rayleigh quotients of the SAME network under the
two mathematically equivalent formulations.
"""
import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.builder import build, build_model
from qmcnn_tpu.configs import from_yaml
from qmcnn_tpu.lattice import Lattice, chain, kagome, square, triangular
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
from qmcnn_tpu.models.phase import PhaseBias, phase_half_angles
from qmcnn_tpu.ops import exact
from qmcnn_tpu.ops.hamiltonians import Heisenberg

from .test_gradient import rayleigh


# ---------------------------------------------------------------- coloring
def test_three_coloring_triangular_proper():
    for shape in ((3, 3), (6, 3), (6, 6)):
        lat = Lattice(shape, geometry="triangular")
        c = lat.three_coloring
        assert set(np.unique(c)) <= {0, 1, 2}
        i, j = lat.nn_bonds[:, 0], lat.nn_bonds[:, 1]
        assert np.all(c[i] != c[j])


def test_three_coloring_triangular_needs_mod3_torus():
    with pytest.raises(ValueError, match="divisible by 3"):
        triangular(4).three_coloring


def test_three_coloring_kagome_is_basis_q0():
    lat = kagome(2, 2)
    c = lat.three_coloring
    np.testing.assert_array_equal(c, lat.coords[:, -1] % 3)
    i, j = lat.nn_bonds[:, 0], lat.nn_bonds[:, 1]
    assert np.all(c[i] != c[j])


def test_three_coloring_rejected_on_bipartite():
    with pytest.raises(ValueError, match="sublattice_mask"):
        square(4).three_coloring
    with pytest.raises(ValueError, match="bipartite"):
        phase_half_angles("marshall", triangular(3))


# ---------------------------------------------------------- phase purity
def _cnn_logpsi(lat, key, phase_bias=None):
    inner = LogPsiCNN(lattice_shape=tuple(lat.shape), channels=(4,),
                      complex_params=True, param_scale=0.1)
    s0 = jnp.ones((1, lat.n_sites), jnp.float32)
    v = inner.init(key, s0)
    if phase_bias:
        wrapped = PhaseBias(inner=inner,
                            half_angles=phase_half_angles(phase_bias, lat))
        # graft the SAME inner params under the wrapper's 'inner' scope so
        # biased-vs-plain comparisons see an identical chi
        v = {"params": {"inner": v["params"]}}
        return (lambda p, s: log_psi_apply(wrapped, p, s)), v
    return (lambda p, s: log_psi_apply(inner, p, s)), v


def test_phase_bias_is_a_pure_phase():
    lat = triangular(3)
    key = jax.random.key(0)
    fn_plain, v = _cnn_logpsi(lat, key)
    fn_bias, v2 = _cnn_logpsi(lat, key, "sublattice_120")
    configs = jnp.asarray(exact.all_configs(lat.n_sites)[:37], jnp.float32)
    lp0, lp1 = fn_plain(v, configs), fn_bias(v2, configs)
    # same params (same init key/shapes), identical |psi|
    np.testing.assert_allclose(np.asarray(lp0.re), np.asarray(lp1.re),
                               rtol=1e-6)
    half = np.asarray(phase_half_angles("sublattice_120", lat))
    phi = np.asarray(configs) @ half
    np.testing.assert_allclose(np.asarray(lp1.im - lp0.im), phi, atol=1e-5)


# ------------------------------------------------- closed-form 120 energy
class _Uniform(nn.Module):
    @nn.compact
    def __call__(self, s):
        return jnp.zeros((s.shape[0],), jnp.float32)


@pytest.mark.parametrize("lat", [triangular(3), kagome(2, 2)],
                         ids=["tri3x3", "kagome2x2"])
def test_uniform_state_energy_closed_form(lat):
    """chi == 1: plain gives the polarized saddle +n_bonds/4; the
    120-degree prior gives cos(120deg)/4 = -1/8 per NN bond, exactly."""
    ham = Heisenberg(lat, marshall=False)
    configs = jnp.asarray(exact.all_configs(lat.n_sites), jnp.float32)
    n_bonds = len(lat.nn_bonds)

    plain = _Uniform()
    v = plain.init(jax.random.key(0), configs[:1])
    e_plain = rayleigh(lambda p, s: log_psi_apply(plain, p, s), v, ham,
                       configs)
    np.testing.assert_allclose(e_plain, n_bonds / 4.0, rtol=1e-6)

    biased = PhaseBias(inner=_Uniform(),
                       half_angles=phase_half_angles("sublattice_120", lat))
    vb = biased.init(jax.random.key(0), configs[:1])
    e_bias = rayleigh(lambda p, s: log_psi_apply(biased, p, s), vb, ham,
                      configs)
    np.testing.assert_allclose(e_bias, -n_bonds / 8.0, rtol=1e-6)


# ------------------------------------------------- Marshall equivalence
def test_marshall_phase_equals_mel_marshall():
    """<chi| D H D |chi> (mel-folded rule) == <D chi| H |D chi> (phase
    prior) for the same random network chi, by full enumeration."""
    lat = chain(8)
    key = jax.random.key(3)
    fn_chi, v = _cnn_logpsi(lat, key)
    fn_psi, v2 = _cnn_logpsi(lat, key, "marshall")
    configs = jnp.asarray(exact.all_configs(lat.n_sites), jnp.float32)
    e_mel = rayleigh(fn_chi, v, Heisenberg(lat, marshall=True), configs)
    e_phase = rayleigh(fn_psi, v2, Heisenberg(lat, marshall=False), configs)
    np.testing.assert_allclose(e_mel, e_phase, rtol=1e-6)


# ------------------------------------------------------------- builder
def _tri_cfg(extra_model=""):
    return from_yaml(f"""
name: tri_phase_test
lattice: {{shape: [3, 3], geometry: triangular}}
model: {{kind: cnn, channels: [4], complex_params: true,
        param_scale: 0.05{extra_model}}}
hamiltonian: {{kind: heisenberg, marshall: false}}
sampler: {{n_walkers: 64, move: flip, n_therm_sweeps: 5}}
optimizer: {{kind: sgd, lr: 0.05}}
run: {{n_steps: 10, seed: 0}}
""")


def test_builder_wires_phase_bias():
    cfg = _tri_cfg(", phase_bias: sublattice_120")
    vmc, params, lattice = build(cfg)
    cfg0 = _tri_cfg()
    vmc0, params0, _ = build(cfg0)
    # same chi for both sides: graft the plain params under the wrapper
    params = jax.tree_util.tree_map(lambda x: x, params)
    params = {"params": {"inner": params0["params"]}}
    configs = jnp.asarray(exact.all_configs(lattice.n_sites)[:9], jnp.float32)
    lp = vmc.log_psi_fn(params, configs)
    lp0 = vmc0.log_psi_fn(params0, configs)
    np.testing.assert_allclose(np.asarray(lp.re), np.asarray(lp0.re),
                               rtol=1e-6)
    half = np.asarray(phase_half_angles("sublattice_120", lattice))
    np.testing.assert_allclose(np.asarray(lp.im - lp0.im),
                               np.asarray(configs) @ half, atol=1e-5)


def test_arnn_phase_bias_is_pure_phase_and_stays_normalized():
    """The ARNN bakes the prior into its own phase output (the generic
    wrapper cannot forward the exact-sampling contract): |psi| and the
    2^N normalization are untouched, im shifts by exactly phi(s)."""
    cfg = _tri_cfg(", phase_bias: sublattice_120")
    base_cfg = _tri_cfg()
    # arnn_sector none: 9 sites are odd, so the sz0 auto-sector (which
    # needs even N) must be off — the prior itself is sector-agnostic
    mk = lambda c: dataclasses.replace(c, model=dataclasses.replace(
        c.model, kind="arnn", arnn_conv_kernel=0, channels=[16],
        arnn_sector="none"))
    lat = triangular(3)
    m_b = build_model(mk(cfg), lat)
    m_0 = build_model(mk(base_cfg), lat)
    import jax as _jax

    s0 = jnp.ones((1, lat.n_sites), jnp.float32)
    v = m_0.init(_jax.random.key(0), s0)   # same trunk params for both
    configs = jnp.asarray(exact.all_configs(lat.n_sites), jnp.float32)
    lp0 = log_psi_apply(m_0, v, configs)
    lp1 = log_psi_apply(m_b, v, configs)
    np.testing.assert_allclose(np.asarray(lp1.re), np.asarray(lp0.re),
                               rtol=1e-6)
    half = np.asarray(phase_half_angles("sublattice_120", lat))
    np.testing.assert_allclose(np.asarray(lp1.im - lp0.im),
                               np.asarray(configs) @ half, atol=1e-5)
    # exact normalization is untouched: sum |psi|^2 == 1
    total = np.exp(2.0 * np.asarray(lp1.re, np.float64)).sum()
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)


# -------------------------------------------------------- integration
@pytest.mark.slow
def test_tri_train_with_120_prior_beats_saddle_immediately():
    """The polarized saddle (+n_bonds/4, zero variance) that stalls
    small-init training on frustrated lattices (configs/tri6x6_heis.yaml
    notes) is gone: with the prior, the SMALL-init state already starts
    near -n_bonds/8 and descends from step 1."""
    cfg = from_yaml("""
name: tri_phase_train
lattice: {shape: [3, 3], geometry: triangular}
model: {kind: cnn, channels: [8, 8], complex_params: true,
        param_scale: 0.02, phase_bias: sublattice_120}
hamiltonian: {kind: heisenberg, marshall: false}
sampler: {n_walkers: 256, move: flip, n_therm_sweeps: 20}
optimizer: {kind: sgd, lr: 0.05, schedule: cosine}
sr: {enabled: true, solver: minsr, diag_shift0: 0.1,
     diag_shift_decay: 0.97, diag_shift_min: 0.01}
run: {n_steps: 200, seed: 0}
""")
    vmc, params, lattice = build(cfg)
    e_ed = exact.ground_energy(
        exact.sparse_heisenberg(lattice.n_sites, lattice.nn_bonds))
    n_bonds = len(lattice.nn_bonds)
    state = vmc.init_state(jax.random.key(0), cfg.sampler.n_walkers, params)
    ids = jnp.arange(cfg.sampler.n_walkers)
    state = vmc.thermalize(state, jax.random.key(1), ids, 20)
    run = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, 50))
    energies = []
    for chunk in range(4):
        state, metrics = run(state, jax.random.key(100 + chunk))
        energies.append(np.asarray(metrics.energy_re))
    first = float(energies[0][0])
    # step-1 energy already below the -n_bonds/8 ballpark, nowhere near
    # the +n_bonds/4 saddle
    assert first < -0.5 * (n_bonds / 8.0), first
    e_tail = float(np.concatenate(energies[-2:]).mean())
    rel = abs(e_tail - e_ed) / abs(e_ed)
    assert rel < 5e-2, (e_tail, e_ed, rel)


# ------------------------------------------------- sqrt(3) x sqrt(3) kagome
def test_sqrt3_coloring_proper_and_cell_dependent():
    lat = kagome(3, 3)
    c = lat.three_coloring_sqrt3
    i, j = lat.nn_bonds[:, 0], lat.nn_bonds[:, 1]
    assert np.all(c[i] != c[j])
    # q=0 is basis-only; sqrt3 must vary across cells at fixed basis
    q0 = lat.three_coloring
    assert np.all(q0[i] != q0[j])
    basis0 = lat.coords[:, 2] == 0
    assert len(np.unique(c[basis0])) == 3        # cell-dependent
    assert len(np.unique(q0[basis0])) == 1       # q=0 is not


def test_sqrt3_coloring_guards():
    with pytest.raises(ValueError, match="divisible by 3"):
        kagome(2, 3).three_coloring_sqrt3
    with pytest.raises(ValueError, match="kagome-only"):
        triangular(3).three_coloring_sqrt3
    # open boundaries lift the torus-closure requirement
    c = kagome(2, 2, pbc=False).three_coloring_sqrt3
    lat = kagome(2, 2, pbc=False)
    i, j = lat.nn_bonds[:, 0], lat.nn_bonds[:, 1]
    assert np.all(c[i] != c[j])


def test_uniform_state_energy_closed_form_sqrt3():
    """Any proper 3-coloring prior turns the polarized saddle into
    cos(120deg)/4 = -1/8 per NN bond — exact for sqrt3 too (open-boundary
    12-site kagome keeps the enumeration small)."""
    lat = kagome(2, 2, pbc=False)
    ham = Heisenberg(lat, marshall=False)
    configs = jnp.asarray(exact.all_configs(lat.n_sites), jnp.float32)
    n_bonds = len(lat.nn_bonds)
    biased = PhaseBias(inner=_Uniform(),
                       half_angles=phase_half_angles("sublattice_sqrt3",
                                                     lat))
    vb = biased.init(jax.random.key(0), configs[:1])
    e_bias = rayleigh(lambda p, s: log_psi_apply(biased, p, s), vb, ham,
                      configs)
    np.testing.assert_allclose(e_bias, -n_bonds / 8.0, rtol=1e-6)
