"""GCNN model family: exact space-group symmetry, character projection,
spin-flip projection, builder wiring, and a VMC integration smoke test.

Oracle strategy (SURVEY.md section 4 "ansatz" tier): symmetry identities
checked exactly (float32 tolerance) against grid transforms; physics checked
against dense exact diagonalization on a small frustrated lattice.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu import builder, configs
from qmcnn_tpu.models.gcnn import (LogPsiGCNN, SpinFlipSymmetrized,
                                   c4v_tables, grid_transform)
from qmcnn_tpu.ops import cplx

L = (6, 6)
N = 36


@pytest.fixture
def spins(rng):
    return jnp.asarray(rng.choice([-1.0, 1.0], size=(4, N)).astype(np.float32))


def _angle_dev(a, b):
    """Max |angle difference| mod 2pi between two phase arrays."""
    return float(np.abs(np.angle(np.exp(1j * (np.asarray(a) - np.asarray(b))))).max())


# ---------------------------------------------------------------------------
# group tables
# ---------------------------------------------------------------------------

def test_c4v_is_a_group():
    G, inv, elem_idx, tap_perm, chars, grid_ops = c4v_tables(3)
    assert G == 8
    # elem_idx[g, h] = g^-1 h: row g=identity is the identity permutation
    ident = [g for g in range(G) if np.array_equal(elem_idx[g], np.arange(G))]
    assert len(ident) == 1
    # every row/column of the "multiplication" table is a permutation
    for g in range(G):
        assert sorted(elem_idx[g]) == list(range(G))
        assert sorted(elem_idx[:, g]) == list(range(G))
    # tap permutations are permutations and identity for e
    e = ident[0]
    assert np.array_equal(tap_perm[e], np.arange(9))
    for g in range(G):
        assert sorted(tap_perm[g]) == list(range(9))
    # characters are homomorphisms onto {+-1} with the right sums (orthogonality
    # with the trivial rep: sum_g chi(g) = 0 for nontrivial irreps)
    assert chars["A1"].sum() == 8
    for name in ("A2", "B1", "B2"):
        assert chars[name].sum() == 0


def test_c4v_even_kernel_rejected():
    with pytest.raises(ValueError):
        c4v_tables(4)


# ---------------------------------------------------------------------------
# symmetry identities
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("complex_params", [False, True])
def test_full_space_group_invariance_a1(spins, complex_params):
    m = LogPsiGCNN(lattice_shape=L, channels=(4, 4), kernel_size=3,
                   complex_params=complex_params, character="A1")
    p = m.init(jax.random.key(0), spins)
    base = cplx.as_c(m.apply(p, spins))
    G, _, _, _, _, grid_ops = c4v_tables(3)
    grid = spins.reshape(4, *L)
    for g in range(G):
        r, mm = (int(v) for v in grid_ops[g])
        out = cplx.as_c(m.apply(p, grid_transform(grid, r, mm).reshape(4, -1)))
        np.testing.assert_allclose(out.re, base.re, atol=2e-5)
        assert _angle_dev(out.im, base.im) < 2e-5
    # translations (conv stack + spatial sum)
    rolled = jnp.roll(grid, (2, 3), axis=(1, 2)).reshape(4, -1)
    out = cplx.as_c(m.apply(p, rolled))
    np.testing.assert_allclose(out.re, base.re, atol=2e-5)


@pytest.mark.parametrize("character", ["A2", "B1", "B2"])
def test_character_transforms(spins, character):
    """psi(g s) = chi(g) psi(s): Re log equal, Im log shifts by pi when
    chi(g) = -1. Tolerances are loose because signed projections nearly
    cancel at random init (small |psi| amplifies relative error)."""
    m = LogPsiGCNN(lattice_shape=L, channels=(4, 4), kernel_size=3,
                   complex_params=True, character=character)
    p = m.init(jax.random.key(1), spins)
    base = cplx.as_c(m.apply(p, spins))
    G, _, _, _, chars, grid_ops = c4v_tables(3)
    grid = spins.reshape(4, *L)
    for g in range(G):
        r, mm = (int(v) for v in grid_ops[g])
        out = cplx.as_c(m.apply(p, grid_transform(grid, r, mm).reshape(4, -1)))
        shift = np.pi if chars[character][g] < 0 else 0.0
        np.testing.assert_allclose(out.re, base.re, atol=5e-3)
        assert _angle_dev(out.im, base.im + shift) < 5e-3


def test_unknown_character_rejected(spins):
    m = LogPsiGCNN(lattice_shape=L, channels=(4,), character="E")
    with pytest.raises(ValueError):
        m.init(jax.random.key(0), spins)


@pytest.mark.parametrize("sector", [1, -1])
def test_spin_flip_projection(spins, sector):
    inner = LogPsiGCNN(lattice_shape=L, channels=(4,), kernel_size=3,
                       complex_params=True)
    m = SpinFlipSymmetrized(inner=inner, sector=sector)
    p = m.init(jax.random.key(2), spins)
    # break the inner net's accidental spin-flip evenness (zero-init biases
    # + even lncosh make psi(-s) == psi(s) exactly, so the odd projection
    # would be identically zero): randomize the biases.
    p = jax.tree_util.tree_map_with_path(
        lambda path, x: (x + 0.3 * jax.random.normal(jax.random.key(7),
                                                     x.shape)
                         if "bias" in str(path) else x), p)
    a = cplx.as_c(m.apply(p, spins))
    b = cplx.as_c(m.apply(p, -spins))
    np.testing.assert_allclose(a.re, b.re, atol=1e-5)
    shift = 0.0 if sector == 1 else np.pi
    assert _angle_dev(a.im, b.im + shift) < 1e-5


@pytest.mark.slow
def test_gradients_finite(spins):
    m = LogPsiGCNN(lattice_shape=L, channels=(4, 4), complex_params=True)
    p = m.init(jax.random.key(3), spins)

    def loss(p):
        out = cplx.as_c(m.apply(p, spins))
        return out.re.sum() + out.im.sum()

    g = jax.grad(loss)(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


# ---------------------------------------------------------------------------
# builder wiring
# ---------------------------------------------------------------------------

def _gcnn_cfg(**model_kw):
    return configs.Config(
        lattice=configs.LatticeConfig(shape=(4, 4)),
        model=configs.ModelConfig(kind="gcnn", channels=(4, 4),
                                  **model_kw),
        hamiltonian=configs.HamiltonianConfig(kind="j1j2", j2=0.5),
        sampler=configs.SamplerConfig(n_walkers=16, n_therm_sweeps=2),
    )


def test_builder_gcnn(spins):
    cfg = _gcnn_cfg(complex_params=True, spin_flip_sector=1)
    lattice = builder.build_lattice(cfg)
    model = builder.build_model(cfg, lattice)
    s = spins[:, :16]
    p = model.init(jax.random.key(0), s)
    out = cplx.as_c(model.apply(p, s))
    assert out.re.shape == (4,)
    # sampler backend must not pick pallas for gcnn
    assert builder.resolve_sampler_backend(cfg) == "xla"


def test_builder_gcnn_rejects_redundant_averaging():
    cfg = _gcnn_cfg(point_group_average=True)
    with pytest.raises(ValueError, match="space-group"):
        builder.build_model(cfg, builder.build_lattice(cfg))


def test_builder_gcnn_needs_2d():
    cfg = configs.Config(
        lattice=configs.LatticeConfig(shape=(16,)),
        model=configs.ModelConfig(kind="gcnn"),
    )
    with pytest.raises(ValueError, match="2D"):
        builder.build_model(cfg, builder.build_lattice(cfg))


@pytest.mark.parametrize("kind", ["cnn", "rbm"])
def test_spin_flip_wraps_other_model_kinds(spins, kind):
    """spin_flip_sector is a model-agnostic wrapper: +1 projection makes
    psi(-s) == psi(s) for cnn and rbm ansaetze too."""
    cfg = configs.Config(
        lattice=configs.LatticeConfig(shape=(4, 4)),
        model=configs.ModelConfig(kind=kind, channels=(4,),
                                  complex_params=True, spin_flip_sector=1),
    )
    model = builder.build_model(cfg, builder.build_lattice(cfg))
    s = spins[:, :16]
    p = model.init(jax.random.key(0), s)
    a = cplx.as_c(model.apply(p, s))
    b = cplx.as_c(model.apply(p, -s))
    np.testing.assert_allclose(a.re, b.re, atol=1e-5)
    assert _angle_dev(a.im, b.im) < 1e-5
    # and the pallas fast path must be declined for the wrapped model
    assert builder.resolve_sampler_backend(cfg) == "xla"


def test_config_roundtrip_gcnn():
    cfg = _gcnn_cfg(gcnn_character="B1", spin_flip_sector=1)
    assert configs.from_yaml(configs.to_yaml(cfg)) == cfg


# ---------------------------------------------------------------------------
# physics integration: 4x4 J1-J2 vs dense ED
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_gcnn_j1j2_4x4_training_converges():
    """Frustrated 4x4 J1-J2 at J2=0.5 with the fully-symmetric complex GCNN
    + spin-parity projection, SR training, vs dense ED (the configuration the
    GCNN exists for)."""
    from qmcnn_tpu.ops import exact

    cfg = configs.Config(
        lattice=configs.LatticeConfig(shape=(4, 4)),
        # sized for CPU CI: the GCNN's G=8 channel expansion makes forwards
        # ~50x a plain CNN's, so keep M / channels / steps minimal (the
        # full-accuracy frustrated runs happen on TPU, see BASELINE.md)
        model=configs.ModelConfig(kind="gcnn", channels=(4, 4),
                                  complex_params=True, spin_flip_sector=1),
        hamiltonian=configs.HamiltonianConfig(kind="j1j2", j2=0.5),
        sampler=configs.SamplerConfig(n_walkers=128, move="exchange",
                                      n_therm_sweeps=20),
        optimizer=configs.OptimizerConfig(lr=0.05),
        # minsr: P (~5k) >> M (128); a dense P x P solve would dominate CPU
        # CI time, and minsr is the solver the GCNN hero config uses
        sr=configs.SRConfig(enabled=True, solver="minsr", diag_shift0=1.0,
                            diag_shift_decay=0.9, diag_shift_min=1e-2),
        run=configs.RunConfig(n_steps=120, seed=0),
    )
    vmc, params, lattice = builder.build(cfg)
    ids = jnp.arange(cfg.sampler.n_walkers)
    state = vmc.init_state(jax.random.key(1), cfg.sampler.n_walkers, params)
    state = vmc.thermalize(state, jax.random.key(2), ids, n_sweeps=20)
    run = jax.jit(lambda st, k: vmc.run_steps(st, k, ids, 40))
    es = []
    for blk in range(cfg.run.n_steps // 40):
        state, ms = run(state, jax.random.fold_in(jax.random.key(3), blk))
        es.extend(np.asarray(ms.energy_re).tolist())
    assert np.all(np.isfinite(es))
    e_vmc = float(np.mean(es[-40:]))
    sp = exact.sparse_heisenberg(16, lattice.nn_bonds,
                                 nnn_bonds=lattice.nnn_bonds, j2=0.5)
    e_exact = exact.ground_energy(sp)
    rel = abs(e_vmc - e_exact) / abs(e_exact)
    assert rel < 3e-2, (e_vmc, e_exact, rel)


@pytest.mark.slow
def test_residual_gcnn_symmetry_and_init_health(spins):
    """Residual skips must not break space-group invariance (identity
    commutes with the regular representation) and the depth-8 residual
    stack must stay in the trainable init window (finite, spread sane)."""
    from qmcnn_tpu.models.cnn import log_psi_apply

    m = LogPsiGCNN(lattice_shape=L, channels=(6,) * 8, kernel_size=3,
                   complex_params=True, character="A1", param_scale=1.0,
                   init_mode="fan_in", activation="selu", residual=True)
    p = m.init(jax.random.key(0), spins)
    base = cplx.as_c(m.apply(p, spins))
    G, _, _, _, _, grid_ops = c4v_tables(3)
    grid = spins.reshape(4, *L)
    for g in range(G):
        r, mm = (int(v) for v in grid_ops[g])
        out = cplx.as_c(m.apply(p, grid_transform(grid, r, mm).reshape(4, -1)))
        np.testing.assert_allclose(out.re, base.re, atol=2e-5)
        assert _angle_dev(out.im, base.im) < 2e-5

    many = (2.0 * jax.random.bernoulli(jax.random.key(3), 0.5,
                                       (64, int(np.prod(L))))
            - 1.0).astype(jnp.float32)
    out = log_psi_apply(m, p, many)
    assert jnp.all(jnp.isfinite(out.re)) and jnp.all(jnp.isfinite(out.im))
    spread = float(jnp.std(out.re))
    assert 1e-3 < spread < 3.0, spread

    # a residual layer actually contributes (kernel grads flow through it)
    def loss(params):
        o = log_psi_apply(m, params, many)
        return jnp.sum(o.re ** 2)

    grads = jax.grad(loss)(p)
    leaves = jax.tree_util.tree_flatten_with_path(grads)[0]
    mid = [np.abs(np.asarray(v)).max() for path, v in leaves
           if "GroupConv_4" in str(path)]
    assert mid and max(mid) > 0.0
