"""Ansatz unit tests (SURVEY.md section 4): translation invariance,
complex-conv correctness vs a numpy complex reference, translation-averaging
projection, and gradient sanity via finite differences."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.models.cnn import (
    ComplexConv, LogPsiCNN, TranslationAveraged, log_psi_apply,
)
from qmcnn_tpu.ops.cplx import C


def rand_spins(key, batch, n):
    return (2.0 * jax.random.bernoulli(key, 0.5, (batch, n)) - 1.0).astype(
        jnp.float32
    )


def test_complex_conv_matches_direct_complex():
    """Karatsuba real-conv decomposition == direct complex conv (numpy)."""
    kr, ki = jax.random.split(jax.random.key(0))
    zr = jax.random.normal(kr, (2, 6, 6, 3))
    zi = jax.random.normal(ki, (2, 6, 6, 3))
    z = C(zr, zi)
    conv = ComplexConv(features=4, kernel_size=(3, 3), lattice_shape=(6, 6))
    v = conv.init(jax.random.key(2), z)
    got = conv.apply(v, z).to_numpy()
    w = (np.asarray(v["params"]["kernel_re"], np.complex128)
         + 1j * np.asarray(v["params"]["kernel_im"], np.complex128))
    znp = np.asarray(zr, np.complex128) + 1j * np.asarray(zi, np.complex128)
    zp = np.pad(znp, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")
    want = np.zeros((2, 6, 6, 4), np.complex128)
    for dx in range(3):
        for dy in range(3):
            want += np.einsum("bxyc,cf->bxyf",
                              zp[:, dx:dx + 6, dy:dy + 6, :], w[dx, dy])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("complex_params", [False, True])
@pytest.mark.parametrize("shape", [(8,), (4, 4)])
def test_translation_invariance(shape, complex_params):
    n = int(np.prod(shape))
    model = LogPsiCNN(lattice_shape=shape, channels=(4, 4),
                      complex_params=complex_params)
    s = rand_spins(jax.random.key(0), 3, n)
    v = model.init(jax.random.key(1), s)
    base = log_psi_apply(model, v, s).to_numpy()
    grid = np.asarray(s).reshape(3, *shape)
    for shift in [(1,) * len(shape), (2,) + (0,) * (len(shape) - 1)]:
        rolled = np.roll(grid, shift, axis=tuple(range(1, 1 + len(shape))))
        out = log_psi_apply(model, v, jnp.asarray(rolled.reshape(3, n)))
        np.testing.assert_allclose(out.to_numpy(), base, rtol=1e-4, atol=1e-5)


def test_even_kernel_and_kernel_clipping():
    """kernel_size > L must clip to L and stay translation invariant."""
    model = LogPsiCNN(lattice_shape=(4,), channels=(3,), kernel_size=7)
    s = rand_spins(jax.random.key(0), 2, 4)
    v = model.init(jax.random.key(1), s)
    base = log_psi_apply(model, v, s).to_numpy()
    rolled = jnp.roll(s.reshape(2, 4), 1, axis=1)
    out = log_psi_apply(model, v, rolled).to_numpy()
    np.testing.assert_allclose(out, base, rtol=1e-4, atol=1e-5)


def test_translation_averaging_noop_on_invariant_net():
    """Explicit averaging == bare net when the net is already invariant."""
    shape = (4, 4)
    inner = LogPsiCNN(lattice_shape=shape, channels=(4,), complex_params=True)
    model = TranslationAveraged(inner=inner, lattice_shape=shape)
    s = rand_spins(jax.random.key(0), 5, 16)
    v = model.init(jax.random.key(1), s)
    got = model.apply(v, s).to_numpy()
    want = inner.apply({"params": v["params"]["inner"]}, s).to_numpy()
    np.testing.assert_allclose(np.exp(got), np.exp(want), rtol=1e-3)


def test_translation_averaging_projects():
    """For a NON-invariant net, averaged psi is translation invariant."""

    class Biased(nn.Module):
        @nn.compact
        def __call__(self, s):
            w = self.param("w", nn.initializers.normal(1.0), (s.shape[-1],))
            return C((s * w).sum(-1), 0.1 * (s * w ** 2).sum(-1))

    model = TranslationAveraged(inner=Biased(), lattice_shape=(8,))
    s = rand_spins(jax.random.key(0), 4, 8)
    v = model.init(jax.random.key(1), s)
    base = model.apply(v, s).to_numpy()
    out = model.apply(v, jnp.roll(s.reshape(4, 8), 3, axis=1)).to_numpy()
    np.testing.assert_allclose(np.exp(out), np.exp(base), rtol=1e-4)


def test_grad_finite_difference_real():
    """d logpsi/d theta matches central finite differences (real net)."""
    model = LogPsiCNN(lattice_shape=(6,), channels=(3,))
    s = rand_spins(jax.random.key(0), 1, 6)
    v = model.init(jax.random.key(1), s)

    def f(params):
        return model.apply({"params": params}, s).re[0]

    g = jax.grad(f)(v["params"])
    leaf = v["params"]["RealConv_0"]["kernel"]
    eps, idx = 1e-3, (0, 0, 1)

    def perturb(h):
        p = dict(v["params"])
        p["RealConv_0"] = dict(p["RealConv_0"])
        p["RealConv_0"]["kernel"] = leaf.at[idx].add(h)
        return f(p)

    fd = (perturb(eps) - perturb(-eps)) / (2 * eps)
    np.testing.assert_allclose(g["RealConv_0"]["kernel"][idx], fd, rtol=2e-2)


def test_grad_finite_difference_complex_pairs():
    """Both re/im weight leaves get correct gradients (complex net)."""
    model = LogPsiCNN(lattice_shape=(6,), channels=(3,), complex_params=True)
    s = rand_spins(jax.random.key(0), 1, 6)
    v = model.init(jax.random.key(1), s)

    def f(params):
        out = model.apply({"params": params}, s)
        return out.re[0] + 0.5 * out.im[0]

    g = jax.grad(f)(v["params"])
    eps, idx = 1e-3, (0, 0, 1)
    for leaf_name in ["kernel_re", "kernel_im"]:
        leaf = v["params"]["ComplexConv_0"][leaf_name]

        def perturb(h):
            p = jax.tree_util.tree_map(lambda y: y, v["params"])
            p["ComplexConv_0"][leaf_name] = leaf.at[idx].add(h)
            return f(p)

        fd = (perturb(eps) - perturb(-eps)) / (2 * eps)
        np.testing.assert_allclose(g["ComplexConv_0"][leaf_name][idx], fd,
                                   rtol=3e-2, atol=1e-5)


def test_output_shapes_and_dtypes():
    for complex_params in [False, True]:
        model = LogPsiCNN(lattice_shape=(4, 4), channels=(4, 4),
                          complex_params=complex_params)
        s = rand_spins(jax.random.key(0), 7, 16)
        v = model.init(jax.random.key(1), s)
        out = log_psi_apply(model, v, s)
        assert isinstance(out, C)
        assert out.re.shape == (7,) and out.im.shape == (7,)
        assert out.re.dtype == jnp.float32


@pytest.mark.parametrize("shape,ksz", [((8,), 3), ((4, 4), 3), ((6, 4), (3, 3)), ((10,), 5)])
@pytest.mark.parametrize("complex_params", [False, True])
def test_conv_impls_agree(shape, ksz, complex_params):
    """'roll' and 'circulant' matmul paths == 'direct' lax.conv, for values
    AND gradients (they are the TPU hot path; 'direct' is the reference)."""
    n = int(np.prod(shape))
    s = rand_spins(jax.random.key(0), 4, n)
    base = LogPsiCNN(lattice_shape=shape, channels=(3, 4), kernel_size=ksz,
                     complex_params=complex_params, conv_impl="direct")
    v = base.init(jax.random.key(1), s)

    def loss(model, params):
        out = model.apply(params, s)
        return (out.re.sum() + 0.3 * out.im.sum())

    want_out = base.apply(v, s)
    want_grad = jax.grad(lambda p: loss(base, p))(v)
    for impl in ["roll", "circulant"]:
        model = LogPsiCNN(lattice_shape=shape, channels=(3, 4),
                          kernel_size=ksz, complex_params=complex_params,
                          conv_impl=impl)
        got_out = model.apply(v, s)
        np.testing.assert_allclose(np.asarray(got_out.re),
                                   np.asarray(want_out.re), rtol=2e-4,
                                   atol=1e-5, err_msg=impl)
        np.testing.assert_allclose(np.asarray(got_out.im),
                                   np.asarray(want_out.im), rtol=2e-4,
                                   atol=1e-5, err_msg=impl)
        got_grad = jax.grad(lambda p: loss(model, p))(v)
        jax.tree_util.tree_map(
            lambda ga, gb: np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), rtol=5e-4, atol=2e-5,
                err_msg=impl),
            got_grad, want_grad,
        )


def test_open_boundary_model():
    """pbc=False: zero padding — boundary sites see fewer neighbors, so
    translation invariance must NOT hold, and an OBC TFIM trains sanely."""
    model = LogPsiCNN(lattice_shape=(6,), channels=(4,), pbc=False)
    s = rand_spins(jax.random.key(0), 4, 6)
    v = model.init(jax.random.key(1), s)
    base = model.apply(v, s)
    rolled = model.apply(v, jnp.roll(s.reshape(4, 6), 1, axis=1))
    assert not np.allclose(np.asarray(base.re), np.asarray(rolled.re),
                           rtol=1e-4)
    # end-to-end energy sanity on an open chain
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import build
    from qmcnn_tpu.ops import exact
    from qmcnn_tpu.lattice import chain as mkchain

    cfg = cfglib.from_yaml("""
lattice: {shape: [6], pbc: false}
model: {channels: [4]}
hamiltonian: {kind: tfim, h: 1.0}
sampler: {n_walkers: 32, move: flip, n_therm_sweeps: 2}
""")
    vmc, params, lattice = build(cfg)
    assert len(lattice.nn_bonds) == 5  # open chain
    state = vmc.init_state(jax.random.key(0), 32, params)
    state, m = jax.jit(vmc.step)(state, jax.random.key(1), jnp.arange(32))
    assert np.isfinite(float(m.energy_re))


def test_bf16_compute_close_to_f32():
    """bf16 end-to-end stack (cast at input, bf16 activations, f32
    readout accumulation): log psi within bf16 tolerance of the f32
    forward, same params."""
    model32 = LogPsiCNN(lattice_shape=(4, 4), channels=(8, 8))
    model16 = LogPsiCNN(lattice_shape=(4, 4), channels=(8, 8),
                        compute_dtype="bfloat16")
    s = rand_spins(jax.random.key(0), 16, 16)
    v = model32.init(jax.random.key(1), s)
    a = model32.apply(v, s)
    b = model16.apply(v, s)
    assert b.re.dtype == jnp.float32  # outputs stay f32
    np.testing.assert_allclose(np.asarray(b.re), np.asarray(a.re),
                               rtol=2e-2, atol=5e-2)


def test_bf16_complex_residual_close_to_f32():
    """End-to-end bf16 through the complex Karatsuba convs + residual
    skips (the hero-stack shapes): both log psi parts track f32, params
    stay f32 (optimizer-visible precision untouched)."""
    kw = dict(lattice_shape=(4, 4), channels=(6, 6, 6),
              complex_params=True, residual=True, init_mode="fan_in",
              activation="selu", param_scale=1.0)
    model32 = LogPsiCNN(**kw)
    model16 = LogPsiCNN(**kw, compute_dtype="bfloat16")
    s = rand_spins(jax.random.key(2), 16, 16)
    v = model32.init(jax.random.key(3), s)
    for leaf in jax.tree_util.tree_leaves(v):
        assert leaf.dtype == jnp.float32
    a = model32.apply(v, s)
    b = model16.apply(v, s)
    assert b.re.dtype == jnp.float32 and b.im.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(b.re), np.asarray(a.re),
                               rtol=2e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(b.im), np.asarray(a.im),
                               rtol=2e-2, atol=7e-2)


def test_bf16_cnn_excluded_from_pallas_backend():
    """The fused Pallas sweep computes an f32 forward; a bf16 XLA stack
    would take different accept decisions — auto must pick xla."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import resolve_sampler_backend

    base = dict(lattice=cfglib.LatticeConfig(shape=(4, 4)),
                hamiltonian=cfglib.HamiltonianConfig(kind="tfim"),
                sampler=cfglib.SamplerConfig(move="flip", backend="pallas"))
    cfg16 = cfglib.Config(model=cfglib.ModelConfig(
        channels=(4,), compute_dtype="bfloat16"), **base)
    with np.testing.assert_raises(ValueError):
        resolve_sampler_backend(cfg16)
    cfg32 = cfglib.Config(model=cfglib.ModelConfig(channels=(4,)), **base)
    assert resolve_sampler_backend(cfg32) == "pallas"


def test_point_group_averaging():
    """C4v projection: averaged psi invariant under rotations/reflections
    of the configuration (which the bare CNN is NOT)."""
    from qmcnn_tpu.models.cnn import PointGroupAveraged

    shape = (4, 4)
    inner = LogPsiCNN(lattice_shape=shape, channels=(4,), param_scale=0.4,
                      complex_params=True)
    model = PointGroupAveraged(inner=inner, lattice_shape=shape)
    s = rand_spins(jax.random.key(0), 5, 16)
    v = model.init(jax.random.key(1), s)
    base = model.apply(v, s).to_numpy()
    grid = np.asarray(s).reshape(5, 4, 4)
    for tf in [np.rot90(grid, 1, (1, 2)), grid[:, :, ::-1],
               np.rot90(grid, 3, (1, 2))[:, ::-1, :]]:
        out = model.apply(v, jnp.asarray(tf.reshape(5, 16).copy())).to_numpy()
        np.testing.assert_allclose(np.exp(out), np.exp(base), rtol=2e-4)
    # bare net is NOT rotation invariant (sanity that the test is nontrivial)
    b0 = inner.apply({"params": v["params"]["inner"]}, s)
    b1 = inner.apply({"params": v["params"]["inner"]},
                     jnp.asarray(np.rot90(grid, 1, (1, 2)).reshape(5, 16).copy()))
    assert not np.allclose(np.asarray(b0.re), np.asarray(b1.re), rtol=1e-4)


def test_deep_fan_in_selu_init_healthy():
    """Deep stacks need init_mode='fan_in' + activation='selu': measured
    (BASELINE.md r1), a 6-layer lncosh GCNN has NO workable fixed init std
    (collapse at <=1.0, NaN at >=1.5). This guards the working recipe: at
    init the log-amplitude spread must be sane (not collapsed to ~0, not
    e^{+-10} rough) for both deep model families."""
    import jax
    import jax.numpy as jnp
    from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply
    from qmcnn_tpu.models.gcnn import LogPsiGCNN

    key = jax.random.key(0)
    s = (2.0 * jax.random.bernoulli(key, 0.5, (64, 16)) - 1.0).astype(
        jnp.float32)

    for model in (
        LogPsiGCNN(lattice_shape=(4, 4), channels=(8,) * 6,
                   complex_params=True, param_scale=1.0,
                   init_mode="fan_in", activation="selu"),
        LogPsiCNN(lattice_shape=(4, 4), channels=(8,) * 6,
                  complex_params=True, param_scale=1.0,
                  init_mode="fan_in", activation="selu"),
        LogPsiGCNN(lattice_shape=(4, 4), channels=(8,) * 6,
                   complex_params=True, param_scale=1.0,
                   init_mode="fan_in", activation="selu", residual=True),
        LogPsiCNN(lattice_shape=(4, 4), channels=(8,) * 6,
                  complex_params=True, param_scale=1.0,
                  init_mode="fan_in", activation="selu", residual=True),
    ):
        params = model.init(jax.random.key(1), s[:1])
        out = log_psi_apply(model, params, s)
        spread = float(jnp.std(out.re))
        assert jnp.all(jnp.isfinite(out.re)) and jnp.all(
            jnp.isfinite(out.im)), type(model).__name__
        assert 1e-3 < spread < 3.0, (
            f"{type(model).__name__}: init log-psi spread {spread} outside "
            "the trainable window")


def test_momentum_sector_projection():
    """psi_k(T_b s) = e^{-i k.b} psi_k(s): translating the input shifts
    the projected phase by exactly -k.b and leaves |psi_k| unchanged.
    With k = 0 the projection reduces to the plain zero-momentum average
    (phase-free), which for the spatial-sum CNN is the identity."""
    import itertools as it

    import jax
    import jax.numpy as jnp
    from qmcnn_tpu.models.cnn import LogPsiCNN, TranslationAveraged

    L = (4, 4)
    mom = (1, 2)
    # a NON-invariant inner model (otherwise every k != 0 projects to 0):
    # break translation invariance by reading out only half the lattice.

    import flax.linen as nn
    from qmcnn_tpu.ops import cplx as cx

    class HalfReadout(nn.Module):
        @nn.compact
        def __call__(self, s):
            w = self.param("w", nn.initializers.normal(0.3), (s.shape[-1],))
            v = self.param("v", nn.initializers.normal(0.3), (s.shape[-1],))
            return cx.C(jnp.tanh(s @ w), jnp.tanh(s @ v))

    model = TranslationAveraged(inner=HalfReadout(), lattice_shape=L,
                                momentum=mom)
    key = jax.random.key(0)
    s = (2.0 * jax.random.bernoulli(key, 0.5, (3, 16)) - 1.0).astype(
        jnp.float32)
    p = model.init(jax.random.key(1), s)
    base = model.apply(p, s)

    grid = np.asarray(s).reshape(3, *L)
    for shift in [(1, 0), (0, 1), (2, 3)]:
        moved = jnp.asarray(
            np.roll(grid, shift, axis=(1, 2)).reshape(3, -1))
        out = model.apply(p, moved)
        np.testing.assert_allclose(np.asarray(out.re),
                                   np.asarray(base.re), rtol=1e-5,
                                   atol=1e-5)
        kb = sum(2.0 * np.pi * m / Ld * a
                 for m, Ld, a in zip(mom, L, shift))
        dphi = np.asarray(out.im) - np.asarray(base.im) + kb
        np.testing.assert_allclose(np.cos(dphi), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.sin(dphi), 0.0, atol=1e-4)

    # k=0 path unchanged: equals the invariant CNN's own output
    cnn = LogPsiCNN(lattice_shape=L, channels=(4,))
    wrapped = TranslationAveraged(inner=cnn, lattice_shape=L)
    pw = wrapped.init(jax.random.key(2), s)
    a = wrapped.apply(pw, s)
    b = cnn.apply({"params": pw["params"]["inner"]}, s)
    np.testing.assert_allclose(np.asarray(a.re), np.asarray(b.re),
                               rtol=1e-5, atol=1e-5)
