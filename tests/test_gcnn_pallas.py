"""Fused GCNN forward kernel parity (kernels/gcnn_pallas.py vs the XLA
model models/gcnn.py), in Pallas interpret mode on CPU — the same contract
as the fused sweep kernel's tests (SURVEY.md K1/K2 testing posture)."""
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu.kernels.gcnn_pallas import make_fused_log_psi
from qmcnn_tpu.models.cnn import log_psi_apply
from qmcnn_tpu.models.gcnn import LogPsiGCNN, SpinFlipSymmetrized

H = W = 4
N = H * W
M = 24  # deliberately not a multiple of the kernel block (pad path)


def _spins(key, m=M):
    return (2.0 * jax.random.bernoulli(key, 0.5, (m, N)) - 1.0
            ).astype(jnp.float32)


def _build(channels=(3, 3), complex_params=True, activation="lncosh",
           residual=False, character="A1", spin_flip=0, param_scale=0.3):
    inner = LogPsiGCNN(lattice_shape=(H, W), channels=channels,
                       kernel_size=3, complex_params=complex_params,
                       param_scale=param_scale, character=character,
                       activation=activation, residual=residual)
    model = (SpinFlipSymmetrized(inner=inner, sector=spin_flip)
             if spin_flip else inner)
    variables = model.init(jax.random.key(0), jnp.ones((1, N), jnp.float32))
    # at init all biases are zero and lncosh is even, so the inner net is
    # exactly even under s -> -s: the odd (sector=-1) projection would be
    # the identically-zero function and parity would compare pure rounding
    # noise — perturb the biases to lift the degeneracy
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 0.1 * jax.random.normal(
            jax.random.key(zlib.crc32(str(path).encode())), x.shape)
        if "bias" in str(path) else x, variables)
    fast = make_fused_log_psi(
        lattice_shape=(H, W), channels=channels, kernel_size=3,
        complex_params=complex_params, character=character,
        activation=activation, residual=residual,
        spin_flip_sector=spin_flip, block=8, interpret=True)
    return model, variables, fast


CASES = [
    dict(),                                               # depth-2 lncosh C
    dict(activation="selu"),
    dict(complex_params=False),
    dict(complex_params=False, activation="selu"),
    # rounding compounds with depth (direct product vs Karatsuba), hence
    # the looser tolerance on the deep residual case
    dict(channels=(2, 2, 2, 2), activation="selu", residual=True,
         tol=1e-3),
    # sign-changing characters: the signed sum over group elements has
    # exact NODES (psi = 0, log psi = -inf); near a node the log amplifies
    # honest rounding unboundedly, so parity is asserted in amplitude
    # space, normalized to the batch scale (amp=True below)
    dict(character="B1", param_scale=0.1, amp=True),
    dict(activation="selu", spin_flip=1, tol=5e-4),
    dict(character="B2", spin_flip=-1, param_scale=0.1, amp=True),
]


@pytest.mark.parametrize("kw", CASES,
                         ids=lambda kw: "-".join(f"{k}={v}" for k, v in
                                                 kw.items()) or "default")
def test_fused_forward_matches_xla_model(kw):
    kw = dict(kw)
    tol = kw.pop("tol", 1e-4)
    amp = kw.pop("amp", False)
    model, variables, fast = _build(**kw)
    s = _spins(jax.random.key(1))
    want = log_psi_apply(model, variables, s)
    got = fast(variables, s)
    if amp:
        # sign-changing irreps have exact nodes: compare normalized
        # amplitudes psi/|psi|_max — the physically meaningful metric
        # (ratios, acceptance, E_loc all consume amplitudes, and a walker
        # at a node has zero weight in every estimator)
        def norm_amp(lp):
            re, im = np.asarray(lp.re), np.asarray(lp.im)
            scale = np.max(re[np.isfinite(re)])
            mag = np.exp(re - scale)
            return np.where(mag > 0, mag * np.cos(im), 0.0), \
                np.where(mag > 0, mag * np.sin(im), 0.0)
        gw_re, gw_im = norm_amp(got)
        ww_re, ww_im = norm_amp(want)
        np.testing.assert_allclose(gw_re, ww_re, atol=1e-3)
        np.testing.assert_allclose(gw_im, ww_im, atol=1e-3)
        return
    # tolerance: the kernel uses the direct 4-matmul complex product where
    # the model uses Karatsuba — identical math, different f32 rounding
    np.testing.assert_allclose(np.asarray(got.re), np.asarray(want.re),
                               rtol=tol, atol=tol)
    # phases only matter mod 2pi and where the amplitude is finite
    dphi = np.asarray(got.im) - np.asarray(want.im)
    dphi = (dphi + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dphi, 0.0, atol=tol)


def test_fused_forward_space_group_invariance():
    """A1-character fused forward must be exactly invariant under the full
    space group (rotation applied to the spin grid)."""
    _, variables, fast = _build(activation="selu")
    s = _spins(jax.random.key(2))
    grid = s.reshape(M, H, W)
    rot = jnp.rot90(grid, k=1, axes=(1, 2)).reshape(M, N)
    a = fast(variables, s)
    b = fast(variables, rot)
    np.testing.assert_allclose(np.asarray(a.re), np.asarray(b.re),
                               rtol=1e-6, atol=1e-6)


def test_fused_forward_unequal_channels_rejected():
    with pytest.raises(ValueError, match="equal channel"):
        make_fused_log_psi(lattice_shape=(H, W), channels=(2, 4),
                           kernel_size=3, complex_params=True)
