"""CNN log-amplitude ansaetze log psi_theta(s) (SURVEY.md R2 / N2).

Reference parity: circular-padded convolutions matching the lattice PBC,
ln-cosh activations, complex-valued amplitudes, exact translation invariance
via a spatial-sum readout, and optional explicit translation averaging.

TPU-native choices:
  * The axon TPU backend implements neither complex dtypes nor complex convs,
    so complex amplitudes live as explicit (re, im) float32 pairs
    (:mod:`qmcnn_tpu.ops.cplx`) and "complex" weights are pairs of real
    parameter leaves. Complex x complex convolution uses the
    3-multiplication Karatsuba form — three real convs on the MXU.
  * All parameters are real float32, so gradient/SR conventions are the
    simple real-parameter ones.
  * Everything is fixed-shape; the batch axis is the only large axis, which
    is what the Metropolis sampler and local-energy enumeration produce.

API: ``model.apply(variables, s)`` with ``s`` of shape ``[batch, n_sites]``
(flat, values in {-1.,+1.}) returns a ``C`` pair of ``[batch]`` float32
log-amplitude arrays (im identically zero for real models).
"""
from __future__ import annotations

import itertools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array


def _circular_pad(x: Array, kernel: Tuple[int, ...]) -> Array:
    """Wrap-pad the spatial dims of [batch, *spatial, C] for 'VALID' conv."""
    pads = [(0, 0)]
    for k in kernel:
        lo = (k - 1) // 2
        hi = k - 1 - lo
        pads.append((lo, hi))
    pads.append((0, 0))
    return jnp.pad(x, pads, mode="wrap")


def _real_conv(x: Array, w: Array) -> Array:
    """VALID real conv, NWC/NHWC layout, float32 accumulation on the MXU."""
    ndim = w.ndim - 2  # spatial dims
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NWC", "WIO", "NWC") if ndim == 1 else ("NHWC", "HWIO", "NHWC"),
    )
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,) * ndim, padding="VALID",
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )


class ComplexConv(nn.Module):
    """Circular complex convolution; weights = (kernel_re, kernel_im) leaves.

    For real input: 2 real convs. For C input, Karatsuba (3 real convs):
    with W = A + iB, z = x + iy,
      p1 = A*x, p2 = B*y, p3 = (A+B)*(x+y); Re = p1 - p2, Im = p3 - p1 - p2.
    """

    features: int
    kernel_size: Tuple[int, ...]
    param_scale: float = 0.05
    use_bias: bool = True

    @nn.compact
    def __call__(self, z) -> C:
        in_features = (z.re if isinstance(z, C) else z).shape[-1]
        shape = (*self.kernel_size, in_features, self.features)
        a = self.param("kernel_re", nn.initializers.normal(self.param_scale),
                       shape, jnp.float32)
        b = self.param("kernel_im", nn.initializers.normal(self.param_scale),
                       shape, jnp.float32)
        if isinstance(z, C):
            x = _circular_pad(z.re, self.kernel_size)
            y = _circular_pad(z.im, self.kernel_size)
            p1 = _real_conv(x, a)
            p2 = _real_conv(y, b)
            p3 = _real_conv(x + y, a + b)
            out = C(p1 - p2, p3 - p1 - p2)
        else:
            x = _circular_pad(z, self.kernel_size)
            out = C(_real_conv(x, a), _real_conv(x, b))
        if self.use_bias:
            br = self.param("bias_re", nn.initializers.zeros,
                            (self.features,), jnp.float32)
            bi = self.param("bias_im", nn.initializers.zeros,
                            (self.features,), jnp.float32)
            out = C(out.re + br, out.im + bi)
        return out


class RealConv(nn.Module):
    """Circular real convolution (shares the padding/conv code path)."""

    features: int
    kernel_size: Tuple[int, ...]
    param_scale: float = 0.05
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        w = self.param("kernel", nn.initializers.normal(self.param_scale),
                       (*self.kernel_size, in_features, self.features),
                       jnp.float32)
        out = _real_conv(_circular_pad(x, self.kernel_size), w)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias
        return out


class LogPsiCNN(nn.Module):
    """log psi(s): stacked circular convs + lncosh, spatial-sum readout.

    The sum over the final feature map makes log psi exactly invariant under
    lattice translations (conv stack is translation-equivariant, readout is
    translation-invariant) — the 'free' form of the reference's translational
    symmetry averaging. ``complex_params=True`` gives complex-valued
    amplitudes (J1-J2; BASELINE config 4).
    """

    lattice_shape: Tuple[int, ...]
    channels: Sequence[int] = (8, 8)
    kernel_size: int | Tuple[int, ...] = 3
    complex_params: bool = False
    param_scale: float = 0.05

    @nn.compact
    def __call__(self, s: Array) -> C:
        batch = s.shape[0]
        ksz = self.kernel_size
        if isinstance(ksz, int):
            ksz = (ksz,) * len(self.lattice_shape)
        ksz = tuple(min(k, L) for k, L in zip(ksz, self.lattice_shape))
        x = s.reshape(batch, *self.lattice_shape, 1).astype(jnp.float32)
        if self.complex_params:
            for c in self.channels:
                x = ComplexConv(features=c, kernel_size=ksz,
                                param_scale=self.param_scale)(x)
                x = cplx.lncosh(x)
            return C(x.re.reshape(batch, -1).sum(-1),
                     x.im.reshape(batch, -1).sum(-1))
        for c in self.channels:
            x = RealConv(features=c, kernel_size=ksz,
                         param_scale=self.param_scale)(x)
            x = cplx.lncosh_real(x)
        out = x.reshape(batch, -1).sum(-1)
        return C(out, jnp.zeros_like(out))


class TranslationAveraged(nn.Module):
    """Explicit translation symmetrization (SURVEY.md R2):

      psi_sym(s) = mean over translations T of psi(T s)
      => log psi_sym(s) = logmeanexp_T log psi(T s).

    Exact projection onto the zero-momentum sector. Costs one forward per
    translation, so use on small lattices or with a ``shift_stride``
    subgroup. For the spatial-sum LogPsiCNN this is a mathematical no-op
    (already invariant) — which the tests exploit.
    """

    inner: nn.Module
    lattice_shape: Tuple[int, ...]
    shift_stride: int = 1

    @nn.compact
    def __call__(self, s: Array) -> C:
        batch = s.shape[0]
        grid = s.reshape(batch, *self.lattice_shape)
        axes = tuple(range(1, 1 + len(self.lattice_shape)))
        shifts_per_dim = [range(0, L, self.shift_stride)
                          for L in self.lattice_shape]
        rolled = [jnp.roll(grid, shift, axis=axes).reshape(batch, -1)
                  for shift in itertools.product(*shifts_per_dim)]
        stacked = jnp.stack(rolled, axis=0)  # [T, batch, N]
        t = stacked.shape[0]
        logs = self.inner(stacked.reshape(t * batch, -1))
        logs = cplx.as_c(logs).reshape(t, batch)
        return cplx.logmeanexp(logs, axis=0)


def log_psi_apply(model: nn.Module, variables, s: Array) -> C:
    """Uniform entry point: always returns a C pair of log-amplitudes."""
    return cplx.as_c(model.apply(variables, s))
