"""Complex arithmetic over explicit (re, im) float32 pairs.

The axon TPU backend does not implement complex64 at all (creation, transfer,
and every op fail with UNIMPLEMENTED), so the framework represents every
complex quantity — log-amplitudes, local energies, complex CNN weights — as a
pair of real arrays. ``C`` is a NamedTuple, hence automatically a JAX pytree:
it flows through jit/vmap/scan/grad and through shard_map partition specs.

Design bonus: with (re, im) pairs all *parameters* are real float32, so the
gradient and stochastic-reconfiguration conventions are the simple
real-parameter ones (no Wirtinger/conjugation pitfalls — SURVEY.md "hard
parts" #1).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class C(NamedTuple):
    """A complex value/array as a (re, im) pair of real arrays."""

    re: Array
    im: Array

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        o = as_c(o)
        return C(self.re + o.re, self.im + o.im)

    def __radd__(self, o):
        return as_c(o) + self

    def __sub__(self, o):
        o = as_c(o)
        return C(self.re - o.re, self.im - o.im)

    def __rsub__(self, o):
        return as_c(o) - self

    def __mul__(self, o):
        if isinstance(o, C):
            return C(self.re * o.re - self.im * o.im,
                     self.re * o.im + self.im * o.re)
        return C(self.re * o, self.im * o)  # real scalar/array

    def __rmul__(self, o):
        return self * o

    def __neg__(self):
        return C(-self.re, -self.im)

    def __truediv__(self, o):
        if isinstance(o, C):
            d = o.re * o.re + o.im * o.im
            return C((self.re * o.re + self.im * o.im) / d,
                     (self.im * o.re - self.re * o.im) / d)
        return C(self.re / o, self.im / o)

    def conj(self) -> "C":
        return C(self.re, -self.im)

    def abs2(self) -> Array:
        return self.re * self.re + self.im * self.im

    def abs(self) -> Array:
        return jnp.sqrt(self.abs2())

    # -- shapes / reductions -------------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    def reshape(self, *shape) -> "C":
        return C(self.re.reshape(*shape), self.im.reshape(*shape))

    def __getitem__(self, idx) -> "C":
        return C(self.re[idx], self.im[idx])

    def sum(self, axis=None) -> "C":
        return C(self.re.sum(axis), self.im.sum(axis))

    def mean(self, axis=None) -> "C":
        return C(self.re.mean(axis), self.im.mean(axis))

    def to_numpy(self):
        """Host-side numpy complex (tests / logging only — never on TPU)."""
        import numpy as np

        return np.asarray(self.re) + 1j * np.asarray(self.im)


def as_c(x) -> C:
    """Promote a real array/scalar (or pass through a C) to a C pair."""
    if isinstance(x, C):
        return x
    x = jnp.asarray(x)
    return C(x, jnp.zeros_like(x))


def zeros(shape, dtype=jnp.float32) -> C:
    return C(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def cexp(z: C) -> C:
    """exp(re + i im) = e^re (cos im, sin im)."""
    m = jnp.exp(z.re)
    return C(m * jnp.cos(z.im), m * jnp.sin(z.im))


def clog(z: C) -> C:
    """Principal log: (0.5 log|z|^2, atan2(im, re))."""
    return C(0.5 * jnp.log(z.abs2()), jnp.arctan2(z.im, z.re))


def lncosh(z: C) -> C:
    """Stable log(cosh(z)) for a complex pair.

    log cosh z = t - log 2 + log(1 + e^{-2t}) with t = z * sign(Re z), so the
    exponential's magnitude e^{-2|Re z|} <= 1. All-real VPU ops.
    """
    s = jnp.where(z.re >= 0, 1.0, -1.0)
    tr, ti = z.re * s, z.im * s
    w = cexp(C(-2.0 * tr, -2.0 * ti))  # |w| <= 1
    lg = clog(C(1.0 + w.re, w.im))
    log2 = 0.6931471805599453
    return C(tr - log2 + lg.re, ti + lg.im)


def lncosh_real(x: Array) -> Array:
    t = jnp.abs(x)
    return t - 0.6931471805599453 + jnp.log1p(jnp.exp(-2.0 * t))


def selu_reim(z: C) -> C:
    """SELU on re and im separately (non-holomorphic, like the deep-GCNN
    NQS literature's 'reim' activations). Unlike lncosh — which is
    *quadratic* at 0, so deep stacks collapse or blow up at init for any
    fixed weight scale — SELU has slope ~1.05 at 0 and is self-normalizing:
    with fan_in init a 6+-layer stack keeps unit-scale signals. Symmetry
    note: elementwise on (re, im), so GCNN space-group equivariance and the
    character projection are untouched."""
    return C(jax.nn.selu(z.re), jax.nn.selu(z.im))


def selu_real(x: Array) -> Array:
    return jax.nn.selu(x)


#: activation registry used by the model builders: name -> (complex fn C->C,
#: real fn Array->Array)
ACTIVATIONS = {
    "lncosh": (lncosh, lncosh_real),
    "selu": (selu_reim, selu_real),
}


def logmeanexp(z: C, axis: int = 0) -> C:
    """log(mean(exp(z))) along axis, stabilized by max Re."""
    m = jax.lax.stop_gradient(jnp.max(z.re, axis=axis, keepdims=True))
    w = cexp(C(z.re - m, z.im))
    lg = clog(w.mean(axis))
    return C(lg.re + jnp.squeeze(m, axis), lg.im)
