"""Measurement estimators beyond the energy (VMC observables layer).

The reference's estimator layer (SURVEY.md R5-R7) measures the energy;
production VMC studies additionally track the diagonal observables below
(all computed directly from walker configurations — no extra forwards) and
off-diagonal observables via the same amplitude-ratio machinery as the local
energy. Everything is batched over walkers and reduces with the same pmean
hooks as the energy estimators, so it shards for free.

Conventions: spin-1/2, S^z_i = s_i / 2 with s in {-1, +1}.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.lattice import Lattice
from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.vmc import pmean

Array = jax.Array


def magnetization(s: Array, axis_name: Optional[str] = None) -> Array:
    """<M_z> = <sum_i S^z_i> / N per site, averaged over walkers."""
    m = (s / 2.0).mean(axis=-1)  # per-walker magnetization per site
    return pmean(m.mean(), axis_name)


def magnetization_sq(s: Array, axis_name: Optional[str] = None) -> Array:
    """<M_z^2> per site^2 — order parameter for Ising-like order."""
    m = (s / 2.0).mean(axis=-1)
    return pmean((m * m).mean(), axis_name)


def szsz_correlation(s: Array, lattice: Lattice,
                     axis_name: Optional[str] = None) -> Array:
    """C(r) = <S^z_0 S^z_r> averaged over translations, [n_sites] array.

    Uses the lattice's translation group: C(r) = mean_i <S^z_i S^z_{i+r}>,
    computed with one [M, N] x [M, N] rolled product per displacement via an
    FFT-free roll loop (N is small; this is host-trace-time unrolled).
    """
    m, n = s.shape
    sz = s.reshape(m, *lattice.shape) / 2.0
    axes = tuple(range(1, 1 + lattice.ndim))
    cs = []
    coords = lattice.coords
    for r in range(n):
        shift = tuple(int(c) for c in coords[r])
        rolled = jnp.roll(sz, shift, axis=axes)
        cs.append((sz * rolled).reshape(m, -1).mean())
    c = jnp.stack(cs)  # [n_sites], displacement indexed like sites
    return pmean(c, axis_name)


def structure_factor(corr: Array, lattice: Lattice) -> np.ndarray:
    """S(q) = sum_r e^{iq.r} C(r) on the reciprocal lattice (host-side).

    For the antiferromagnet the peak sits at q = (pi, pi) (or pi in 1D).
    """
    c = np.asarray(corr).reshape(lattice.shape)
    return np.abs(np.fft.fftn(c))


def staggered_magnetization_sq(s: Array, lattice: Lattice,
                               axis_name: Optional[str] = None) -> Array:
    """<M_st^2> with M_st = (1/N) sum_i (-1)^i S^z_i — AFM order parameter."""
    signs = jnp.asarray(1.0 - 2.0 * lattice.sublattice_mask.astype(np.float32))
    m_st = (s * signs[None, :] / 2.0).mean(axis=-1)
    return pmean((m_st * m_st).mean(), axis_name)


def offdiag_observable(log_psi_fn, params, s: Array, log_psi: C,
                       connected_fn, axis_name: Optional[str] = None) -> C:
    """<O> for an off-diagonal operator given its connected decomposition.

    ``connected_fn(s) -> (s' [K, N], coeff [K], mask [K])`` mirrors the
    Hamiltonian interface; the estimator is the same amplitude-ratio sum as
    the local energy: O_loc(s) = sum_k mask*coeff*psi(s')/psi(s).
    """
    sp, coeff, mask = jax.vmap(connected_fn)(s)
    m, k, n = sp.shape
    lp_prime = log_psi_fn(params, sp.reshape(m * k, n)).reshape(m, k)
    ratio = cplx.cexp(C(lp_prime.re - log_psi.re[:, None],
                        lp_prime.im - log_psi.im[:, None]))
    w = coeff * mask.astype(coeff.dtype)
    o_loc = C((w * ratio.re).sum(-1), (w * ratio.im).sum(-1))
    return C(pmean(o_loc.re.mean(), axis_name),
             pmean(o_loc.im.mean(), axis_name))
