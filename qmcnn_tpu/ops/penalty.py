"""Excited states by orthogonality penalty (beyond-reference capability).

Reference parity note: the reference (dmaloneynygc/qmcnn, SURVEY.md R7-R10)
only minimizes the ground-state energy. This module adds the standard NQS
excited-state method (penalty variant of Choo/Carleo-style state targeting):
minimize  E[psi] + beta * sum_k F_k,  with
  F_k = |<psi_k|psi>|^2 / (<psi_k|psi_k> <psi|psi>)
the squared normalized overlap against FROZEN previously-trained states
psi_k. With beta above the energy gap, the minimizer of the penalized
functional is the lowest state orthogonal to every psi_k — i.e. the next
excited state (within the sampled symmetry sector).

TWO-CHAIN estimator (the fidelity.py decomposition):
  F = E_{s ~ |psi|^2}[psi_k(s)/psi(s)] * E_{t ~ |psi_k|^2}[psi(t)/psi_k(t)]
The second chain samples the FROZEN state, which never changes during the
run — so its walker batch is drawn ONCE (builder time) and stored as a
constant. This matters: a single-chain estimator
F = |E[r]|^2/E[|r|^2] (r = psi_k/psi on live walkers only) was tried first
and is DEGENERATE under sampling collapse — if the live walkers concentrate
on one configuration it returns exactly 1 with exactly zero gradient, and
penalized runs were observed stalling in that state (r2 tuning logs). The
frozen chain keeps a diverse support, so both the value and the gradient
survive collapse and push the state back out.

Gradients: the live-chain expectation is written as a REWEIGHTED mean
  E_w[x] = mean(w x)/mean(w),  w = exp(2 (log|psi_theta| - sg(log|psi|)))
(w == 1 at the evaluation point) so jax.grad flows through both the
amplitude ratios and the sampling distribution; the frozen-chain factor
carries gradient through psi_theta(t) directly. No hand-derived covariance
formulas (same surrogate design as the energy gradient, SURVEY.md N6).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.vmc import pmean

Array = jax.Array


class FrozenState(NamedTuple):
    """A frozen wavefunction to orthogonalize against.

    ``s_frozen`` is a batch drawn from |psi_k|^2 once at build time
    (valid forever: psi_k never changes), and ``lp_frozen`` its cached
    log-amplitudes under psi_k.
    """

    log_psi_fn: object
    params: object
    s_frozen: Array      # [M0, N] ~ |psi_k|^2
    lp_frozen: C         # [M0] log psi_k(s_frozen)


def make_frozen_state(log_psi_fn, params, s_frozen: Array) -> FrozenState:
    params = jax.lax.stop_gradient(params)
    lp = log_psi_fn(params, s_frozen)
    return FrozenState(log_psi_fn, params,
                       jax.lax.stop_gradient(s_frozen),
                       jax.lax.stop_gradient(lp))


def overlap_sq(lp_live: C, lpk_live: C, lp_on_frozen: C, lpk_frozen: C,
               axis_name: Optional[str] = None) -> Array:
    """Two-chain F = E_live[psi_k/psi] * E_frozen[psi/psi_k] (real part).

    Args:
      lp_live: log psi_theta on the live walkers [M] (carries gradients;
        sampling dependence enters through the reweighting).
      lpk_live: log psi_k on the live walkers [M] (constants).
      lp_on_frozen: log psi_theta on the frozen batch [M0] (gradients).
      lpk_frozen: cached log psi_k on the frozen batch [M0] (constants).

    The frozen batch is replicated across devices (a trace-time constant),
    so only the live-chain reductions need the pmean/pmax hooks.
    """
    sg = jax.lax.stop_gradient
    # live chain: A = E_w[psi_k/psi], reweighted for the score term
    w = jnp.exp(2.0 * (lp_live.re - sg(lp_live.re)))   # == 1 at eval point
    d1 = C(lpk_live.re - lp_live.re, lpk_live.im - lp_live.im)
    shift1 = sg(jnp.max(d1.re))
    if axis_name is not None:
        shift1 = jax.lax.pmax(shift1, axis_name)
    r1 = cplx.cexp(C(d1.re - shift1, d1.im))
    mw = pmean(jnp.mean(w), axis_name)
    a = C(pmean(jnp.mean(w * r1.re), axis_name),
          pmean(jnp.mean(w * r1.im), axis_name)) / mw   # A e^-shift1
    # frozen chain: B = E[psi/psi_k] over the fixed |psi_k|^2 batch
    d2 = C(lp_on_frozen.re - lpk_frozen.re, lp_on_frozen.im - lpk_frozen.im)
    shift2 = sg(jnp.max(d2.re))
    r2 = cplx.cexp(C(d2.re - shift2, d2.im))
    b = C(jnp.mean(r2.re), jnp.mean(r2.im))             # B e^-shift2
    prod = a * b
    # restore the stabilizers in log space: F = Re[ab] e^(shift1+shift2).
    # F <= 1 in expectation, so the exponent is tame; clamp for safety.
    scale = jnp.exp(jnp.minimum(shift1 + shift2, 60.0))
    return prod.re * scale


def _chunked_fwd(fn, s: Array, chunk_size: Optional[int]) -> C:
    """``fn(s)`` with the batch axis chunked via ``lax.map`` when it helps.

    Same HBM-bounding role as local_energy's chunking (the deflation
    forwards run inside the train step whose Hamiltonian e_loc is chunked
    specifically to fit HBM — ADVICE r4). Falls back to one full-batch
    call when chunking is off, the batch is small, or the chunk does not
    divide it (frozen batches are builder-sized and need not match).
    """
    m = int(s.shape[0])
    if chunk_size is None or chunk_size >= m or m % chunk_size:
        return fn(s)
    out = jax.lax.map(fn, s.reshape(m // chunk_size, chunk_size,
                                    *s.shape[1:]))
    return jax.tree_util.tree_map(lambda a: a.reshape(-1), out)


def deflation_e_loc(
    log_psi_fn,
    params,
    s: Array,
    lp_live: C,
    frozen: Sequence[FrozenState],
    axis_name: Optional[str] = None,
    exp_clip: float = 30.0,
    chunk_size: Optional[int] = None,
):
    """Per-sample local energy of the deflation projector, and the overlap.

    Exact-deflation excited states (the r3-diagnosed fix for the minSR
    penalty collapse, BASELINE.md r3): optimize the GROUND state of
      A = H + c * sum_k |psi_k><psi_k| / <psi_k|psi_k>,
    whose lowest eigenstate (for c above the gap) is the lowest state
    orthogonal to every psi_k. Because the projector is folded into the
    LOCAL ENERGY, every downstream consumer — covariance gradient, minSR
    sample-space residuals, SPRING, variance — optimizes the deflated
    operator natively; nothing is bolted onto the gradient afterwards.
    (The additive beta-penalty gradient is DISCARDED by the sample-space
    minSR solver, which rebuilds its update from e_loc residuals alone —
    the r3 silent-collapse mode this estimator replaces.)

    Per-sample term (see the module docstring's two-chain decomposition):
      (P_k psi)(s)/psi(s) = [psi_k(s)/psi(s)] * <psi_k|psi>/<psi_k|psi_k>
                          = exp(lpk(s) - lp(s)) * rho_k,
      rho_k = E_{t~|psi_k|^2}[psi(t)/psi_k(t)]  (frozen batch, fresh each
      step since psi moves; one extra batched forward per frozen state).
    Returns (d_loc C[M] = sum_k per-sample terms WITHOUT the c factor,
    overlap = sum_k F_k with F_k = Re E_live[d_loc_k] — the same
    two-chain overlap the penalty logs). Everything is stop-gradiented:
    e_loc terms enter the gradient only through the covariance formula,
    exactly as the Hamiltonian's own local energy does (Hermitian A).

    ``exp_clip`` caps the per-sample log-ratio: individual ratios
    psi_k/psi are exponentially unbounded sample-by-sample once the
    states separate (expectation fine, variance not — the penalty
    estimator's clip_norm note); the clip only bites in the separated
    regime where any restoring magnitude suffices.
    """
    sg = jax.lax.stop_gradient
    zeros = jnp.zeros_like(lp_live.re)
    d_loc = C(zeros, zeros)
    overlap = jnp.zeros(())
    for f in frozen:
        lpk_live = sg(_chunked_fwd(lambda t: f.log_psi_fn(f.params, t),
                                   s, chunk_size))
        lp_on_frozen = sg(_chunked_fwd(lambda t: log_psi_fn(params, t),
                                       f.s_frozen, chunk_size))
        # rho_k = mean exp(d2), stabilized: b * e^shift2
        d2 = C(lp_on_frozen.re - f.lp_frozen.re,
               lp_on_frozen.im - f.lp_frozen.im)
        shift2 = jnp.max(d2.re)
        r2 = cplx.cexp(C(d2.re - shift2, d2.im))
        b = C(jnp.mean(r2.re), jnp.mean(r2.im))
        # per-sample: exp(d1) * rho_k = exp(d1.re + shift2) e^{i d1.im} b
        d1 = C(sg(lpk_live.re - lp_live.re), sg(lpk_live.im - lp_live.im))
        amp = jnp.exp(jnp.minimum(d1.re + shift2, exp_clip))
        term = C(amp, zeros) * cplx.cexp(C(zeros, d1.im)) * b
        d_loc = d_loc + term
        overlap = overlap + pmean(jnp.mean(term.re), axis_name)
    return d_loc, overlap


def penalty_value_and_grad(
    log_psi_fn,
    params,
    s: Array,
    frozen: Sequence[FrozenState],
    beta: float,
    axis_name: Optional[str] = None,
    clip_norm: float = 1.0,
):
    """(sum_k F_k, d/dtheta [beta * sum_k F_k]) on the live batch ``s``.

    ``clip_norm``: global-norm cap on the (beta-scaled) penalty gradient.
    Once psi separates from psi_k, the frozen-chain ratios psi/psi_k are
    exponentially unbounded sample-by-sample (the expectation is fine, the
    variance is not) — observed as grad norms of 1e8+ in a live run. Near
    orthogonality the gradient is small and passes unclipped, which is
    where estimator exactness matters; the clip only tames the separated
    regime, where any restoring direction suffices.
    """
    lpk_live = [jax.lax.stop_gradient(f.log_psi_fn(f.params, s))
                for f in frozen]

    def total_overlap(p):
        lp_live = log_psi_fn(p, s)
        total = 0.0
        for f, lpk in zip(frozen, lpk_live):
            lp_on_frozen = log_psi_fn(p, f.s_frozen)
            total = total + overlap_sq(lp_live, lpk, lp_on_frozen,
                                       f.lp_frozen, axis_name)
        return total

    f_sum, grads = jax.value_and_grad(total_overlap)(params)
    gnorm = jnp.sqrt(sum(jnp.sum(g * g)
                         for g in jax.tree_util.tree_leaves(grads)))
    scale = beta * jnp.minimum(1.0, clip_norm / jnp.maximum(
        beta * gnorm, 1e-30))
    grads = jax.tree_util.tree_map(lambda g: scale * g, grads)
    return f_sum, grads
