"""Monte-Carlo fidelity between two wavefunctions.

F = |<psi1|psi2>|^2 / (<psi1|psi1> <psi2|psi2>)
  = E_{s~|psi1|^2}[psi2/psi1(s)] * E_{s~|psi2|^2}[psi1/psi2(s)]

(the standard two-chain overlap estimator; both factors are ratios of
amplitudes evaluated on the other chain's samples, so everything stays in
log space). Uses: tracking how far a training step moved the state,
comparing checkpoints, or validating against ED ground vectors on small
systems (which is how the tests pin it).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.vmc import pmean


def _mean_ratio(lp_num: C, lp_den: C, axis_name: Optional[str]) -> C:
    """E[exp(lp_num - lp_den)] with max-Re stabilization."""
    d = C(lp_num.re - lp_den.re, lp_num.im - lp_den.im)
    shift = jnp.max(d.re)
    if axis_name is not None:
        # true global max (pmax): a mean of per-shard maxima would be
        # consistent across shards but a weaker overflow guard
        shift = jax.lax.pmax(shift, axis_name)
    w = cplx.cexp(C(d.re - shift, d.im))
    mean = C(pmean(w.re.mean(), axis_name), pmean(w.im.mean(), axis_name))
    return mean, shift


def fidelity(
    log_psi1_fn, params1,
    log_psi2_fn, params2,
    s_from_1, s_from_2,
    axis_name: Optional[str] = None,
):
    """MC fidelity estimate in [0, 1] (up to sampling noise).

    Args:
      s_from_1: [M, N] samples drawn from |psi1|^2.
      s_from_2: [M, N] samples drawn from |psi2|^2.
    """
    lp1_on1 = log_psi1_fn(params1, s_from_1)
    lp2_on1 = log_psi2_fn(params2, s_from_1)
    lp1_on2 = log_psi1_fn(params1, s_from_2)
    lp2_on2 = log_psi2_fn(params2, s_from_2)
    r21, shift_a = _mean_ratio(lp2_on1, lp1_on1, axis_name)
    r12, shift_b = _mean_ratio(lp1_on2, lp2_on2, axis_name)
    prod = r21 * r12
    # overall scale: exp(shift_a + shift_b) restores the stabilizers; the
    # two shifts cancel in expectation (they are log-ratio extrema of
    # opposite sign), so work in log space for safety:
    log_f = jnp.log(jnp.maximum(prod.abs(), 1e-30)) + shift_a + shift_b
    # raw estimate: noise can push it slightly above 1 — callers may clamp
    return jnp.exp(log_f)
