"""Lanczos-step energy refinement: the variational energy of the
once-Krylov-extended state phi(alpha) = (1 + alpha H) psi.

A measurement-time upgrade standard in the NQS literature (a single
Lanczos iteration on top of the optimized ansatz): given MC estimates of
the first three Hamiltonian moments under |psi|^2,

  h_k = <psi| H^k |psi> / <psi|psi>,   k = 1, 2, 3,

the energy of phi(alpha) is a rational function of alpha whose minimizer
has a closed form, and E(alpha*) <= E(0) is a *strictly variational*
improvement — no re-training, no bias, just a better upper bound (plus a
diagnostic of how far the ansatz sits from an eigenstate: alpha* -> 0 and
the gain -> 0 as var(H) -> 0).

Estimators (p(s) = |psi_s|^2 / <psi|psi>, E_loc(s) = (H psi)_s / psi_s):

  h1 = E_p[E_loc(s)]
  h2 = E_p[|E_loc(s)|^2]                    (Hermitian H)
  h3 = E_p[Re( E_loc(s)* G(s) )],  G(s) = (H^2 psi)_s / psi_s
     G(s) = diag(s) E_loc(s) + sum_k mask_k mel_k ratio_k(s) E_loc(s'_k)

G needs the local energy OF every connected state — a [M * K * K]
amplitude batch. Cost is K x one E_loc pass; walker-chunk it and keep M
modest (this is a measurement pass, not a training-loop op). Connected
states stay with their walker, so under walker sharding the only
communication is the final scalar pmean (same contract as local_energy).

With centered moments (K = H - h1; k1 = 0), parametrize the SAME state
family as phi(beta) = (1 + beta K) psi — (1 + alpha H) is a scalar
multiple of (1 + beta K) with beta = alpha / (1 + alpha h1), so the
minimal energies coincide and the centered algebra is well-conditioned:

  k2 = h2 - h1^2,  k3 = h3 - 3 h1 h2 + 2 h1^3
  E(beta) = h1 + (2 beta k2 + beta^2 k3) / (1 + beta^2 k2)
  dE/dbeta = 0  ->  -k2^2 beta^2 + k3 beta + k2 = 0

(both roots real for k2 > 0; the minimizer is selected by evaluating E;
the returned alpha = beta / (1 - beta h1) applies to the raw H).
Root-solving runs on host in float64 — third moments of O(|E|^3) values
difference against each other and f32 cancellation is measurable.

SURVEY.md lineage: R5/N5 (local energy) composed once more; validated
against dense exact enumeration in tests/test_lanczos.py.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.ops.local_energy import local_energy

Array = jax.Array


def h_moment_samples(
    log_psi_fn,
    params,
    ham,
    s: Array,
    log_psi: C,
    chunk_size: Optional[int] = None,
) -> Tuple[C, C]:
    """Per-walker (E_loc(s), G(s)) with G = (H^2 psi)_s / psi_s.

    ``chunk_size`` chunks the walker axis; each chunk still evaluates a
    [chunk * K, N] -> E_loc batch (itself internally [chunk * K^2, N]
    forwards via the inner local_energy chunk of size K... kept at one
    walker-chunk granularity: peak forward batch is [chunk * K, N]).
    """

    def compute(args):
        s_c, lp_c = args
        m = s_c.shape[0]
        k = ham.n_conn
        s_prime, mel, mask = ham.connected_batch(s_c)   # [m,K,N],[m,K],[m,K]
        sp_flat = s_prime.reshape(m * k, -1)
        lp_prime = log_psi_fn(params, sp_flat)          # C [m*K]
        # E_loc of every connected state; inner chunking bounds the
        # [inner * K, N] forward of the second H application
        e_prime = local_energy(log_psi_fn, params, ham, sp_flat, lp_prime,
                               chunk_size=m).reshape(m, k)
        lp_pr = C(lp_prime.re.reshape(m, k), lp_prime.im.reshape(m, k))
        ratio = cplx.cexp(C(lp_pr.re - lp_c.re[:, None],
                            lp_pr.im - lp_c.im[:, None]))
        w = mel * mask.astype(mel.dtype)                # [m, K]
        re = (w * (ratio.re * e_prime.re - ratio.im * e_prime.im)).sum(-1)
        im = (w * (ratio.re * e_prime.im + ratio.im * e_prime.re)).sum(-1)
        diag = ham.diag_batch(s_c)
        e1_c = local_energy(log_psi_fn, params, ham, s_c, lp_c)
        g = C(diag * e1_c.re + re, diag * e1_c.im + im)
        return e1_c, g

    m_total = s.shape[0]
    if chunk_size is None or chunk_size >= m_total:
        return compute((s, log_psi))
    if m_total % chunk_size:
        raise ValueError(f"chunk_size {chunk_size} must divide M={m_total}")
    n_chunks = m_total // chunk_size
    s_chunks = s.reshape(n_chunks, chunk_size, -1)
    lp_chunks = C(log_psi.re.reshape(n_chunks, chunk_size),
                  log_psi.im.reshape(n_chunks, chunk_size))
    e1, g = jax.lax.map(compute, (s_chunks, lp_chunks))
    return (C(e1.re.reshape(m_total), e1.im.reshape(m_total)),
            C(g.re.reshape(m_total), g.im.reshape(m_total)))


def moments_from_samples(e1: C, g: C,
                         weights: Optional[Array] = None
                         ) -> Tuple[float, float, float]:
    """(h1, h2, h3) from per-sample (E_loc, G); host-side float64.

    ``weights``: optional probability weights (exact-enumeration tests);
    default = uniform MC average.
    """
    e_re = np.asarray(e1.re, np.float64)
    e_im = np.asarray(e1.im, np.float64)
    g_re = np.asarray(g.re, np.float64)
    g_im = np.asarray(g.im, np.float64)
    if weights is None:
        w = np.full(e_re.shape, 1.0 / e_re.size)
    else:
        w = np.asarray(weights, np.float64)
        w = w / w.sum()
    h1 = float((w * e_re).sum())
    h2 = float((w * (e_re * e_re + e_im * e_im)).sum())
    h3 = float((w * (e_re * g_re + e_im * g_im)).sum())
    return h1, h2, h3


def lanczos_step(h1: float, h2: float, h3: float
                 ) -> Tuple[float, float, float]:
    """(alpha*, E(alpha*), E(0)=h1) minimizing the Lanczos-step energy,
    with alpha* the coefficient of the RAW Hamiltonian in (1 + alpha H).

    Degenerate case k2 <= 0 (psi already an eigenstate, or MC noise):
    returns alpha = 0, no change.
    """
    k2 = h2 - h1 * h1
    k3 = h3 - 3.0 * h1 * h2 + 2.0 * h1 ** 3
    if k2 <= 0.0:
        return 0.0, h1, h1

    def energy(beta: float) -> float:
        return h1 + ((2.0 * beta * k2 + beta * beta * k3)
                     / (1.0 + beta * beta * k2))

    disc = np.sqrt(k3 * k3 + 4.0 * k2 ** 3)
    roots = [(k3 + disc) / (2.0 * k2 * k2), (k3 - disc) / (2.0 * k2 * k2)]
    beta = min(roots, key=energy)
    alpha = beta / (1.0 - beta * h1)
    return float(alpha), float(energy(beta)), h1


def lanczos_wrap(base_log_psi_fn, ham, inner_chunk: Optional[int] = None):
    """Make phi = (1 + alpha H) psi_theta a VARIATIONAL ansatz (r5).

    The measurement-time ``lanczos_step`` above evaluates the energy of
    (1 + alpha H) psi at FROZEN theta; the r4 kagome-27 diagnostic
    (BASELINE.md r5 arm I) showed one such Krylov step recovers ~1/3 of
    the residual plateau — i.e. the missing structure is short-Krylov-
    reachable. This wrapper OPTIMIZES THROUGH the (1 + alpha H)
    application instead: it returns a log-amplitude function of the
    extended parameter set (theta, alpha) with

      log phi(s) = log psi_theta(s) + log(1 + alpha * E_loc^psi(s)),
      E_loc^psi(s) = (H psi_theta)(s) / psi_theta(s),

    an exact identity — no extra approximation. Everything downstream
    (Metropolis on |phi|^2, local energy of phi, autodiff scores for
    minSR/SPRING) composes mechanically because the result is just
    another (params, s) -> C log-amplitude function; the training local
    energy of phi internally costs K^2 base forwards per sample (K =
    ham.n_conn), so keep M modest and walker-chunk (builder scales the
    auto-chunk by K).

    Parameters live beside the base variables as a SEPARATE top-level
    collection ``{"lanczos": {"alpha": [re, im]}}`` so every base leaf
    keeps its path — warm starts from a plain-model checkpoint transfer
    unchanged (utils/transfer.py matches on (path, shape)), with alpha
    fresh at its configured init.

    Nodal caution: phi vanishes where alpha E_loc = -1 even if psi does
    not; |z|^2 is clamped at 1e-24 so log stays finite, and the Metropolis
    walk simply avoids the new nodal surface. alpha is trainable (both
    quadratures; H is Hermitian but complex psi makes complex alpha
    meaningful).
    """
    import jax.numpy as jnp

    def wrapped(variables, s):
        alpha = variables["lanczos"]["alpha"]
        base = {k: v for k, v in variables.items() if k != "lanczos"}
        lp = base_log_psi_fn(base, s)
        e_loc = local_energy(base_log_psi_fn, base, ham, s, lp,
                             chunk_size=inner_chunk)
        z = C(1.0 + alpha[0] * e_loc.re - alpha[1] * e_loc.im,
              alpha[0] * e_loc.im + alpha[1] * e_loc.re)
        mag2 = jnp.maximum(z.re * z.re + z.im * z.im, 1e-24)
        return C(lp.re + 0.5 * jnp.log(mag2),
                 lp.im + jnp.arctan2(z.im, z.re))

    return wrapped


def lanczos_init_alpha(alpha0: float):
    """Fresh {"lanczos": {"alpha": ...}} collection at a real init value
    (e.g. the alpha* a measurement-time lanczos_step reported)."""
    import jax.numpy as jnp

    return {"alpha": jnp.asarray([float(alpha0), 0.0], jnp.float32)}
