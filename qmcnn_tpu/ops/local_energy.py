"""Local energy E_loc(s) = <s|H|psi>/<s|psi> (SURVEY.md R5 / N5, call stack
section 3.3).

E_loc(s) = diag(s) + sum_k mask_k * mel_k * psi(s'_k)/psi(s), with the
amplitude ratios evaluated in log space: ratio = exp(log psi(s') - log psi(s)).
The [M, K] connected-state forward is the biggest batched forward of a
training step; it is flattened to one [M*K, N] MXU-friendly batch, optionally
chunked over the walker axis (``lax.map``) to bound HBM working-set growth on
large lattices (SURVEY.md section 5, "long-context" analogue).

Connected states stay with their walker, so under walker sharding this op
needs no cross-chip communication.
"""
from __future__ import annotations

from typing import Optional

import jax


from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array


def local_energy(
    log_psi_fn,
    params,
    ham,
    s: Array,
    log_psi: C,
    chunk_size: Optional[int] = None,
) -> C:
    """Batched local energies.

    Args:
      log_psi_fn: (params, s [B, N]) -> C [B].
      ham: Hamiltonian with diag_batch / connected_batch / n_conn.
      s: [M, N] walker configurations.
      log_psi: C [M], log psi(s) for the *current* params.
      chunk_size: if set, process walkers in chunks of this size (must divide
        M) to bound the [chunk * K, N] forward's memory.

    Returns:
      C [M] local energies.
    """

    def compute(args):
        s_c, lp_c = args
        m = s_c.shape[0]
        k = ham.n_conn
        s_prime, mel, mask = ham.connected_batch(s_c)   # [m,K,N], [m,K], [m,K]
        lp_prime = log_psi_fn(params, s_prime.reshape(m * k, -1)).reshape(m, k)
        ratio = cplx.cexp(C(lp_prime.re - lp_c.re[:, None],
                            lp_prime.im - lp_c.im[:, None]))
        w = mel * mask.astype(mel.dtype)                 # [m, K] real
        offdiag = C((w * ratio.re).sum(-1), (w * ratio.im).sum(-1))
        diag = ham.diag_batch(s_c)
        return C(diag + offdiag.re, offdiag.im)

    m_total = s.shape[0]
    if chunk_size is None or chunk_size >= m_total:
        return compute((s, log_psi))
    if m_total % chunk_size:
        raise ValueError(f"chunk_size {chunk_size} must divide M={m_total}")
    n_chunks = m_total // chunk_size
    s_chunks = s.reshape(n_chunks, chunk_size, -1)
    lp_chunks = log_psi.reshape(n_chunks, chunk_size)
    out = jax.lax.map(compute, (s_chunks, lp_chunks))
    return out.reshape(m_total)
