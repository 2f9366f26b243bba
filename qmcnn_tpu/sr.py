"""Stochastic reconfiguration (natural gradient) — SURVEY.md R9 / N7.

Solves (S + lambda I) delta = F where
  S_kk' = Re[<O_k* O_k'> - <O_k*><O_k'>],   O_k = d log psi / d theta_k,
for real parameters (all qmcnn_tpu params are real float32 — complex weights
are (re, im) leaf pairs, see ops/cplx.py), and F is the covariance gradient
from vmc.energy_and_grad.

Three solver backends, all sharing the same pmean hooks so that under walker
sharding every reduction is a psum-over-ICI and the solve is the exact
global one (the north star's "distributed CG", SURVEY.md P2 — chips exchange
only P-sized vectors, never samples):

  * ``solver='cg'`` — matrix-free: ``jax.linearize`` + ``linear_transpose``
    give S.v as one jvp + one vjp per iteration; O(P) memory. Plain CG in
    f32 can diverge on ill-conditioned S (observed in training), so the loop
    carries a finiteness guard and returns the last finite iterate.
  * ``solver='pcg'`` (default) — materializes the centered Jacobian pair
    O = (J_re, J_im) [M, P] with one vmapped backward pass (MXU-friendly;
    memory M*P), computes diag(S) from it, and runs Jacobi-preconditioned
    CG whose matvec is two [M,P] matmuls. Robust to the scale disparities
    that break plain f32 CG.
  * ``solver='dense'`` — builds S densely ([P, P] via one matmul) and solves
    by Cholesky. Exact and cheapest for small nets (P up to a few thousand);
    also the test oracle for the iterative paths.
  * ``solver='minsr'`` — the sample-space (minSR) formulation for P >> M:
    with the stacked real score matrix O~ = [O_re; O_im] [2M, P] (centered)
    the push-through identity
        (O~^T O~ / M + lambda)^-1 O~^T eps / M
          = O~^T (O~ O~^T / M + lambda)^-1 eps / M
    turns the P x P solve into a 2M x 2M Cholesky — exact (it is the same
    delta as 'dense'/'pcg', tested), and scales SR to arbitrarily large
    networks. [Technique: Rende, Viteritti, Bardone, Becca & Goldt,
    arXiv:2310.05715 — "A simple linear algebra identity to optimize
    large-scale neural network quantum states".] Single-mesh-axis only in
    this version (the Gram matrix mixes samples across shards).

Diagonal shift schedule (Carleo & Troyer style):
  lambda(p) = max(lambda0 * b^p, lambda_min).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp

from qmcnn_tpu.ops.cplx import C

Array = jax.Array


# ---------------------------------------------------------------------------
# pytree linear algebra helpers
# ---------------------------------------------------------------------------

def tree_dot(a, b) -> Array:
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def tree_axpy(alpha, x, y):
    """alpha * x + y"""
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def tree_sub(a, b):
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_zeros_like(a):
    return jax.tree_util.tree_map(jnp.zeros_like, a)


# ---------------------------------------------------------------------------
# CG (pytree, guarded) and PCG (flat, Jacobi-preconditioned)
# ---------------------------------------------------------------------------

class CGResult(NamedTuple):
    x: Any
    iters: Array
    residual: Array  # final ||r|| / ||b||


def cg(matvec: Callable, b, x0=None, tol: float = 1e-5, maxiter: int = 100
       ) -> CGResult:
    """Conjugate gradient on pytrees for a symmetric PSD operator.

    f32-hardened: if an iteration produces a non-finite residual norm the
    loop stops and the previous (finite) iterate is returned.
    """
    x = tree_zeros_like(b) if x0 is None else x0
    r = tree_sub(b, matvec(x))
    p = r
    rs = tree_dot(r, r)
    b_norm = jnp.sqrt(tree_dot(b, b))
    eps = jnp.asarray(1e-30, b_norm.dtype)
    atol2 = (tol * b_norm) ** 2

    def cond(carry):
        _, _, _, rs, k, ok = carry
        return ok & (rs > atol2) & (k < maxiter)

    def body(carry):
        x, r, p, rs, k, ok = carry
        ap = matvec(p)
        alpha = rs / jnp.maximum(tree_dot(p, ap), eps)
        x_new = tree_axpy(alpha, p, x)
        r_new = tree_axpy(-alpha, ap, r)
        rs_new = tree_dot(r_new, r_new)
        good = jnp.isfinite(rs_new) & jnp.isfinite(alpha)
        beta = rs_new / jnp.maximum(rs, eps)
        p_new = tree_axpy(beta, p, r_new)
        # on a bad step keep the previous iterate and stop
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(good, n, o), new, old)
        return (keep(x_new, x), keep(r_new, r), keep(p_new, p),
                jnp.where(good, rs_new, rs), k + 1, good)

    x, r, p, rs, k, ok = jax.lax.while_loop(
        cond, body,
        (x, r, p, rs, jnp.zeros((), jnp.int32), jnp.asarray(True)),
    )
    return CGResult(x=x, iters=k,
                    residual=jnp.sqrt(rs) / jnp.maximum(b_norm, eps))


def pcg_flat(matvec: Callable, b: Array, inv_diag: Array,
             tol: float = 1e-5, maxiter: int = 100) -> CGResult:
    """Jacobi-preconditioned CG on flat [P] vectors."""
    x = jnp.zeros_like(b)
    r = b - matvec(x)
    z = inv_diag * r
    p = z
    rz = jnp.vdot(r, z)
    b_norm = jnp.linalg.norm(b)
    eps = jnp.asarray(1e-30, b.dtype)
    atol2 = (tol * b_norm) ** 2

    def cond(carry):
        _, r, _, _, rz, k, ok = carry
        return ok & (jnp.vdot(r, r) > atol2) & (k < maxiter)

    def body(carry):
        x, r, p, z, rz, k, ok = carry
        ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, ap), eps)
        x_new = x + alpha * p
        r_new = r - alpha * ap
        z_new = inv_diag * r_new
        rz_new = jnp.vdot(r_new, z_new)
        good = jnp.isfinite(rz_new) & jnp.isfinite(alpha)
        beta = rz_new / jnp.maximum(rz, eps)
        p_new = z_new + beta * p
        w = lambda n, o: jnp.where(good, n, o)
        return (w(x_new, x), w(r_new, r), w(p_new, p), w(z_new, z),
                jnp.where(good, rz_new, rz), k + 1, good)

    x, r, p, z, rz, k, ok = jax.lax.while_loop(
        cond, body,
        (x, r, p, z, rz, jnp.zeros((), jnp.int32), jnp.asarray(True)),
    )
    res = jnp.linalg.norm(r) / jnp.maximum(b_norm, eps)
    return CGResult(x=x, iters=k, residual=res)


# ---------------------------------------------------------------------------
# S operators
# ---------------------------------------------------------------------------

def _pmean(x, axis_name):
    return x if axis_name is None else jax.lax.pmean(x, axis_name)


def _pmean_tree(t, axis_name):
    if axis_name is None:
        return t
    return jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis_name), t)


def make_s_matvec(
    log_psi_fn,
    params,
    s: Array,
    diag_shift: Array,
    axis_name: Optional[str] = None,
):
    """Matrix-free (S + lambda I) pytree matvec (the 'cg' backend)."""
    m_local = s.shape[0]

    def f(p) -> C:
        return log_psi_fn(p, s)

    _, f_jvp = jax.linearize(f, params)
    f_vjp = jax.linear_transpose(f_jvp, params)

    # obar = <O> (complex mean row of the Jacobian), as a (re, im) leaf pair:
    # Re[J^dag w] with w = (1/M, 0) gives obar_re; with (0, 1/M) gives obar_im.
    ones = jnp.ones(m_local, jnp.float32) / m_local
    zeros = jnp.zeros(m_local, jnp.float32)
    (obar_re,) = f_vjp(C(ones, zeros))
    (obar_im,) = f_vjp(C(zeros, ones))
    obar_re = _pmean_tree(obar_re, axis_name)
    obar_im = _pmean_tree(obar_im, axis_name)

    def matvec(v):
        t = f_jvp(v)  # C pair [m_local]: (J v) as (re, im)
        (jtv,) = f_vjp(C(t.re / m_local, t.im / m_local))  # Re[J^dag J v]/M
        jtv = _pmean_tree(jtv, axis_name)
        m_re = _pmean(t.re.mean(), axis_name)
        m_im = _pmean(t.im.mean(), axis_name)
        rank1 = jax.tree_util.tree_map(
            lambda ore, oim: ore * m_re + oim * m_im, obar_re, obar_im
        )
        return jax.tree_util.tree_map(
            lambda a, b, vi: a - b + diag_shift * vi, jtv, rank1, v
        )

    return matvec


def materialize_jacobian(log_psi_fn, params, s: Array,
                         chunk_size: Optional[int] = None,
                         with_im: bool = True
                         ) -> Tuple[Array, Optional[Array], Callable]:
    """Centered score matrices (J_re, J_im) [M, P] + the unravel fn.

    One vmapped backward pass per component (re, im); optionally chunked
    over samples with lax.map to bound peak memory. ``with_im=False`` skips
    the imaginary block entirely (returns None) — for models whose
    log-amplitude is guaranteed real, J_im is identically zero, and carrying
    it doubles the Jacobian HBM and wastes one [M, P] matmul per matvec
    (VERDICT r1 weak item 7).
    """
    flat0, unravel = jax.flatten_util.ravel_pytree(params)

    def row(si):
        def f_re(p):
            return log_psi_fn(p, si[None, :]).re[0]

        def f_im(p):
            return log_psi_fn(p, si[None, :]).im[0]

        gr, _ = jax.flatten_util.ravel_pytree(jax.grad(f_re)(params))
        if not with_im:
            return (gr,)
        gi, _ = jax.flatten_util.ravel_pytree(jax.grad(f_im)(params))
        return gr, gi

    if chunk_size is None or chunk_size >= s.shape[0]:
        out = jax.vmap(row)(s)
    else:
        m = s.shape[0]
        if m % chunk_size:
            raise ValueError(f"chunk_size {chunk_size} must divide M={m}")
        chunks = s.reshape(m // chunk_size, chunk_size, -1)
        out = jax.lax.map(jax.vmap(row), chunks)
        out = tuple(j.reshape(m, -1) for j in out)
    if with_im:
        return out[0], out[1], unravel
    return out[0], None, unravel


class JacobianSOperator(NamedTuple):
    """Centered Jacobian pair + diag(S); matvec = two [M,P] matmuls
    (one when the model is real and oc_im is None)."""

    oc_re: Array  # [M, P] centered
    oc_im: Optional[Array]
    diag_s: Array  # [P] diagonal of the *global* S
    m_local: int
    axis_name: Optional[str]

    def matvec(self, v: Array, diag_shift: Array) -> Array:
        out = (self.oc_re @ v) @ self.oc_re
        if self.oc_im is not None:
            out = out + (self.oc_im @ v) @ self.oc_im
        out = _pmean(out / self.m_local, self.axis_name)
        return out + diag_shift * v


def make_jacobian_s(log_psi_fn, params, s: Array,
                    axis_name: Optional[str] = None,
                    chunk_size: Optional[int] = None,
                    with_im: bool = True) -> JacobianSOperator:
    j_re, j_im, _ = materialize_jacobian(log_psi_fn, params, s, chunk_size,
                                         with_im=with_im)
    m = s.shape[0]
    mean_re = _pmean(j_re.mean(axis=0), axis_name)
    oc_re = j_re - mean_re[None, :]
    diag_s = (oc_re * oc_re).mean(axis=0)
    oc_im = None
    if j_im is not None:
        mean_im = _pmean(j_im.mean(axis=0), axis_name)
        oc_im = j_im - mean_im[None, :]
        diag_s = diag_s + (oc_im * oc_im).mean(axis=0)
    diag_s = _pmean(diag_s, axis_name)
    return JacobianSOperator(oc_re=oc_re, oc_im=oc_im, diag_s=diag_s,
                             m_local=m, axis_name=axis_name)


def resolve_solver(solver: str, m_total: int, n_params: int,
                   real_log_psi: bool) -> str:
    """Resolve solver='auto' to a concrete solver (build-time static).

    The cutover (VERDICT r1 weak item 8 — the distributed-minSR scaling
    plan): minSR solves the dual sample-space system, which is the right
    trade exactly when that system is the smaller one:

      parts * M_total <= P   ->  'minsr'     (parts = 1 real / 2 complex)
      otherwise              ->  'pcg'

    Cost model behind it, per step on an n-chip mesh:
      minsr: all_gather of the [parts*M_tot, P] scores = parts*M_tot*P
        floats over ICI, one [2M,2M] Gram + Cholesky (exact solve, no
        iteration count to tune), Gram memory (parts*M_tot)^2.
      pcg: no score gather, but cg_maxiter iterations x (two [M_loc, P]
        matmuls + one psum(P) latency-bound ICI round trip each); solve
        quality degrades when the iteration cap truncates (observed on
        the 10x10 flagship: pcg hit maxiter=200 every step, BASELINE.md).
    In the parts*M_tot <= P regime minSR's single gather moves fewer
    bytes than pcg's ~100+ psums AND the solve is exact; past it the
    Gram's quadratic memory growth dominates and pcg wins.
    """
    if solver != "auto":
        return solver
    parts = 1 if real_log_psi else 2
    return "minsr" if parts * m_total <= n_params else "pcg"


def _minsr_rows(op: JacobianSOperator, e_loc, axis_name):
    """Stacked (score rows, centered residual) for the sample-space solve.

    Real models drop the identically-zero im rows: Gram [M, M] not [2M, 2M].
    """
    if op.oc_im is None:
        return op.oc_re, e_loc.re - _pmean(e_loc.re.mean(), axis_name)
    o_local = jnp.concatenate([op.oc_re, op.oc_im], axis=0)
    eps_local = jnp.concatenate([
        e_loc.re - _pmean(e_loc.re.mean(), axis_name),
        e_loc.im - _pmean(e_loc.im.mean(), axis_name),
    ])
    return o_local, eps_local


def chol_or_eigh_solve(gram: Array, rhs: Array, shift: Array) -> Array:
    """Solve (gram) y = rhs for a shifted-PSD gram, NaN-proof.

    f32 Cholesky on an ill-conditioned Gram can hit a negative pivot
    from rounding and silently return NaN — observed in production on
    the 8x8 depth-12 GCNN rung (r3): forward/E_loc/Jacobian all finite,
    every recipe NaN'd in the first dispatch, and the failure was
    walker-set-dependent (one sweep moved the Gram across the f32 pivot
    edge). When the fast path comes back non-finite, fall back to an
    eigh-based solve with eigenvalues clipped at the shift (the exact
    regularized pseudo-solve; ~3x the FLOPs, paid only on trigger via
    lax.cond — both branches compile, one executes).
    """
    y = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(gram), rhs)

    def fallback(_):
        w, v = jnp.linalg.eigh(gram)
        w = jnp.maximum(w, jnp.maximum(shift, 1e-30))
        # w scales the EIGENVALUE axis: for a matrix rhs [n, k] the
        # projection v.T @ rhs is [n, k] and w must broadcast down
        # columns (w[:, None]), not across them.
        w_b = w[:, None] if rhs.ndim == 2 else w
        return v @ ((v.T @ rhs) / w_b)

    bad = jnp.logical_not(jnp.all(jnp.isfinite(y)))
    return jax.lax.cond(bad, fallback, lambda _: y, None)


def _minsr_delta(o_local: Array, eps_local: Array, shift: Array,
                 m_local: int, axis_name: Optional[str], assembly: str
                 ) -> Tuple[Array, Array]:
    """The sample-space (minSR) solve core: returns (delta [P], S·delta [P])
    with delta = O~^T (O~ O~^T / M + shift)^-1 eps / M — the push-through
    solution of (S + shift) delta = O~^T eps / M.
    """
    if axis_name is None:
        two_m = o_local.shape[0]
        m_total = m_local
        gram = (o_local @ o_local.T) / m_total
        gram = gram + shift * jnp.eye(two_m)
        y = chol_or_eigh_solve(gram, eps_local, shift)
        delta = (y @ o_local) / m_total  # [P]
        s_delta = (o_local.T @ (o_local @ delta)) / m_total
    elif assembly == "gather":
        # distributed minSR, gather assembly: ship the full score
        # matrix (2M_tot * P floats over ICI), split the Gram
        # compute by columns. Simple and fastest at moderate P;
        # peak memory O(2M_tot * P) per chip.
        o_full = jax.lax.all_gather(o_local, axis_name, axis=0,
                                    tiled=True)   # [2M_tot, P]
        eps = jax.lax.all_gather(eps_local, axis_name, axis=0,
                                 tiled=True)      # [2M_tot]
        m_total = m_local * jax.lax.axis_size(axis_name)
        two_m = o_full.shape[0]
        cols = (o_full @ o_local.T) / m_total  # [2M_tot, 2M_loc]
        gram = jax.lax.all_gather(cols, axis_name, axis=1, tiled=True)
        gram = gram + shift * jnp.eye(two_m)
        y = chol_or_eigh_solve(gram, eps, shift)
        delta = (y @ o_full) / m_total  # [P]
        s_delta = (o_full.T @ (o_full @ delta)) / m_total
    else:
        # 'ring' assembly (the P-scaling path): the [2M_tot, P]
        # score matrix is NEVER materialized — score shards hop
        # the ring (ppermute), each chip building its Gram block
        # row from the shard it currently holds. Same total ICI
        # bytes as the gather, but peak memory drops to
        # O(2M_loc * P + (2M_tot)^2): in minSR's P >> M regime
        # that is the difference between fitting and OOM.
        n_dev = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        m2 = o_local.shape[0]            # 2M_loc (M_loc real)
        m_total = m_local * n_dev
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def hop(r, carry):
            o_rot, row = carry
            src = (idx - r) % n_dev      # shard currently held
            block = o_local @ o_rot.T    # Gram block (idx, src)
            row = jax.lax.dynamic_update_slice(
                row, block, (0, src * m2))
            return jax.lax.ppermute(o_rot, axis_name, perm), row

        row0 = jnp.zeros((m2, m2 * n_dev), o_local.dtype)
        _, row = jax.lax.fori_loop(0, n_dev, hop, (o_local, row0))
        gram = jax.lax.all_gather(row / m_total, axis_name,
                                  axis=0, tiled=True)
        two_m = m2 * n_dev
        eps = jax.lax.all_gather(eps_local, axis_name, axis=0, tiled=True)
        gram = gram + shift * jnp.eye(two_m)
        y = chol_or_eigh_solve(gram, eps, shift)
        y_local = jax.lax.dynamic_slice(y, (idx * m2,), (m2,))
        delta = jax.lax.psum(y_local @ o_local, axis_name) / m_total
        s_delta = jax.lax.psum(
            o_local.T @ (o_local @ delta), axis_name) / m_total
    return delta, s_delta


# ---------------------------------------------------------------------------
# the SR transform
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True, eq=False)
class SR:
    """SR gradient transform plugged into the VMC step (SURVEY.md N7/N8).

    Args:
      solver: 'pcg' (Jacobi-preconditioned, materialized Jacobian; default),
        'cg' (matrix-free, O(P) memory), or 'dense' (Cholesky; small nets).
      diag_shift0 / diag_shift_decay / diag_shift_min: lambda schedule
        lambda(step) = max(shift0 * decay^step, shift_min).
      proportional_shift: if True the shift is lambda * mean(diag(S))
        (scale-invariant regularization; 'pcg'/'dense' only).
      cg_tol, cg_maxiter: iterative stopping criteria.
      jacobian_chunk: sample-chunking for the materialized Jacobian.
      real_log_psi: the model's log-amplitude is real for ALL parameter
        values (set by the builder from the config: real params, no odd
        spin-flip sector, A1 character, zero momentum). Skips the
        identically-zero J_im block: half the Jacobian HBM/matvec FLOPs,
        and the minSR Gram shrinks [2M,2M] -> [M,M] (4x memory, ~8x
        Cholesky FLOPs). The delta is bit-identical (tested) because zero
        score rows contribute nothing to any solver.
    """

    solver: str = "pcg"
    diag_shift0: float = 1.0
    diag_shift_decay: float = 0.95
    diag_shift_min: float = 1e-2
    proportional_shift: bool = False
    cg_tol: float = 1e-4
    cg_maxiter: int = 100
    jacobian_chunk: Optional[int] = None
    real_log_psi: bool = False
    #: distributed-minSR Gram assembly: 'gather' (all_gather the score
    #: matrix; fastest at moderate P) or 'ring' (ppermute score shards;
    #: never materializes [2M_tot, P] — the P-scaling path). Identical
    #: results (tested); single-device solves ignore it.
    minsr_assembly: str = "gather"
    #: SPRING momentum mu (minsr solver only; 0 = off). The previous natural
    #: gradient delta_{t-1} acts as the zero-regularization point:
    #:   delta_t = mu delta_{t-1}
    #:           + argmin_x ||O~ x - (eps - mu O~ delta_{t-1})||^2/M
    #:                      + shift ||x||^2,
    #: i.e. the momentum tail is corrected by the CURRENT step's residuals
    #: rather than blindly added (unlike heavy-ball SGD) — it reuses the
    #: information the regularized solve discarded. [Technique: Goldshlager,
    #: Abrahamsen & Lin, arXiv:2401.10190 "A Kaczmarz-inspired approach to
    #: accelerate the optimization of neural network wavefunctions".]
    #: Requires threading delta_{t-1} through TrainState (vmc.TrainState
    #: sr_aux); use via solve_spring.
    momentum: float = 0.0

    def diag_shift(self, step: Array) -> Array:
        return jnp.maximum(
            self.diag_shift0 * self.diag_shift_decay ** step,
            self.diag_shift_min,
        )

    def solve(
        self,
        log_psi_fn,
        params,
        s: Array,
        grads,
        step: Array,
        axis_name: Optional[str] = None,
        e_loc=None,
    ) -> Tuple[Any, Array, Array]:
        """Returns (natural_gradient pytree, iters, residual).

        ``e_loc`` (a C pair of local energies) is required by the 'minsr'
        solver, which works in sample space and needs the raw residuals
        rather than the already-contracted gradient.
        """
        shift = self.diag_shift(step)
        if self.solver == "minsr" and e_loc is None:
            raise ValueError("solver='minsr' needs e_loc")
        if self.solver == "cg":
            matvec = make_s_matvec(log_psi_fn, params, s, shift,
                                   axis_name=axis_name)
            r = cg(matvec, grads, tol=self.cg_tol, maxiter=self.cg_maxiter)
            return r.x, r.iters, r.residual

        op = make_jacobian_s(log_psi_fn, params, s, axis_name=axis_name,
                             chunk_size=self.jacobian_chunk,
                             with_im=not self.real_log_psi)

        if self.solver == "minsr":
            if self.proportional_shift:
                shift = shift * jnp.maximum(op.diag_s.mean(), 1e-12)
            o_local, eps_local = _minsr_rows(op, e_loc, axis_name)
            b, unravel = jax.flatten_util.ravel_pytree(grads)
            delta, s_delta = _minsr_delta(o_local, eps_local, shift,
                                          op.m_local, axis_name,
                                          self.minsr_assembly)
            # report the parameter-space residual ||(S+shift)d - F|| / ||F||
            s_delta = s_delta + shift * delta
            resid = jnp.linalg.norm(s_delta - b) / jnp.maximum(
                jnp.linalg.norm(b), 1e-30)
            return unravel(delta), jnp.zeros((), jnp.int32), resid
        if self.proportional_shift:
            shift = shift * jnp.maximum(op.diag_s.mean(), 1e-12)
        b, unravel = jax.flatten_util.ravel_pytree(grads)

        if self.solver == "pcg":
            inv_diag = 1.0 / (op.diag_s + shift)
            r = pcg_flat(lambda v: op.matvec(v, shift), b, inv_diag,
                         tol=self.cg_tol, maxiter=self.cg_maxiter)
            return unravel(r.x), r.iters, r.residual

        if self.solver == "dense":
            s_dense = op.oc_re.T @ op.oc_re
            if op.oc_im is not None:
                s_dense = s_dense + op.oc_im.T @ op.oc_im
            s_dense = s_dense / op.m_local
            s_dense = _pmean(s_dense, axis_name)
            p = b.shape[0]
            a = s_dense + shift * jnp.eye(p, dtype=b.dtype)
            x = chol_or_eigh_solve(a, b, shift)
            resid = jnp.linalg.norm(a @ x - b) / jnp.maximum(
                jnp.linalg.norm(b), 1e-30)
            return unravel(x), jnp.zeros((), jnp.int32), resid

        raise ValueError(f"unknown solver {self.solver!r}")

    def solve_spring(
        self,
        log_psi_fn,
        params,
        s: Array,
        grads,
        step: Array,
        delta_prev: Array,
        axis_name: Optional[str] = None,
        e_loc=None,
    ) -> Tuple[Any, Array, Array, Array]:
        """The SPRING update (momentum > 0, minsr solver only).

        Returns (delta pytree, iters, residual, new flat delta [P] to carry
        as TrainState.sr_aux). ``delta_prev`` is the previous step's flat
        natural gradient (zeros at step 0). The solved system satisfies
        (S + shift) delta = F + shift * mu * delta_prev — at mu=0 this is
        exactly ``solve``; the residual is reported against that rhs.
        """
        if self.solver != "minsr":
            raise ValueError("SPRING momentum requires solver='minsr' "
                             f"(got {self.solver!r})")
        if e_loc is None:
            raise ValueError("solve_spring needs e_loc")
        mu = jnp.asarray(self.momentum, jnp.float32)
        shift = self.diag_shift(step)
        op = make_jacobian_s(log_psi_fn, params, s, axis_name=axis_name,
                             chunk_size=self.jacobian_chunk,
                             with_im=not self.real_log_psi)
        if self.proportional_shift:
            shift = shift * jnp.maximum(op.diag_s.mean(), 1e-12)
        o_local, eps_local = _minsr_rows(op, e_loc, axis_name)
        b, unravel = jax.flatten_util.ravel_pytree(grads)

        # momentum tail: t = O~ (mu delta_prev) per local row; its projection
        # S (mu delta_prev) = psum(O~^T t)/M is reused for the residual
        t = o_local @ (mu * delta_prev)
        eps_prime = eps_local - t
        # S (mu delta_prev) = mean over all rows of O~^T t: per-shard mean
        # then pmean (shards are equal-sized)
        s_mu = _pmean((o_local.T @ t) / op.m_local, axis_name)

        x, s_x = _minsr_delta(o_local, eps_prime, shift, op.m_local,
                              axis_name, self.minsr_assembly)
        delta = x + mu * delta_prev
        b_spring = b + shift * mu * delta_prev
        lhs = s_x + s_mu + shift * delta
        resid = jnp.linalg.norm(lhs - b_spring) / jnp.maximum(
            jnp.linalg.norm(b_spring), 1e-30)
        return unravel(delta), jnp.zeros((), jnp.int32), resid, delta
