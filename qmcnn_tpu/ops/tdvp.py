"""Time-dependent variational principle (t-VMC): real- and imaginary-time
evolution of the variational state on the ansatz manifold.

Beyond reference parity (the reference is a ground-state-only VMC code,
SURVEY.md §0.1): this module adds the standard NQS dynamics capability
[technique: Carleo & Troyer, Science 355:602 (2017), Sec. "Unitary
Dynamics"; McLachlan variational principle for real parameters].

Math (real parameters theta — all qmcnn_tpu params are real float32, complex
weights being (re, im) leaf pairs, ops/cplx.py):

  O_k(s)  = d log psi / d theta_k = J_re + i J_im        (per-sample scores)
  dE(s)   = E_loc(s) - <E>_w                              (centered residual)
  S       = Re<Oc* Oc>_w   (the quantum geometric tensor's real part)
  F       = <Oc* dE>_w

  imaginary time  d theta/d tau = -S^{-1} Re[F]    (gradient flow; the SR
                                                    step with lr = d tau)
  real time       d theta/d t   = +S^{-1} Im[F]    (from minimizing
                       || sum_k O_k thetadot_k psi + i H psi ||^2 over real
                       thetadot: S thetadot = -Re[i <Oc* dE>] = Im[F])

With the sqrt-weighted stacked score matrix O~ = [sqrt(w) Oc_re;
sqrt(w) Oc_im] (rows 2M), both right-hand sides are O~^T eps for a residual
vector eps built from dE, and the regularized solve

  thetadot = (O~^T O~ + lam)^{-1} O~^T eps = O~^T (O~ O~^T + lam)^{-1} eps

admits the same sample-space (minSR) push-through as sr.py 'minsr'
[Rende et al., arXiv:2310.05715] — exact, and the right trade for P >> M.

Weights: estimators take explicit normalized weights w (sum_global = 1), so
the same code serves
  * MC mode      — w = 1/M_total uniform over Metropolis/direct samples, and
  * full-sum mode — w = |psi(s)|^2 / Z over an enumerated basis (exact
    expectations, no MC noise; N <= ~16 or the S^z=0 sector), the
    deterministic path used by the dynamics tests and tiny-system debugging.

The TDVP error epsilon^2 = ||sum_k O_k thetadot_k - target||^2_w /
||target||^2_w (target = -dE resp. -i dE) is returned every step: it is the
exact measure of how well the manifold carries the flow (0 = exact
evolution), the standard t-VMC fidelity diagnostic.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.ops.local_energy import local_energy
from qmcnn_tpu.sr import chol_or_eigh_solve, materialize_jacobian

Array = jax.Array


def _psum(x, axis_name: Optional[str]):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


# ---------------------------------------------------------------------------
# full-summation (exact) sample sets
# ---------------------------------------------------------------------------

def all_states(n_sites: int, sz_zero: bool = False) -> np.ndarray:
    """Enumerate the full computational basis (host-side, static).

    [D, n_sites] int arrays of +-1 spins; ``sz_zero`` restricts to the
    sum(s)=0 sector (Heisenberg/J1-J2 ground-state sector). D = 2^N or
    binom(N, N/2) — keep N <= ~16 (or ~18 in-sector).
    """
    if n_sites > 24:
        raise ValueError(f"full summation over 2^{n_sites} states is "
                         f"intractable — use MC sampling")
    from qmcnn_tpu.ops import exact

    s = exact.all_configs(n_sites)  # ED basis order (ops/exact.py)
    if sz_zero:
        if n_sites % 2:
            raise ValueError("sz0 sector needs an even number of sites")
        s = s[s.sum(axis=1) == 0]
    return s


def state_weights(log_psi_fn, params, s: Array) -> Array:
    """Normalized Born weights |psi(s)|^2 / Z over an enumerated basis."""
    lp = log_psi_fn(params, s)
    return jax.nn.softmax(2.0 * lp.re)


def expectation(log_psi_fn, params, op, s: Array, weights: Array,
                axis_name: Optional[str] = None,
                chunk_size: Optional[int] = None) -> C:
    """<psi|op|psi>/<psi|psi> estimated as sum_s w_s * op_loc(s).

    ``op`` is any Hamiltonian-like object (diag_batch / connected_batch /
    n_conn) — observables are operators, same enumeration machinery
    (SURVEY.md R5).
    """
    lp = log_psi_fn(params, s)
    o_loc = local_energy(log_psi_fn, params, op, s, lp,
                         chunk_size=chunk_size)
    return C(_psum((weights * o_loc.re).sum(), axis_name),
             _psum((weights * o_loc.im).sum(), axis_name))


# ---------------------------------------------------------------------------
# the TDVP right-hand side
# ---------------------------------------------------------------------------

class TDVPResult(NamedTuple):
    theta_dot: Any       # pytree matching params
    energy: C            # scalar pair <E>_w
    e_var: Array         # <|dE|^2>_w
    tdvp_error: Array    # epsilon^2 in [0, 1]: manifold projection error
    residual: Array      # ||(S+lam) thetadot - b|| / ||b|| (solver check)


@dataclasses.dataclass(frozen=True, eq=False)
class TDVP:
    """The projected flow d theta = rhs(theta, samples) for one Hamiltonian.

    Args:
      log_psi_fn: (params, s [B, N]) -> C [B].
      ham: Hamiltonian (ops/hamiltonians.py).
      mode: 'imag' (gradient flow to the ground state) | 'real' (unitary
        quench dynamics; needs an ansatz that can carry phases — complex
        params).
      solver: 'dense' ([P, P] Cholesky; exact, small nets) | 'minsr'
        (sample-space [2M, 2M] Cholesky; exact, P >> M).
      diag_shift: Tikhonov regularization lam. TDVP is solved at fixed lam
        (no schedule — dynamics must not change character over time).
      with_im: materialize the J_im score block. Required for mode='real'
        and for any model with complex output; False halves the Jacobian
        for provably-real models in imaginary time (cf. sr.real_log_psi).
      jacobian_chunk: sample-chunking for the Jacobian backward pass.
      chunk_size: walker chunking for the local-energy forward.
    """

    log_psi_fn: Callable[..., C]
    ham: Any
    mode: str = "imag"
    solver: str = "minsr"
    diag_shift: float = 1e-4
    with_im: bool = True
    jacobian_chunk: Optional[int] = None
    chunk_size: Optional[int] = None
    axis_name: Optional[str] = None

    def __post_init__(self):
        if self.mode not in ("imag", "real"):
            raise ValueError(f"unknown TDVP mode {self.mode!r}")
        if self.solver not in ("dense", "minsr"):
            raise ValueError(f"unknown TDVP solver {self.solver!r}")
        if self.mode == "real" and not self.with_im:
            raise ValueError("real-time TDVP needs the imaginary score "
                             "block (with_im=True): a real-log-psi manifold "
                             "cannot carry phases, Im[F] would be 0")

    def rhs(self, params, s: Array, weights: Array) -> TDVPResult:
        """One TDVP solve at the given (samples, weights)."""
        ax = self.axis_name
        lp = self.log_psi_fn(params, s)
        e_loc = local_energy(self.log_psi_fn, params, self.ham, s, lp,
                             chunk_size=self.chunk_size)
        e_mean = C(_psum((weights * e_loc.re).sum(), ax),
                   _psum((weights * e_loc.im).sum(), ax))
        de = e_loc - e_mean
        e_var = _psum((weights * de.abs2()).sum(), ax)

        j_re, j_im, unravel = materialize_jacobian(
            self.log_psi_fn, params, s, self.jacobian_chunk,
            with_im=self.with_im)
        # weighted centering
        mean_re = _psum((weights[:, None] * j_re).sum(0), ax)
        sw = jnp.sqrt(weights)[:, None]
        ow_re = sw * (j_re - mean_re[None, :])
        blocks = [ow_re]
        if j_im is not None:
            mean_im = _psum((weights[:, None] * j_im).sum(0), ax)
            blocks.append(sw * (j_im - mean_im[None, :]))
        o_t = jnp.concatenate(blocks, axis=0)  # [parts*M, P] sqrt-weighted

        swv = jnp.sqrt(weights)
        if self.mode == "imag":
            eps = [-swv * de.re]
            if j_im is not None:
                eps.append(-swv * de.im)
        else:
            eps = [swv * de.im, -swv * de.re]
        eps = jnp.concatenate(eps)  # [parts*M]

        shift = jnp.asarray(self.diag_shift, o_t.dtype)
        if self.solver == "dense":
            s_mat = o_t.T @ o_t
            b = o_t.T @ eps
            s_mat = _psum(s_mat, ax)
            b = _psum(b, ax)
            p = b.shape[0]
            a = s_mat + shift * jnp.eye(p, dtype=b.dtype)
            x = chol_or_eigh_solve(a, b, shift)
            s_dot = s_mat @ x
            resid = jnp.linalg.norm(a @ x - b) / jnp.maximum(
                jnp.linalg.norm(b), 1e-30)
            b_dot = x @ b
        else:  # minsr
            if ax is None:
                o_full, eps_full = o_t, eps
            else:
                o_full = jax.lax.all_gather(o_t, ax, axis=0, tiled=True)
                eps_full = jax.lax.all_gather(eps, ax, axis=0, tiled=True)
            rows = o_full.shape[0]
            gram = o_full @ o_full.T + shift * jnp.eye(rows, dtype=o_t.dtype)
            y = chol_or_eigh_solve(gram, eps_full, shift)
            x = y @ o_full                       # theta_dot [P]
            b = o_full.T @ eps_full
            s_dot = o_full.T @ (o_full @ x)
            resid = jnp.linalg.norm(s_dot + shift * x - b) / jnp.maximum(
                jnp.linalg.norm(b), 1e-30)
            b_dot = x @ b

        # epsilon^2 = (||target||^2 - 2 x.b + x.S.x) / ||target||^2,
        # ||target||^2_w = <|dE|^2>_w for both modes (|i dE| = |dE|)
        err = (e_var - 2.0 * b_dot + x @ s_dot) / jnp.maximum(e_var, 1e-30)
        return TDVPResult(theta_dot=unravel(x), energy=e_mean, e_var=e_var,
                          tdvp_error=jnp.clip(err, 0.0), residual=resid)

    # -- integrators --------------------------------------------------------

    def step_euler(self, params, dt: float, s: Array, weights: Array
                   ) -> Tuple[Any, TDVPResult]:
        r = self.rhs(params, s, weights)
        new = jax.tree_util.tree_map(
            lambda p, d: p + dt * d, params, r.theta_dot)
        return new, r

    def step_heun(self, params, dt: float, s: Array, weights: Array,
                  resample: Optional[Callable] = None
                  ) -> Tuple[Any, TDVPResult]:
        """Heun (explicit trapezoid, 2nd order).

        ``resample(params) -> (s, weights)`` refreshes the sample set at the
        predictor point — exact reweighting in full-sum mode, a fresh
        sampler draw in MC mode. None reuses (s, weights) for stage 2
        (cheaper; formally degrades the stage-2 estimator to O(dt), fine
        when samples change slowly).
        """
        r1 = self.rhs(params, s, weights)
        pred = jax.tree_util.tree_map(
            lambda p, d: p + dt * d, params, r1.theta_dot)
        if resample is not None:
            s2, w2 = resample(pred)
        else:
            s2, w2 = s, weights
        r2 = self.rhs(pred, s2, w2)
        new = jax.tree_util.tree_map(
            lambda p, d1, d2: p + 0.5 * dt * (d1 + d2),
            params, r1.theta_dot, r2.theta_dot)
        return new, r1
