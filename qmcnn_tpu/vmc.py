"""The VMC driver: estimators, gradient, and the jitted training step
(SURVEY.md L4, R5-R10 / N6, N8; call stacks section 3.1 and 3.4).

One training step (all on device, one host dispatch):
  sample -> local energy -> covariance gradient (surrogate loss) ->
  [optional stochastic reconfiguration] -> optax update -> refreshed state.

Gradient convention (real parameters — all params are real float32 pairs,
see ops/cplx.py): F_k = Re[<O_k* dE>] with O_k = d log psi / d theta_k and
dE = E_loc - <E>, obtained as jax.grad of the surrogate loss
  L = mean(Re[conj(dE) * log psi]) .
The true energy derivative is 2F; the factor is absorbed into the learning
rate (documented here so lr comparisons with the literature are off by 2x).

Distribution (SURVEY.md P1/P2): every estimator mean is wrapped in
``pmean(axis_name)`` — with axis_name=None the wrapper is the identity
(single-device path); under shard_map over the walker mesh axis it becomes a
psum-over-ICI. The SR conjugate-gradient matvec uses the same hook.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax


from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.ops.local_energy import local_energy
from qmcnn_tpu.sampler.metropolis import MetropolisSampler, WalkerState

Array = jax.Array


def pmean(x, axis_name: Optional[str]):
    """Mean over the walker mesh axis; identity when not distributed."""
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def pmean_c(z: C, axis_name: Optional[str]) -> C:
    return C(pmean(z.re, axis_name), pmean(z.im, axis_name))


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    walkers: WalkerState
    step: Array  # int32 scalar
    #: SPRING momentum carry (sr.momentum > 0): the previous step's flat
    #: natural gradient [P]. None (an empty pytree slot — absent from
    #: checkpoints, so pre-SPRING checkpoints stay loadable) when unused.
    sr_aux: Any = None
    #: Polyak/EMA parameter average (optimizer.ema_decay > 0): a params-
    #: shaped pytree updated as ema <- d*ema + (1-d)*params after every
    #: optimizer step. The EMA state averages out the O(1/sqrt(M)) MC
    #: noise that SGD/SR injects into the parameters each step — the
    #: standard variational tail-averaging trick. Evaluated via
    #: ``measure --ema``. None (empty subtree, checkpoint-compatible with
    #: pre-EMA runs) when disabled.
    ema: Any = None


class StepMetrics(NamedTuple):
    """Per-step scalar metrics (replicated across devices after pmean)."""

    energy_re: Array
    energy_im: Array
    energy_var: Array
    accept_rate: Array
    grad_norm: Array
    sr_iters: Array      # 0 when SR disabled
    sr_residual: Array   # 0.0 when SR disabled
    overlap: Array       # sum_k F_k vs frozen states; 0.0 when no penalty


def sector_energy_and_grad(
    log_psi_fn,
    ham,
    params,
    walkers: WalkerState,
    lattice_shape,
    momentum,
    kappa: float = 0.0,
    axis_name: Optional[str] = None,
    chunk_size: Optional[int] = None,
):
    """Momentum-sector Rayleigh-quotient gradient under |psi|^2 sampling.

    The r4 (pi,pi) refutation (BASELINE.md r4) showed that OPTIMIZING a
    translation-projected net fails because sampling |P psi|^2 places
    walkers near nodal singularities where E_loc and score variances
    diverge. This is the named fix, completed for TRAINING: minimize

        E_q(theta) = <psi|H P_q|psi> / <psi|P_q|psi>

    (the Rayleigh quotient of the projected state, since P^2 = P and
    [H, P] = 0) with every expectation taken under the UNPROJECTED
    |psi|^2 distribution. With nhat(s) = (H P psi)(s)/psi(s) and
    what(s) = (P psi)(s)/psi(s) — both bounded sums of amplitude ratios
    (ops/observables.sector_energy_ratio) — and N = E[nhat], D = E[what]:

        d/dtheta* E_q = (1/D) E[ O* (nhat - E_q what) ]

    (the E[O*] terms cancel exactly, same covariance structure as the
    ground-state gradient), so the whole machinery reduces to an
    EFFECTIVE local energy

        e_eff(s) = (nhat - E_q what - kappa (what - D)) / D

    fed through the standard surrogate loss and (as raw residuals) into
    minSR/SPRING. The optional kappa term is the gradient of
    -kappa log D: it drives sector weight D toward 1, which both targets
    the in-sector state and repairs the 1/D variance amplification when
    the warm start barely overlaps the sector. E[e_eff] = 0 analytically;
    the batch mean is still subtracted as a control variate.

    Returns (e_q C, resid_var, grads, e_eff C[M], weight |D|).
    """
    from qmcnn_tpu.ops.observables import sector_energy_ratio

    t_trans = 1
    for d in lattice_shape:
        t_trans *= int(d)
    m = walkers.s.shape[0]
    sec_chunk = None
    if chunk_size is not None:
        # the projector multiplies the connected-state working set by T:
        # scale the HBM-bounding chunk down accordingly (largest divisor)
        sec_chunk = max(1, chunk_size // t_trans)
        while m % sec_chunk:
            sec_chunk -= 1
    num, den = sector_energy_ratio(
        log_psi_fn, params, walkers.s, walkers.log_psi, ham,
        tuple(lattice_shape), tuple(momentum), chunk_size=sec_chunk)
    n_mean = pmean_c(num.mean(), axis_name)
    d_mean = pmean_c(den.mean(), axis_name)
    e_q = n_mean / d_mean
    e_eff = (num - e_q * den - kappa * (den - d_mean)) / d_mean
    eff_mean = pmean_c(e_eff.mean(), axis_name)  # 0 in expectation
    resid_var = pmean((e_eff - eff_mean).abs2().mean(), axis_name)
    centered = e_eff - eff_mean
    delta = jax.lax.stop_gradient(centered)

    def loss_fn(p):
        lp = log_psi_fn(p, walkers.s)
        return jnp.mean(delta.re * lp.re + delta.im * lp.im)

    grads = jax.grad(loss_fn)(params)
    grads = jax.tree_util.tree_map(lambda g: pmean(g, axis_name), grads)
    weight = jnp.sqrt(d_mean.abs2())
    return e_q, resid_var, grads, centered, weight


def energy_and_grad(
    log_psi_fn,
    ham,
    params,
    walkers: WalkerState,
    axis_name: Optional[str] = None,
    chunk_size: Optional[int] = None,
    deflate: Optional[tuple] = None,
):
    """(e_mean C, e_var, grads pytree, e_loc C[M], overlap) from the walkers.

    ``deflate``: optional (frozen_states, c) — fold the exact deflation
    projector c * sum_k |psi_k><psi_k| into the local energy
    (ops/penalty.deflation_e_loc), so the covariance gradient AND the
    sample-space SR residuals optimize the deflated operator
    H + c P natively. The REPORTED e_mean/e_var stay the physical <H>
    statistics (the excited-state number a run is after); centering for
    the gradient uses the deflated mean, as the deflated Rayleigh
    quotient requires. ``overlap`` is the two-chain sum_k F_k
    (0.0 when deflate is None).
    """
    e_loc = local_energy(log_psi_fn, params, ham, walkers.s, walkers.log_psi,
                         chunk_size=chunk_size)
    e_mean = pmean_c(e_loc.mean(), axis_name)
    e_var = pmean((e_loc - e_mean).abs2().mean(), axis_name)
    overlap = jnp.zeros(())
    if deflate is not None:
        from qmcnn_tpu.ops.penalty import deflation_e_loc

        frozen, c = deflate
        d_loc, overlap = deflation_e_loc(
            log_psi_fn, params, walkers.s, walkers.log_psi, frozen,
            axis_name=axis_name, chunk_size=chunk_size)
        e_loc = e_loc + d_loc * c
    e_mean_a = (pmean_c(e_loc.mean(), axis_name) if deflate is not None
                else e_mean)
    centered = e_loc - e_mean_a  # broadcasts the scalar pair over [M]
    delta = jax.lax.stop_gradient(centered)

    def loss_fn(p):
        lp = log_psi_fn(p, walkers.s)
        # L = mean Re[conj(dE) log psi]  ->  grad = Re[<O* dE>]
        return jnp.mean(delta.re * lp.re + delta.im * lp.im)

    grads = jax.grad(loss_fn)(params)
    grads = jax.tree_util.tree_map(lambda g: pmean(g, axis_name), grads)
    return e_mean, e_var, grads, e_loc, overlap


@dataclasses.dataclass(frozen=True, eq=False)
class VMC:
    """Binds model/hamiltonian/sampler/optimizer into a pure train step.

    The returned ``step(state, key, walker_ids) -> (state, metrics)`` is a
    pure function of its inputs; jit it directly (single device) or wrap in
    shard_map via :mod:`qmcnn_tpu.parallel` (then ``axis_name='dp'``).
    """

    log_psi_fn: Callable[..., C]
    ham: Any
    sampler: MetropolisSampler
    optimizer: optax.GradientTransformation
    n_sweeps: int = 1
    sr: Optional[Any] = None          # qmcnn_tpu.sr.SR instance or None
    axis_name: Optional[str] = None
    chunk_size: Optional[int] = None
    #: excited-state targeting (ops/penalty.py): frozen (log_psi_fn_k,
    #: params_k) states to stay orthogonal to, and the penalty weight
    #: (choose beta above the expected energy gap)
    penalty_states: tuple = ()
    penalty_beta: float = 0.0
    #: exact deflation H + c sum_k |psi_k><psi_k| folded into e_loc
    #: (ops/penalty.deflation_e_loc; c > E1 - E0). When > 0 it REPLACES
    #: the additive beta-penalty gradient — the metric-compatible
    #: excited-state path (works under minSR/SPRING, unlike the penalty)
    deflate_c: float = 0.0
    #: momentum-sector targeting (sector_energy_and_grad): optimize the
    #: Rayleigh quotient of P_q psi with bounded ratio estimators under
    #: |psi|^2 — the metric-compatible route to E(q) that the projected-
    #: net approach (model.momentum) cannot reach (BASELINE.md r4
    #: (pi,pi) refutation). Needs lattice_shape; incompatible with
    #: deflate/penalty (both redefine e_loc). The ansatz must NOT be
    #: translation-invariant (a spatial-sum CNN has zero q != 0 weight).
    sector_momentum: Optional[tuple] = None
    sector_kappa: float = 0.0
    lattice_shape: Optional[tuple] = None
    #: Polyak/EMA averaging of params (0 = off); see TrainState.ema
    ema_decay: float = 0.0

    def init_state(self, key: Array, n_walkers: int, params) -> TrainState:
        walkers = self.sampler.init_state(params, key, n_walkers)
        sr_aux = None
        if self.sr is not None and getattr(self.sr, "momentum", 0.0) > 0:
            flat, _ = jax.flatten_util.ravel_pytree(params)
            sr_aux = jnp.zeros_like(flat)
        ema = None
        if self.ema_decay > 0:
            ema = jax.tree_util.tree_map(jnp.array, params)
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            walkers=walkers,
            step=jnp.zeros((), jnp.int32),
            sr_aux=sr_aux,
            ema=ema,
        )

    def step(self, state: TrainState, key: Array, walker_ids: Array):
        params = state.params
        walkers = self.sampler.reset_counters(state.walkers)
        walkers = self.sampler.refresh(params, walkers)
        walkers = self.sampler.sample(params, walkers, key, walker_ids,
                                      n_sweeps=self.n_sweeps)
        # with parallel tempering only the beta=1 replica is distributed as
        # |psi|^2 — every estimator below sees the physical chain only
        phys = self.sampler.physical(walkers)
        deflate = ((self.penalty_states, self.deflate_c)
                   if self.penalty_states and self.deflate_c > 0 else None)
        if self.sector_momentum is not None:
            # sector mode: the effective local energy (nhat - E_q what)/D
            # replaces e_loc everywhere downstream — surrogate gradient
            # AND minSR/SPRING residuals. Reported energy = E_q; the
            # overlap metric slot carries the sector weight |<P_q>|.
            e_mean, e_var, grads, e_loc, overlap = sector_energy_and_grad(
                self.log_psi_fn, self.ham, params, phys,
                self.lattice_shape, self.sector_momentum,
                kappa=self.sector_kappa,
                axis_name=self.axis_name, chunk_size=self.chunk_size,
            )
        else:
            e_mean, e_var, grads, e_loc, overlap = energy_and_grad(
                self.log_psi_fn, self.ham, params, phys,
                axis_name=self.axis_name, chunk_size=self.chunk_size,
                deflate=deflate,
            )
        if self.penalty_states and deflate is None:
            from qmcnn_tpu.ops.penalty import penalty_value_and_grad

            overlap, pen_grads = penalty_value_and_grad(
                self.log_psi_fn, params, phys.s, self.penalty_states,
                self.penalty_beta, axis_name=self.axis_name)
            grads = jax.tree_util.tree_map(jnp.add, grads, pen_grads)
        sr_iters = jnp.zeros((), jnp.int32)
        sr_residual = jnp.zeros(())
        sr_aux = state.sr_aux
        if self.sr is not None:
            if sr_aux is not None:
                grads, sr_iters, sr_residual, sr_aux = self.sr.solve_spring(
                    self.log_psi_fn, params, phys.s, grads, state.step,
                    sr_aux, axis_name=self.axis_name, e_loc=e_loc,
                )
            else:
                grads, sr_iters, sr_residual = self.sr.solve(
                    self.log_psi_fn, params, phys.s, grads, state.step,
                    axis_name=self.axis_name, e_loc=e_loc,
                )
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   params)
        params = optax.apply_updates(params, updates)
        ema = state.ema
        if self.ema_decay > 0 and ema is not None:
            d = self.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema, params)
        acc = pmean(MetropolisSampler.acceptance_rate(walkers),
                    self.axis_name)
        gnorm = optax.global_norm(grads)
        metrics = StepMetrics(
            energy_re=e_mean.re, energy_im=e_mean.im, energy_var=e_var,
            accept_rate=acc, grad_norm=gnorm,
            sr_iters=sr_iters, sr_residual=sr_residual,
            overlap=overlap,
        )
        new_state = TrainState(params=params, opt_state=opt_state,
                               walkers=walkers, step=state.step + 1,
                               sr_aux=sr_aux, ema=ema)
        return new_state, metrics

    def thermalize(self, state: TrainState, key: Array, walker_ids: Array,
                   n_sweeps: int) -> TrainState:
        walkers = self.sampler.refresh(state.params, state.walkers)
        walkers = self.sampler.sample(state.params, walkers, key, walker_ids,
                                      n_sweeps=n_sweeps)
        return state._replace(walkers=walkers)

    def run_steps(self, state: TrainState, base_key: Array,
                  walker_ids: Array, n_steps: int):
        """n_steps training steps in ONE compiled program (lax.scan).

        Amortizes the host-dispatch round trip (the axon TPU tunnel costs
        ~30 ms per call) and keeps the device busy; the per-step key is
        derived on device as fold_in(base_key, state.step), so chunking
        (e.g. 100 = 4x25) does not change the random streams and resume
        stays reproducible. Returns (state, metrics stacked over steps).
        """

        def body(st, _):
            key = jax.random.fold_in(base_key, st.step)
            return self.step(st, key, walker_ids)

        return jax.lax.scan(body, state, None, length=n_steps)
