"""Metropolis-Hastings sampler over |psi(s)|^2 (SURVEY.md R3/N3).

TPU-native design: M walkers advance in lock-step on the leading axis; each
sweep is a ``lax.scan`` over ``sweep_size`` proposal steps; every proposal
evaluates the CNN log-amplitude on the full walker batch (one MXU-friendly
forward per step). All shapes static; accept/reject via ``jnp.where`` masks.

Proposal kernels (reference parity + one upgrade):
  * ``flip``     — single-spin flip (TFIM; SURVEY.md R3a)
  * ``exchange`` — swap the spins of a random lattice bond (SURVEY.md R3b).
    Aligned bonds propose the identity (symmetric, detailed balance intact);
    anti-aligned swaps flip both spins. Conserves total S^z, keeping walkers
    in the S^z = 0 sector for Heisenberg/J1-J2.
  * ``exchange_anti`` — propose uniformly among the ANTI-ALIGNED bonds only
    with the Hastings correction n_anti(s)/n_anti(s'): every proposal is a
    real move (no forward passes wasted on identity proposals; ~+31%% real
    moves per proposal measured on the 10x10 flagship).

Determinism / distribution (SURVEY.md P1): the random stream of walker w is
derived by folding the *global* walker id into the step key, so a run sharded
over n devices is walker-for-walker identical to a single-device run — the
basis of the n-vs-1 device equivalence test.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.ops.cplx import C

Array = jax.Array
LogPsiFn = Callable[..., C]  # (params, s [B, N]) -> C [B]


class WalkerState(NamedTuple):
    """Per-walker MCMC state (a pytree; shardable on the walker axis)."""

    s: Array        # [M, N] float32 in {-1, +1}
    log_psi: C      # [M] pair
    n_accept: Array  # [M] int32, proposals accepted since last reset
    n_prop: Array    # [M] int32, proposals attempted since last reset


def init_walkers(
    key: Array,
    n_walkers: int,
    n_sites: int,
    sector: Optional[str] = None,
) -> Array:
    """Random initial configurations [n_walkers, n_sites].

    sector=None: i.i.d. uniform spins. sector='sz0': exactly half up/half
    down per walker (the S^z = 0 sector the exchange move preserves).
    """
    if sector is None:
        return (
            2.0 * jax.random.bernoulli(key, 0.5, (n_walkers, n_sites)) - 1.0
        ).astype(jnp.float32)
    if sector == "sz0":
        # minimal-|S^z| sector: S^z = 0 for even N, +1/2 for odd N (the
        # AFM ground-state sector either way; exchange moves preserve it —
        # unlocks odd-site lattices like the 27-site kagome 3x3-cell grid)
        n_up = n_sites // 2 + (n_sites % 2)
        base = jnp.concatenate(
            [jnp.ones(n_up), -jnp.ones(n_sites - n_up)]
        ).astype(jnp.float32)
        keys = jax.random.split(key, n_walkers)
        return jax.vmap(lambda k: jax.random.permutation(k, base))(keys)
    raise ValueError(f"unknown sector {sector!r}")


def _propose_flip(s: Array, key: Array, n_sites: int) -> Array:
    """Flip one uniformly random site per walker. s: [M, N]."""
    m = s.shape[0]
    sites = jax.vmap(lambda k: jax.random.randint(k, (), 0, n_sites))(key)
    flip = 1.0 - 2.0 * (jnp.arange(n_sites)[None, :] == sites[:, None])
    return s * flip


def _bond_onehots(bonds: np.ndarray, n: int):
    """Static [n_bonds, N] one-hot site tables for gather-free lookups.

    TPU gathers are slow (~109 us/proposal measured at M=2048 on v5e);
    selecting bond endpoints via one-hot matmuls instead runs the whole
    proposal 2.6x faster with bit-identical semantics.
    """
    bonds = np.asarray(bonds)
    oh_i = np.zeros((len(bonds), n), np.float32)
    oh_j = np.zeros((len(bonds), n), np.float32)
    oh_i[np.arange(len(bonds)), bonds[:, 0]] = 1.0
    oh_j[np.arange(len(bonds)), bonds[:, 1]] = 1.0
    return oh_i, oh_j


def _propose_exchange(s: Array, key: Array, bonds: np.ndarray) -> Array:
    """Swap the spins of one uniformly random bond per walker.

    For an anti-aligned bond this flips both sites; for an aligned bond the
    proposal is the identity (always accepted, state unchanged).
    """
    m, n = s.shape
    n_bonds = len(bonds)
    b = jax.vmap(lambda k: jax.random.randint(k, (), 0, n_bonds))(key)
    oh_i, oh_j = _bond_onehots(bonds, n)
    sel = jax.nn.one_hot(b, n_bonds, dtype=jnp.float32)  # [M, n_bonds]
    mask_i = sel @ jnp.asarray(oh_i)  # [M, N], 1.0 at endpoint i
    mask_j = sel @ jnp.asarray(oh_j)
    s_i = jnp.sum(mask_i * s, axis=1, keepdims=True)
    s_j = jnp.sum(mask_j * s, axis=1, keepdims=True)
    anti = (s_i * s_j) < 0
    return jnp.where(((mask_i + mask_j) > 0) & anti, -s, s)


def _anti_mask(s: Array, bonds: Array) -> Array:
    """[M, n_bonds] bool: bond anti-aligned in each walker.

    Computed with one-hot matmuls (endpoint spin extraction) rather than
    gathers — see _bond_onehots.
    """
    oh_i, oh_j = _bond_onehots(np.asarray(bonds), s.shape[1])
    s_i = s @ jnp.asarray(oh_i).T  # [M, n_bonds]
    s_j = s @ jnp.asarray(oh_j).T
    return s_i * s_j < 0


def _propose_exchange_anti(s: Array, key: Array, bonds: Array):
    """Swap one bond chosen uniformly from the ANTI-ALIGNED bonds.

    Every proposal changes the state (no wasted forward passes on aligned
    bonds — ~2x effective mixing per forward at equilibrium), at the cost
    of an asymmetric proposal density q(s->s') = 1/n_anti(s). The Hastings
    correction log[n_anti(s)/n_anti(s')] is returned for the acceptance
    rule. If n_anti = 0 (impossible in the S^z=0 sector of a connected
    lattice, but guarded) the proposal is the identity.

    Returns (s_prop [M, N], log_correction [M]).
    """
    m, n = s.shape
    anti = _anti_mask(s, bonds)                      # [M, B]
    n_anti = anti.sum(axis=1)                        # [M]
    u = jax.vmap(lambda k: jax.random.uniform(k))(key)
    k_idx = jnp.floor(u * jnp.maximum(n_anti, 1)).astype(jnp.int32)
    k_idx = jnp.minimum(k_idx, jnp.maximum(n_anti - 1, 0))
    ranks = jnp.cumsum(anti, axis=1)                 # 1-based among anti
    sel = (anti & (ranks == (k_idx + 1)[:, None])).astype(jnp.float32)
    oh_i, oh_j = _bond_onehots(np.asarray(bonds), n)
    on_bond = (sel @ jnp.asarray(oh_i) + sel @ jnp.asarray(oh_j)) > 0
    valid = (n_anti > 0)[:, None]
    s_prop = jnp.where(on_bond & valid, -s, s)
    n_anti_new = _anti_mask(s_prop, bonds).sum(axis=1)
    log_corr = (jnp.log(jnp.maximum(n_anti, 1).astype(jnp.float32))
                - jnp.log(jnp.maximum(n_anti_new, 1).astype(jnp.float32)))
    return s_prop, jnp.where(n_anti > 0, log_corr, 0.0)


@dataclasses.dataclass(frozen=True, eq=False)
class MetropolisSampler:
    """Walker-batched Metropolis sampler bound to a log-amplitude function.

    Args:
      log_psi_fn: ``(params, s [B, N]) -> C [B]`` log-amplitudes.
      n_sites: number of lattice sites.
      move: 'flip' | 'exchange' | 'exchange_anti'.
      bonds: [n_bonds, 2] site pairs (required for exchange moves).
      sweep_size: proposals per sweep; defaults to n_sites.
    """

    log_psi_fn: LogPsiFn
    n_sites: int
    move: str = "flip"
    bonds: Optional[np.ndarray] = None
    sweep_size: Optional[int] = None
    #: 'xla' (lax.scan sweep, works for every model) or 'pallas' (fused
    #: VMEM-resident sweep kernel, real circulant-form CNNs only; makes
    #: identical Metropolis decisions — see kernels/metropolis_pallas.py).
    backend: str = "xla"
    lattice_shape: Optional[tuple] = None  # required for backend='pallas'
    pallas_block: int = 1024
    #: parallel tempering (replica exchange): a strictly decreasing ladder
    #: (1.0, b_1, ..., b_{R-1}] of exponents — replica r samples
    #: |psi|^{2 b_r}, so hot (small-b) replicas cross barriers a rugged
    #: frustrated |psi|^2 landscape puts in the physical chain's way.
    #: After every sweep, adjacent replicas swap CONFIGURATIONS with the
    #: standard replica-exchange acceptance (log psi values travel with
    #: the configs — no extra forwards). Only the b=1 replica (rows [::R],
    #: see ``physical``) feeds the estimators. None = plain Metropolis.
    betas: Optional[tuple] = None

    def __post_init__(self):
        if self.move not in ("flip", "exchange", "exchange_anti"):
            raise ValueError(f"unknown move {self.move!r}")
        if self.move.startswith("exchange") and self.bonds is None:
            raise ValueError("exchange moves require bonds")
        if self.backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.backend == "pallas":
            if self.lattice_shape is None:
                raise ValueError("backend='pallas' requires lattice_shape")
            if self.move == "exchange_anti":
                raise ValueError("backend='pallas' supports flip/exchange")
            if self.betas is not None:
                raise ValueError("tempering runs on the xla backend")
        if self.betas is not None:
            b = tuple(float(x) for x in self.betas)
            if len(b) < 2:
                raise ValueError("tempering needs >= 2 replicas "
                                 "(betas=None for plain Metropolis)")
            if b[0] != 1.0:
                raise ValueError(f"betas[0] must be 1.0 (the physical "
                                 f"chain), got {b[0]}")
            if any(x <= 0.0 or x > 1.0 for x in b):
                raise ValueError(f"betas must lie in (0, 1], got {b}")
            if any(b[i + 1] >= b[i] for i in range(len(b) - 1)):
                raise ValueError(f"betas must be strictly decreasing: {b}")

    @property
    def n_replicas(self) -> int:
        return len(self.betas) if self.betas is not None else 1

    @property
    def _sweep_size(self) -> int:
        return self.sweep_size or self.n_sites

    def _row_betas(self, n_rows: int) -> Array:
        """[n_rows] per-row exponent, replica-fastest layout."""
        return jnp.tile(jnp.asarray(self.betas, jnp.float32),
                        n_rows // self.n_replicas)

    def init_state(self, params, key: Array, n_walkers: int) -> WalkerState:
        """``n_walkers`` counts PHYSICAL walkers; with tempering the state
        holds n_walkers * n_replicas rows (replica-fastest: row i*R + r is
        walker i's replica r, so walker sharding keeps each walker's full
        ladder on one device)."""
        sector = "sz0" if self.move.startswith("exchange") else None
        rows = n_walkers * self.n_replicas
        s = init_walkers(key, rows, self.n_sites, sector=sector)
        return self.refresh(params, WalkerState(
            s=s,
            log_psi=C(jnp.zeros(rows), jnp.zeros(rows)),
            n_accept=jnp.zeros(rows, jnp.int32),
            n_prop=jnp.zeros(rows, jnp.int32),
        ))

    def physical(self, state: WalkerState) -> WalkerState:
        """The beta = 1 chain (rows [::R]) — what estimators consume.
        Identity when tempering is off."""
        if self.betas is None:
            return state
        r = self.n_replicas
        return jax.tree_util.tree_map(lambda x: x[::r], state)

    def refresh(self, params, state: WalkerState) -> WalkerState:
        """Recompute stored log psi (call after every parameter update)."""
        return state._replace(log_psi=self.log_psi_fn(params, state.s))

    def _proposal_step(self, params, state: WalkerState, keys: Array,
                       beta_rows: Optional[Array] = None) -> WalkerState:
        """One Metropolis proposal for every walker. keys: [M] key array.
        beta_rows: per-row tempering exponent (None = 1 everywhere)."""
        k_move, k_accept = jax.vmap(
            lambda k: tuple(jax.random.split(k, 2))
        )(keys)
        log_corr = 0.0
        if self.move == "flip":
            s_new = _propose_flip(state.s, k_move, self.n_sites)
        elif self.move == "exchange":
            s_new = _propose_exchange(state.s, k_move, self.bonds)
        else:  # exchange_anti: Hastings-corrected anti-aligned proposals
            s_new, log_corr = _propose_exchange_anti(
                state.s, k_move, self.bonds)
        log_psi_new = self.log_psi_fn(params, s_new)
        # accept with prob min(1, q(s'->s)/q(s->s') |psi'/psi|^{2 beta})
        # (the Hastings counting correction is beta-independent)
        beta = 1.0 if beta_rows is None else beta_rows
        log_ratio = beta * 2.0 * (log_psi_new.re - state.log_psi.re) \
            + log_corr
        u = jax.vmap(lambda k: jax.random.uniform(k))(k_accept)
        accept = jnp.log(u) < log_ratio  # [M] bool
        s = jnp.where(accept[:, None], s_new, state.s)
        log_psi = C(
            jnp.where(accept, log_psi_new.re, state.log_psi.re),
            jnp.where(accept, log_psi_new.im, state.log_psi.im),
        )
        return WalkerState(
            s=s,
            log_psi=log_psi,
            n_accept=state.n_accept + accept.astype(jnp.int32),
            n_prop=state.n_prop + 1,
        )

    def sample(
        self,
        params,
        state: WalkerState,
        step_key: Array,
        walker_ids: Array,
        n_sweeps: int,
    ) -> WalkerState:
        """Advance every walker by ``n_sweeps`` sweeps.

        step_key: scalar PRNG key for this sampling call (replicated across
        devices). walker_ids: [M] *global* walker indices — each walker's
        stream is fold_in(fold_in(step_key, t), walker_id) at proposal t, so
        results are independent of device sharding.
        """
        n_props = n_sweeps * self._sweep_size
        if self.backend == "pallas":
            return self._sample_pallas(params, state, step_key, walker_ids,
                                       n_props)
        if self.betas is not None:
            return self._sample_tempered(params, state, step_key, walker_ids,
                                         n_sweeps)

        def step(carry, t):
            st = carry
            k_t = jax.random.fold_in(step_key, t)
            keys = jax.vmap(lambda w: jax.random.fold_in(k_t, w))(walker_ids)
            return self._proposal_step(params, st, keys), ()

        state, _ = jax.lax.scan(step, state, jnp.arange(n_props))
        return state

    def _sample_tempered(self, params, state: WalkerState, step_key: Array,
                         walker_ids: Array, n_sweeps: int) -> WalkerState:
        """Replica-exchange sampling: per-replica Metropolis sweeps with
        |psi|^{2 b_r} acceptance, then one adjacent-pair swap pass per
        sweep. ``walker_ids`` are the [M] PHYSICAL global ids; row r of
        walker i draws from stream id i * R + r, so sharded runs stay
        walker-for-walker identical to single-device runs."""
        r = self.n_replicas
        ss = self._sweep_size
        row_ids = (walker_ids[:, None] * r
                   + jnp.arange(r, dtype=walker_ids.dtype)[None, :]
                   ).reshape(-1)
        beta_rows = self._row_betas(row_ids.shape[0])
        prop_key, swap_key = jax.random.split(step_key)

        def sweep_body(st, u):
            def prop_body(st2, i):
                k_t = jax.random.fold_in(prop_key, u * ss + i)
                keys = jax.vmap(
                    lambda w: jax.random.fold_in(k_t, w))(row_ids)
                return self._proposal_step(params, st2, keys,
                                           beta_rows=beta_rows), ()

            st, _ = jax.lax.scan(prop_body, st, jnp.arange(ss))
            return self._swap_step(
                st, jax.random.fold_in(swap_key, u), walker_ids), ()

        state, _ = jax.lax.scan(sweep_body, state, jnp.arange(n_sweeps))
        return state

    def _swap_step(self, state: WalkerState, key: Array,
                   walker_ids: Array) -> WalkerState:
        """One replica-exchange pass: adjacent pairs (r, r+1) in order.

        Chains p_r ~ |psi|^{2 b_r}: swapping the configurations of
        replicas r and r+1 is accepted with
          A = min(1, exp(2 (b_r - b_{r+1}) (log|psi(s_{r+1})| -
                                            log|psi(s_r)|)))
        — the standard replica-exchange rule. Configs AND their stored
        log-amplitudes travel together (log psi does not depend on b), so
        the pass costs zero network forwards. Acceptance counters are
        per-row Metropolis statistics and are not touched by swaps.
        """
        r = self.n_replicas
        m = state.s.shape[0] // r
        betas = np.asarray(self.betas, np.float32)
        s = state.s.reshape(m, r, -1)
        lp_re = state.log_psi.re.reshape(m, r)
        lp_im = state.log_psi.im.reshape(m, r)
        for j in range(r - 1):
            k_j = jax.random.fold_in(key, j)
            u = jax.vmap(lambda w: jax.random.uniform(
                jax.random.fold_in(k_j, w)))(walker_ids)      # [M]
            log_a = 2.0 * (betas[j] - betas[j + 1]) * (
                lp_re[:, j + 1] - lp_re[:, j])
            acc = (jnp.log(u) < log_a)[:, None]               # [M, 1]
            sj, sj1 = s[:, j], s[:, j + 1]
            s = s.at[:, j].set(jnp.where(acc, sj1, sj))
            s = s.at[:, j + 1].set(jnp.where(acc, sj, sj1))
            accs = acc[:, 0]
            for arr_name, arr in (("re", lp_re), ("im", lp_im)):
                aj, aj1 = arr[:, j], arr[:, j + 1]
                arr = arr.at[:, j].set(jnp.where(accs, aj1, aj))
                arr = arr.at[:, j + 1].set(jnp.where(accs, aj, aj1))
                if arr_name == "re":
                    lp_re = arr
                else:
                    lp_im = arr
        return state._replace(
            s=s.reshape(m * r, -1),
            log_psi=C(lp_re.reshape(-1), lp_im.reshape(-1)))

    def _sample_pallas(self, params, state: WalkerState, step_key: Array,
                       walker_ids: Array, n_props: int) -> WalkerState:
        from qmcnn_tpu.kernels.metropolis_pallas import pallas_sweep

        interpret = jax.default_backend() != "tpu"
        m = state.s.shape[0]
        block = min(self.pallas_block, m)
        s_out, lp_out, acc = pallas_sweep(
            params, state.s, state.log_psi.re,
            step_key=step_key, walker_ids=walker_ids,
            lattice_shape=tuple(self.lattice_shape), n_props=n_props,
            move=self.move, bonds=self.bonds, block=block,
            interpret=interpret,
        )
        return WalkerState(
            s=s_out,
            log_psi=C(lp_out, jnp.zeros_like(lp_out)),
            n_accept=state.n_accept + acc.astype(jnp.int32),
            n_prop=state.n_prop + n_props,
        )

    @staticmethod
    def acceptance_rate(state: WalkerState) -> Array:
        return state.n_accept.sum() / jnp.maximum(state.n_prop.sum(), 1)

    @staticmethod
    def reset_counters(state: WalkerState) -> WalkerState:
        return state._replace(
            n_accept=jnp.zeros_like(state.n_accept),
            n_prop=jnp.zeros_like(state.n_prop),
        )
