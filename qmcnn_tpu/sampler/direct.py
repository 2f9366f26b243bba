"""Direct (ancestral) sampler for autoregressive ansatze (models/arnn.py).

Reference parity note: the reference (dmaloneynygc/qmcnn, SURVEY.md R3) only
samples by Metropolis-Hastings chains. For an autoregressive psi, |psi|^2 is
exactly normalized and factorizes over sites, so a single ancestral pass
draws an EXACT i.i.d. sample: zero autocorrelation, zero thermalization
sweeps, no acceptance tuning, and estimator error bars are the plain
sqrt(var/M) (no binning analysis needed). This module plugs that in behind
the same duck-typed interface VMC uses for MetropolisSampler, so the whole
training/measurement stack is sampler-agnostic.

TPU-native design: one lax.scan over the N sites; each scan step runs the
masked forward on the FULL walker batch (one MXU matmul chain per site) and
fills site i of every walker via a one-hot outer product (no scatters, no
gathers, static shapes). Per-walker randomness follows the framework's
global-id discipline — key(site i, walker w) = fold_in(fold_in(step_key, i),
walker_id) — so an n-device run draws walker-for-walker the same samples as
a 1-device run (the n-vs-1 equality test covers this path).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.sampler.metropolis import WalkerState, init_walkers

Array = jax.Array


@dataclasses.dataclass(frozen=True, eq=False)
class DirectSampler:
    """Exact ancestral sampler bound to an autoregressive conditional fn.

    Args:
      log_psi_fn: (params, s [B, N]) -> C [B] log-amplitudes (for the
        stored walker log_psi; same convention as MetropolisSampler).
      conditional_fn: (params, s [B, N]) -> (log_p_up [B, N], log_p_dn)
        where column i depends on s_<i only (models/arnn.py contract).
      n_sites: lattice sites.
      sz_zero: initialize placeholder walkers in the S^z = 0 sector (the
        conditionals then keep every sample exactly on it).
    """

    log_psi_fn: Callable[..., C]
    conditional_fn: Callable[..., tuple]
    n_sites: int
    sz_zero: bool = False

    def init_state(self, params, key: Array, n_walkers: int) -> WalkerState:
        # placeholder configs: the first sample() call fully regenerates
        # every walker, so only the shape/sector matter here
        s = init_walkers(key, n_walkers, self.n_sites,
                         sector="sz0" if self.sz_zero else None)
        lp = self.log_psi_fn(params, s)
        zero = jnp.zeros(n_walkers, jnp.int32)
        return WalkerState(s=s, log_psi=lp, n_accept=zero, n_prop=zero)

    def physical(self, state: WalkerState) -> WalkerState:
        """Interface parity with MetropolisSampler: exact sampling has no
        tempering replicas, every walker is physical."""
        return state

    def refresh(self, params, state: WalkerState) -> WalkerState:
        """No-op: sample() regenerates all walkers from scratch anyway."""
        return state

    def sample(self, params, state: WalkerState, step_key: Array,
               walker_ids: Array, n_sweeps: int = 1) -> WalkerState:
        """Draw a fresh exact batch (n_sweeps is ignored: samples are
        i.i.d., there is nothing to decorrelate)."""
        m = state.s.shape[0]
        n = self.n_sites
        s0 = -jnp.ones((m, n), jnp.float32)  # unfilled sites: masked out

        def fill_site(s, i):
            log_p_up, _ = self.conditional_fn(params, s)
            onehot = (jnp.arange(n) == i).astype(jnp.float32)  # [N]
            p_up_i = jnp.exp(jnp.sum(log_p_up * onehot, axis=-1))  # [M]
            k_i = jax.random.fold_in(step_key, i)
            u = jax.vmap(
                lambda w: jax.random.uniform(jax.random.fold_in(k_i, w))
            )(walker_ids)
            s_i = jnp.where(u < p_up_i, 1.0, -1.0)  # [M]
            s = s * (1.0 - onehot)[None, :] + s_i[:, None] * onehot[None, :]
            return s, ()

        s, _ = jax.lax.scan(fill_site, s0, jnp.arange(n))
        lp = self.log_psi_fn(params, s)
        ones = jnp.ones(m, jnp.int32)
        return WalkerState(
            s=s, log_psi=lp,
            n_accept=state.n_accept + ones,  # exact sampling: all "accepted"
            n_prop=state.n_prop + ones,
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
