"""Pallas TPU kernel: fully fused Metropolis sweep (SURVEY.md K1).

Runs an ENTIRE sweep (``n_props`` sequential proposals for a block of
walkers) inside one kernel: walker configurations, cached log-amplitudes and
the CNN weights stay resident in VMEM for all proposals — zero HBM round
trips between proposal steps, with the proposal/accept/update logic fused
around the forward-pass matmuls (the north star's "accept/reject step fused
into Pallas kernels").

Forward pass: the real-parameter LogPsiCNN in its *circulant-matmul* form
(see models/cnn.py) — each conv layer is one [BLK, N*Cin] @ [N*Cin, N*Cout]
MXU matmul, with weights expanded host-side once per training step (they are
sweep-invariant and loop-invariant across the walker grid, so Mosaic keeps
them in VMEM).

RNG: proposal sites/bonds and acceptance thresholds are generated OUTSIDE
the kernel with ``jax.random`` (sweep_noise below reproduces the XLA
sampler's per-walker streams exactly), and streamed in as [n_props, BLK]
blocks. This keeps the kernel deterministic — enabling exact parity tests
against :class:`qmcnn_tpu.sampler.metropolis.MetropolisSampler` — and keeps
the sharding-independence guarantee (streams keyed by global walker id).
The extra HBM traffic is ~8 bytes/proposal/walker, negligible next to the
forward matmuls.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qmcnn_tpu.models.cnn import circulant_weight

Array = jax.Array

LOG2 = 0.6931471805599453


def _lncosh(x):
    t = jnp.abs(x)
    return t - LOG2 + jnp.log1p(jnp.exp(-2.0 * t))


def prepare_circulant_params(variables, lattice_shape: Tuple[int, ...],
                             dtype=jnp.float32):
    """Expand LogPsiCNN params to (weights [Ni, No], tiled biases [1, No]).

    Done once per training step in XLA; linear in the raw kernels.
    """
    n = int(np.prod(lattice_shape))
    params = variables["params"]
    ws, bs = [], []
    i = 0
    while f"RealConv_{i}" in params:
        leaf = params[f"RealConv_{i}"]
        wc = circulant_weight(leaf["kernel"], lattice_shape).astype(dtype)
        bias = jnp.tile(leaf["bias"], n).astype(jnp.float32)
        ws.append(wc)
        bs.append(bias.reshape(1, -1))
        i += 1
    if not ws:
        raise ValueError("no RealConv_* layers found (complex/translation-"
                         "averaged models are not supported by this kernel)")
    return tuple(ws), tuple(bs)


def sweep_noise(step_key: Array, walker_ids: Array, n_props: int,
                n_choices: int) -> Tuple[Array, Array]:
    """(choices [n_props, M] int32, log_u [n_props, M] f32).

    Reproduces MetropolisSampler's streams exactly: at proposal t, walker w
    draws from split(fold_in(fold_in(step_key, t), w)) — so a Pallas sweep
    fed with this noise makes bitwise-identical Metropolis decisions to the
    XLA sampler (up to forward-pass rounding).
    """

    def per_step(t):
        k_t = jax.random.fold_in(step_key, t)

        def per_walker(w):
            k_w = jax.random.fold_in(k_t, w)
            k_move, k_accept = jax.random.split(k_w, 2)
            choice = jax.random.randint(k_move, (), 0, n_choices)
            u = jax.random.uniform(k_accept)
            return choice, jnp.log(u)

        return jax.vmap(per_walker)(walker_ids)

    choices, log_u = jax.vmap(per_step)(jnp.arange(n_props))
    return choices.astype(jnp.int32), log_u.astype(jnp.float32)


def _sweep_kernel(
    s_ref,               # [BLK, N] f32
    logpsi_ref,          # [BLK, 1] f32
    site_a_ref,          # [n_props, BLK] i32 (flip site / bond endpoint i)
    site_b_ref,          # [n_props, BLK] i32 (== site_a for flip / endpoint j)
    logu_ref,            # [n_props, BLK] f32
    *rest,
    n_layers: int,
    n_props: int,
    n_sites: int,
    move: str,
):
    ws = rest[:n_layers]
    biases = rest[n_layers:2 * n_layers]
    s_out_ref, logpsi_out_ref, acc_ref = rest[2 * n_layers:]

    blk = s_ref.shape[0]
    site_iota = jax.lax.broadcasted_iota(jnp.int32, (blk, n_sites), 1)

    def forward(s):
        h = s
        for li in range(n_layers):
            h = jnp.dot(h, ws[li][:], preferred_element_type=jnp.float32)
            h = _lncosh(h + biases[li][:])
        return jnp.sum(h, axis=1, keepdims=True)  # [BLK, 1]

    def body(t, carry):
        s, logpsi, acc = carry
        site_a = site_a_ref[t, :].reshape(blk, 1)
        log_u = logu_ref[t, :].reshape(blk, 1)
        if move == "flip":
            flip = jnp.where(site_iota == site_a, -1.0, 1.0)
            s_prop = s * flip
        else:
            site_b = site_b_ref[t, :].reshape(blk, 1)
            on_bond = (site_iota == site_a) | (site_iota == site_b)
            # endpoint spins via masked reductions (no dynamic gather on TPU)
            s_i = jnp.sum(jnp.where(site_iota == site_a, s, 0.0), axis=1,
                          keepdims=True)
            s_j = jnp.sum(jnp.where(site_iota == site_b, s, 0.0), axis=1,
                          keepdims=True)
            anti = (s_i * s_j) < 0.0
            s_prop = jnp.where(on_bond & anti, -s, s)
        logpsi_prop = forward(s_prop)
        accept = log_u < 2.0 * (logpsi_prop - logpsi)  # [BLK, 1]
        s = jnp.where(accept, s_prop, s)
        logpsi = jnp.where(accept, logpsi_prop, logpsi)
        acc = acc + accept.astype(jnp.float32)
        return s, logpsi, acc

    s0 = s_ref[:]
    logpsi0 = logpsi_ref[:]
    acc0 = jnp.zeros((blk, 1), jnp.float32)
    if n_props == 0:
        # recompute mode: return forward(s) (used by the parity tests)
        s_out_ref[:] = s0
        logpsi_out_ref[:] = forward(s0)
        acc_ref[:] = acc0
    else:
        s, logpsi, acc = jax.lax.fori_loop(0, n_props, body,
                                           (s0, logpsi0, acc0))
        s_out_ref[:] = s
        logpsi_out_ref[:] = logpsi
        acc_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=("lattice_shape", "n_props", "move", "block",
                     "interpret"),
)
def _pallas_sweep_impl(variables, s, logpsi_re, site_a, site_b, log_u, *,
                       lattice_shape, n_props, move, block, interpret):
    m, n = s.shape
    ws, bs = prepare_circulant_params(variables, lattice_shape)
    n_layers = len(ws)
    if m % block:
        raise ValueError(f"n_walkers={m} must be divisible by block={block}")

    kernel = functools.partial(
        _sweep_kernel, n_layers=n_layers, n_props=n_props, n_sites=n,
        move=move,
    )
    np_dim = max(n_props, 1)
    grid = (m // block,)
    in_specs = [
        pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((np_dim, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((np_dim, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((np_dim, block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        *[pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
          for w in ws],
        *[pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
          for b in bs],
    ]
    out_specs = [
        pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    # The circulant weights alone exceed the default 16MB scoped-vmem cap
    # for flagship shapes (C=16^3 on 10x10 -> 20.7MB f32); v5e has 64MB of
    # physical VMEM, so raise the cap to what this kernel actually needs.
    vmem_bytes = int(sum(int(np.prod(w.shape)) * 4 for w in ws)
                     + sum(int(np.prod(b.shape)) * 4 for b in bs)
                     + 4 * block * n * 4          # s blocks + proposal tmp
                     + 6 * np_dim * block * 4     # noise blocks (dbl-buf)
                     + 8 * block * max(w.shape[1] for w in ws) * 4  # acts
                     + (1 << 20))
    s_out, lp_out, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 100 * 1024 * 1024)),
        interpret=interpret,
    )(s, logpsi_re.reshape(m, 1), site_a, site_b, log_u, *ws, *bs)
    return s_out, lp_out.reshape(m), acc.reshape(m)


def pallas_sweep(variables, s, logpsi_re, *, step_key=None, walker_ids=None,
                 noise=None, lattice_shape: Tuple[int, ...], n_props: int,
                 move: str = "flip", bonds: Optional[np.ndarray] = None,
                 block: int = 256, interpret: bool = False):
    """Fused Metropolis sweep.

    Args:
      variables: LogPsiCNN (real, non-averaged) flax variables.
      s: [M, N] walker configs. logpsi_re: [M] cached Re log psi.
      step_key/walker_ids: generate noise via sweep_noise (the XLA-sampler-
        compatible streams); or pass precomputed ``noise=(choices, log_u)``.
      n_props: proposals per walker (0 = recompute-logpsi mode for tests).
      move: 'flip' | 'exchange' (requires bonds).
      block: walkers per grid step (kept VMEM-resident for the whole sweep).
      interpret: run in the Pallas interpreter (CPU CI).

    Returns (s_out [M, N], logpsi_out [M], n_accept [M]).
    """
    if move == "exchange" and bonds is None:
        raise ValueError("exchange move requires bonds")
    m, n = s.shape
    if noise is None:
        if n_props > 0:
            if step_key is None or walker_ids is None:
                raise ValueError("need step_key+walker_ids or noise")
            n_choices = n if move == "flip" else len(bonds)
            noise = sweep_noise(step_key, walker_ids, n_props, n_choices)
        else:
            noise = (jnp.zeros((1, m), jnp.int32), jnp.zeros((1, m)))
    choices, log_u = noise
    if move == "exchange":
        bonds_j = jnp.asarray(np.asarray(bonds, np.int32))
        site_a = bonds_j[choices, 0]  # XLA gather, outside the kernel
        site_b = bonds_j[choices, 1]
    else:
        site_a = choices
        site_b = choices
    return _pallas_sweep_impl(
        variables, s, logpsi_re, site_a, site_b, log_u,
        lattice_shape=tuple(lattice_shape), n_props=n_props, move=move,
        block=block, interpret=interpret,
    )
