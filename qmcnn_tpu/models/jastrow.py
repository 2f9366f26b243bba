"""Learnable two-body Jastrow amplitude factor on the log-amplitude.

Physics. The classic VMC correlator (Jastrow 1955; for spins e.g.
Capello et al., PRB 72:085121) multiplies any ansatz by

    psi(s) -> exp( 1/2 sum_{i != j} v_{c(i,j)} s_i s_j ) * psi(s),

a real, positive pair factor whose couplings are tied over symmetry
classes c(i,j) of site pairs. Here the classes are the **minimal-image
Cartesian distance shells** of the periodic lattice (plus nothing else),
so the factor is exactly invariant under every lattice isometry —
translations, rotations, reflections — for all five geometries
(chain / square / triangular / honeycomb / kagome). It therefore commutes
with the framework's symmetry projections (translation / point-group /
spin-parity averaging: s_i s_j is also Z2-even), making the wrapper
placement mathematically irrelevant; the builder applies it innermost,
alongside the phase priors (models/phase.py).

TPU shape. One parameter vector v[n_shells] is scattered into the [N, N]
coupling matrix W by a trace-time integer take, then the batch pays a
single [M, N] x [N, N] float32 MXU matmul for the quadratic form —
O(M N^2) FLOPs, no gathers in the hot loop, negligible next to the conv
stack (and the f32 keeps the factor's log-amplitude shift out of the
bf16 rounding noise when compute_dtype is bfloat16). ``v`` initializes to
zero, so a Jastrow-wrapped model starts bit-identical to the bare one
(tested) and the factor only turns on as SR/SGD moves it.

The Cartesian site embedding and torus translation vectors come from
``Lattice.site_positions`` / ``Lattice.primitive_spans`` (lattice.py owns
the geometry conventions); this module only buckets distances.

Pair phases (``phase=True``, config ``model.jastrow_phase``). The same
quadratic form with an independent coupling vector u multiplies psi by
exp(i/2 sum u_{c(i,j)} s_i s_j) — a LEARNABLE diagonal sign/phase
structure (the two-body term of Huse-Elser wavefunctions, PRL 60:2531),
the natural next rung past the fixed 120-degree priors of
models/phase.py on the frustrated lattices where those saturate. |psi|
is untouched, so sampling distributions are exactly preserved; u is
zero-initialized like v. Enabling it makes log psi complex for all
parameter values, so the builder's real-model SR fast path disqualifies
itself (model_log_psi_is_real).

Saddle caveat: at u = 0 over a REAL state, dE/du = i<[H, Q]> = 0
identically (E is even under conjugation), so u = 0 is a stationary
point for exactly-real inner models. MC gradient noise escapes it in
practice, but deterministic/full-sum training from a real state stalls
(tested); pair the factor with a complex inner or a phase prior — the
production frustrated recipes (phase_bias=sublattice_120,
complex_params) all have im != 0 — or perturb u at warm-start.

Reference parity note: SURVEY.md's reference (pure CNN ansatz) has no
Jastrow; this is beyond-parity capability — the standard baseline
correlator of the wider VMC literature, and a cheap amplitude-structure
booster for the frustrated lattices where the plain CNN saturates.

The amplitude factor is not available for the autoregressive ansatz
(a configuration-dependent |psi| factor breaks the exact-sampling
normalization; the builder rejects it) — but the PURE PHASE factor is:
|psi|^2 is unchanged, so ancestral sampling stays exact.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.lattice import Lattice
from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array


def distance_classes(lattice: Lattice) -> Tuple[np.ndarray, int]:
    """Distance-shell classes of all site pairs.

    Returns ``(class_matrix, n_shells)``: an [N, N] int32 matrix whose
    (i, j) entry is the shell index of the minimal-image distance |r_i -
    r_j| (shells sorted by distance, so shell 0 is always the NN shell),
    with the diagonal set to the sentinel ``n_shells`` (an s_i s_i term is
    a constant and carries no parameter).

    Under periodic boundaries the minimal image minimizes over the nine
    torus translations p * L1 + q * L2, p, q in {-1, 0, 1} (three in 1D),
    with L1/L2 the lattice's Cartesian ``primitive_spans``; open
    boundaries use the plain distance.
    """
    pos = lattice.site_positions
    diff = pos[:, None, :] - pos[None, :, :]  # [N, N, ndim]
    if lattice.pbc:
        spans = lattice.primitive_spans
        images = [p * spans[0] + (q * spans[1] if len(spans) > 1 else 0.0)
                  for p in (-1, 0, 1)
                  for q in ((-1, 0, 1) if len(spans) > 1 else (0,))]
        d = np.min(np.stack(
            [np.linalg.norm(diff + im, axis=-1) for im in images]), axis=0)
    else:
        d = np.linalg.norm(diff, axis=-1)
    # bucket by rounded distance; sort shells so index 0 = NN shell
    keys = np.round(d, 6)
    shells = np.unique(keys[~np.eye(lattice.n_sites, dtype=bool)])
    cm = np.searchsorted(shells, keys).astype(np.int32)
    np.fill_diagonal(cm, len(shells))
    return cm, int(len(shells))


class Jastrow(nn.Module):
    """log psi(s) = inner(s) + (1/2) (v + i u)[class(i, j)] s_i s_j sums.

    ``amplitude`` adds the real coupling vector v (pair amplitudes);
    ``phase`` adds the independent imaginary coupling vector u (pair
    phases — |psi| untouched). Both start at zero (exact identity at
    init). The class matrix is stored as nested tuples so the module
    stays a hashable static dataclass; it is rebuilt as a constant at
    trace time.
    """

    inner: nn.Module
    class_matrix: Tuple[Tuple[int, ...], ...]
    n_shells: int
    amplitude: bool = True
    phase: bool = False

    @nn.compact
    def __call__(self, s: Array) -> C:
        out = cplx.as_c(self.inner(s))
        cm = jnp.asarray(np.asarray(self.class_matrix, np.int32))
        sf = s.reshape(s.shape[0], -1).astype(jnp.float32)

        def quad(coups):
            # sentinel diagonal class -> coupling 0 (padded slot)
            w = jnp.concatenate([coups, jnp.zeros((1,), jnp.float32)])[cm]
            return 0.5 * jnp.einsum("bi,ij,bj->b", sf, w, sf)

        re, im = out.re, out.im
        if self.amplitude:
            re = re + quad(self.param("v", nn.initializers.zeros,
                                      (self.n_shells,), jnp.float32))
        if self.phase:
            im = im + quad(self.param("u", nn.initializers.zeros,
                                      (self.n_shells,), jnp.float32))
        return C(re, im)


def wrap_jastrow(inner: nn.Module, lattice: Lattice,
                 amplitude: bool = True, phase: bool = False) -> nn.Module:
    cm, n_shells = distance_classes(lattice)
    return Jastrow(inner=inner,
                   class_matrix=tuple(map(tuple, cm.tolist())),
                   n_shells=n_shells, amplitude=amplitude, phase=phase)
