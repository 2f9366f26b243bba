"""Fixed phase priors on the log-amplitude: sign-structure cures as an
ansatz feature instead of a Hamiltonian rotation.

Physics. For a diagonal spin rotation U = prod_i exp(i theta_i S^z_i), the
rotated ground state is psi'(s) = exp(i sum_i theta_i s_i / 2) psi(s): a
configuration-dependent pure phase. Instead of rotating the Hamiltonian's
matrix elements (which would make them complex and touch every estimator),
we equip the ansatz with the known phase factor

    log psi(s) = log chi_theta(s) + i * phi(s),
    phi(s) = sum_i (theta_i / 2) * s_i,

so the network chi only has to learn the residual (near-positive) part.
This is mathematically identical to working in the rotated basis — energies
and all basis-diagonal observables are invariant — and costs one dot
product per forward.

Two priors ship:

* ``sublattice_120`` — theta_i = 2 pi c_i / 3 with c_i the proper
  3-coloring of the NN graph (``Lattice.three_coloring``): the classical
  120-degree Neel order of the triangular/kagome Heisenberg AF (Huse &
  Elser, PRL 60:2531 (1988)). Closed-form effect (tested by exact
  enumeration): on the *uniform* state chi == 1 the energy per NN bond
  drops from +1/4 (the fully-polarized saddle that dead-locks small-init
  training — see configs/tri6x6_heis.yaml) to cos(120deg)/4 = -1/8.
* ``marshall`` — theta_i = pi on sublattice A of a bipartite lattice:
  exactly the Marshall sign rule as a phase (e^{i phi} = prod_{i in A} s_i
  up to a global phase). Ships mainly as a cross-check: it must reproduce
  the mel-folded ``marshall=True`` Hamiltonian energies identically
  (tested), and lets non-conv ansaetze opt into Marshall without touching
  the Hamiltonian.

Reference parity note: the reference (SURVEY.md R4a) implements only the
bipartite Marshall rule, folded into matrix elements; the 120-degree prior
is beyond-parity capability for the frustrated non-bipartite lattices.
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

KINDS = ("sublattice_120", "sublattice_sqrt3", "marshall")


def phase_half_angles(kind: str, lattice: Lattice) -> Tuple[float, ...]:
    """Per-site theta_i / 2 for a named phase prior (host-side constants)."""
    if kind == "sublattice_120":
        theta = (2.0 * np.pi / 3.0) * lattice.three_coloring
    elif kind == "sublattice_sqrt3":
        # the kagome sqrt(3) x sqrt(3) 120-degree pattern (vs q=0 above)
        theta = (2.0 * np.pi / 3.0) * lattice.three_coloring_sqrt3
    elif kind == "marshall":
        if not lattice.is_bipartite_compatible:
            raise ValueError(
                "phase_bias='marshall' needs a bipartite NN graph — for "
                "frustrated lattices use 'sublattice_120'")
        theta = np.pi * (np.asarray(lattice.sublattice_mask) == 0)
    else:
        raise ValueError(f"unknown phase_bias {kind!r}; pick one of {KINDS}")
    return tuple((theta / 2.0).astype(np.float64).tolist())


class PhaseBias(nn.Module):
    """log psi(s) = inner(s) + i * sum_i half_angles[i] * s_i.

    A pure phase: |psi| (and therefore the sampler's stationary
    distribution) is untouched; only the imaginary part of the
    log-amplitude shifts. Wrap INSIDE symmetry projections
    (translation / point-group / spin-parity averaging) so the projected
    state is the projection of the biased state.
    """

    inner: nn.Module
    half_angles: Tuple[float, ...]

    @nn.compact
    def __call__(self, s: Array) -> C:
        out = cplx.as_c(self.inner(s))
        coeff = jnp.asarray(self.half_angles, jnp.float32)
        phi = s.astype(jnp.float32) @ coeff  # [B]
        return C(out.re, out.im + phi)
