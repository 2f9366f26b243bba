"""Spin Hamiltonians: diagonal terms + connected-configuration enumeration.

Reference parity (SURVEY.md R4/R4a, BASELINE configs): 1D TFIM, 1D/2D
Heisenberg with the Marshall sign rule, and the 2D J1-J2 frustrated model.

TPU-native design (SURVEY.md N4): ``connected(s)`` returns a *static-K*
batch ``(s_prime [K, N], mel [K], mask [K])`` with inactive entries masked,
so every shape is known at trace time and XLA can tile the downstream
amplitude-ratio forward pass onto the MXU. K is N (TFIM: one flip per site)
or n_bonds (exchange models: one swap per bond).

Convention: ``mel_k = <s|H|s'_k>`` so that
``E_loc(s) = diag(s) + sum_k mask_k * mel_k * psi(s'_k)/psi(s)``.
All Hamiltonians here are real symmetric, optionally Marshall-rotated
(H -> D H D with D = diag((-1)^{# up on sublattice A})), which flips the
sign of off-diagonal elements connecting different sublattices and leaves
same-sublattice elements (e.g. J2 diagonals) unchanged.
"""
from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.lattice import Lattice

Array = jax.Array


class Hamiltonian:
    """Base interface. Subclasses define static fields + the three methods."""

    lattice: Lattice
    #: proposal move that keeps the sampler in this Hamiltonian's sector
    default_move: str = "flip"

    @property
    def n_conn(self) -> int:
        raise NotImplementedError

    def diag(self, s: Array) -> Array:
        """Diagonal energy <s|H|s>. s: [N] float32 in {-1,+1}."""
        raise NotImplementedError

    def connected(self, s: Array) -> Tuple[Array, Array, Array]:
        """Off-diagonal connected configs: (s' [K,N], mel [K], mask [K])."""
        raise NotImplementedError

    # Batched variants (walkers on the leading axis).
    def diag_batch(self, s: Array) -> Array:
        return jax.vmap(self.diag)(s)

    def connected_batch(self, s: Array) -> Tuple[Array, Array, Array]:
        return jax.vmap(self.connected)(s)


@dataclasses.dataclass(frozen=True, eq=False)
class TFIM(Hamiltonian):
    """(Transverse+longitudinal)-field Ising model:
    H = -J sum_<ij> sz_i sz_j - h sum_i sx_i - hz sum_i sz_i.

    (sigma convention, matching :func:`qmcnn_tpu.ops.exact.sparse_tfim`.)
    Connected states: every single-spin flip, K = N, mel = -h (SURVEY.md R4).
    ``hz`` (beyond reference parity) adds the purely diagonal longitudinal
    field — the mixed-field Ising chain (non-integrable; E8 physics near
    the critical point).
    """

    lattice: Lattice
    j: float = 1.0
    h: float = 1.0
    hz: float = 0.0

    default_move = "flip"

    @property
    def n_conn(self) -> int:
        return self.lattice.n_sites

    @cached_property
    def _bonds(self) -> np.ndarray:
        # NOTE: constants stay host-side numpy; jnp.asarray inside a trace
        # would cache a tracer-bound constant (leaks across jit traces).
        return self.lattice.nn_bonds

    @cached_property
    def _flips(self) -> np.ndarray:
        # [N, N]: row k multiplies site k by -1
        n = self.lattice.n_sites
        return (1.0 - 2.0 * np.eye(n, dtype=np.float32))

    def diag(self, s: Array) -> Array:
        b = self._bonds
        out = -self.j * jnp.sum(s[b[:, 0]] * s[b[:, 1]])
        if self.hz:
            out = out - self.hz * jnp.sum(s)
        return out

    def connected(self, s: Array) -> Tuple[Array, Array, Array]:
        n = self.lattice.n_sites
        s_prime = s[None, :] * jnp.asarray(self._flips)
        mel = jnp.full((n,), -self.h, dtype=s.dtype)
        mask = jnp.ones((n,), dtype=bool)
        return s_prime, mel, mask


@dataclasses.dataclass(frozen=True, eq=False)
class Heisenberg(Hamiltonian):
    """Antiferromagnetic Heisenberg / J1-J2 model, spin-1/2 (S = sigma/2).

    H = J sum_<ij> [Sx Sx + Sy Sy + delta Sz Sz] + J2 sum_<<ij>> (same)
      = sum_bonds [ (delta J_b/4) sz_i sz_j + (J_b/2) exchange(anti-aligned) ].

    ``delta`` is the XXZ anisotropy (1 = isotropic Heisenberg; 0 = XY
    model; >1 Ising-like easy-axis). It scales only the diagonal, so the
    connected-state structure (and therefore K) is unchanged.

    With ``marshall=True`` the Marshall basis rotation is folded into the
    matrix elements (SURVEY.md R4a): off-diagonal elements connecting
    *different* sublattices (all NN bonds on a bipartite lattice) change sign
    to -J/2; same-sublattice bonds (all NNN/J2 bonds) keep +J2/2. Energies
    are rotation invariant, so ED comparisons remain valid.

    Connected states: one per bond, active iff the bond is anti-aligned.
    K = n_nn_bonds (+ n_nnn_bonds when j2 != 0).
    """

    lattice: Lattice
    j: float = 1.0
    j2: float = 0.0
    marshall: bool = True
    #: XXZ anisotropy on the Sz Sz term (1.0 = isotropic)
    delta: float = 1.0

    default_move = "exchange"

    def __post_init__(self):
        if self.marshall and not self.lattice.is_bipartite_compatible:
            raise ValueError(
                "marshall=True needs a bipartite NN graph (even-dim "
                "hypercubic under PBC); this lattice is not two-colorable "
                f"(geometry={self.lattice.geometry!r}, "
                f"shape={self.lattice.shape}) — set marshall: false")

    @cached_property
    def _all_bonds(self) -> np.ndarray:
        bonds = [self.lattice.nn_bonds]
        if self.j2 != 0.0:
            bonds.append(self.lattice.nnn_bonds)
        return np.concatenate(bonds, axis=0)

    @cached_property
    def _couplings(self) -> np.ndarray:
        c = [np.full(len(self.lattice.nn_bonds), self.j, dtype=np.float32)]
        if self.j2 != 0.0:
            c.append(np.full(len(self.lattice.nnn_bonds), self.j2, dtype=np.float32))
        return np.concatenate(c)

    @property
    def n_conn(self) -> int:
        return len(self._all_bonds)

    @cached_property
    def _flip_matrix(self) -> np.ndarray:
        # [K, N]: row b multiplies both sites of bond b by -1 (the exchange
        # of an anti-aligned pair == flipping both spins).
        k, n = len(self._all_bonds), self.lattice.n_sites
        f = np.ones((k, n), dtype=np.float32)
        rows = np.arange(k)
        f[rows, self._all_bonds[:, 0]] = -1.0
        f[rows, self._all_bonds[:, 1]] = -1.0
        return f

    @cached_property
    def _offdiag_mel(self) -> np.ndarray:
        """[K] off-diagonal matrix element per bond (sign incl. Marshall)."""
        sub = self.lattice.sublattice_mask
        i, jj = self._all_bonds[:, 0], self._all_bonds[:, 1]
        if self.marshall:
            sign = np.where(sub[i] != sub[jj], -1.0, 1.0).astype(np.float32)
        else:
            sign = np.ones(len(i), dtype=np.float32)
        return sign * self._couplings / 2.0

    @cached_property
    def _diag_coupling(self) -> np.ndarray:
        return self.delta * self._couplings / 4.0

    def diag(self, s: Array) -> Array:
        b = self._all_bonds
        return jnp.sum(jnp.asarray(self._diag_coupling) * s[b[:, 0]] * s[b[:, 1]])

    def connected(self, s: Array) -> Tuple[Array, Array, Array]:
        b = self._all_bonds
        mask = s[b[:, 0]] * s[b[:, 1]] < 0  # anti-aligned bonds only
        s_prime = s[None, :] * jnp.asarray(self._flip_matrix)
        # Keep masked rows equal to s so their (ignored) forward pass is
        # numerically tame.
        s_prime = jnp.where(mask[:, None], s_prime, s[None, :])
        return s_prime, jnp.asarray(self._offdiag_mel).astype(s.dtype), mask


@dataclasses.dataclass(frozen=True, eq=False)
class XYZ(Hamiltonian):
    """Fully anisotropic XYZ model in transverse + longitudinal fields
    (beyond reference parity — SURVEY.md R4 ships TFIM/Heisenberg/J1-J2):

      H = sum_<ij> [Jx Sx Sx + Jy Sy Sy + Jz Sz Sz]
          - hx sum_i Sx_i - hz sum_i Sz_i,

    spin-1/2 with S = sigma/2 (the Heisenberg coupling convention; note
    the *fields* here are S-convention too, unlike TFIM's sigma fields).

    Connected states (static K = n_nn_bonds [+ N when hx != 0]):
      * pair flip on every NN bond, mel = (Jx - Jy * s_i s_j) / 4 —
        anti-aligned bonds give (Jx+Jy)/4 (the XXZ exchange limit),
        aligned bonds give (Jx-Jy)/4, the S^z-violating term that makes
        XYZ more than XXZ;
      * single flip on every site when hx != 0, mel = -hx/2.

    Special-case reductions (tested): Jx=Jy=J, Jz=delta*J, hx=hz=0 is the
    XXZ ``Heisenberg(j=J, delta=delta)``; Jx=Jy=0 is a diagonal Ising +
    transverse/longitudinal fields.

    ``marshall=True`` folds in the bipartite sign rotation D = prod_{i in A}
    sigma^z_i: every NN pair-flip element changes sign (exactly one bond
    end is in A) and single-flip elements at A sites change sign. Energies
    are rotation invariant. Default False — away from the XXZ limit the
    ground state has no Marshall positivity guarantee.

    S^z is conserved iff Jx == Jy and hx == 0; ``default_move`` and the
    builder guard enforce a sector-compatible sampler.
    """

    lattice: Lattice
    jx: float = 1.0
    jy: float = 1.0
    jz: float = 1.0
    hx: float = 0.0
    hz: float = 0.0
    marshall: bool = False

    def __post_init__(self):
        if self.marshall and not self.lattice.is_bipartite_compatible:
            raise ValueError(
                "marshall=True needs a bipartite NN graph — set "
                "marshall: false for this lattice")

    @property
    def conserves_sz(self) -> bool:
        return self.jx == self.jy and self.hx == 0.0

    @property
    def default_move(self) -> str:  # type: ignore[override]
        return "exchange" if self.conserves_sz else "flip"

    @property
    def n_conn(self) -> int:
        k = len(self.lattice.nn_bonds)
        if self.hx != 0.0:
            k += self.lattice.n_sites
        return k

    @cached_property
    def _bonds(self) -> np.ndarray:
        return self.lattice.nn_bonds

    @cached_property
    def _pair_flips(self) -> np.ndarray:
        k, n = len(self._bonds), self.lattice.n_sites
        f = np.ones((k, n), dtype=np.float32)
        rows = np.arange(k)
        f[rows, self._bonds[:, 0]] = -1.0
        f[rows, self._bonds[:, 1]] = -1.0
        return f

    @cached_property
    def _bond_sign(self) -> np.ndarray:
        """Marshall sign per NN bond (-1 when the ends straddle A|B)."""
        if not self.marshall:
            return np.ones(len(self._bonds), dtype=np.float32)
        sub = self.lattice.sublattice_mask
        i, jj = self._bonds[:, 0], self._bonds[:, 1]
        return np.where(sub[i] != sub[jj], -1.0, 1.0).astype(np.float32)

    @cached_property
    def _site_sign(self) -> np.ndarray:
        """Marshall sign per single-site flip (-1 on sublattice A)."""
        if not self.marshall:
            return np.ones(self.lattice.n_sites, dtype=np.float32)
        return np.where(np.asarray(self.lattice.sublattice_mask) == 0,
                        -1.0, 1.0).astype(np.float32)

    def diag(self, s: Array) -> Array:
        b = self._bonds
        out = (self.jz / 4.0) * jnp.sum(s[b[:, 0]] * s[b[:, 1]])
        if self.hz:
            out = out - (self.hz / 2.0) * jnp.sum(s)
        return out

    def connected(self, s: Array) -> Tuple[Array, Array, Array]:
        b = self._bonds
        zz = s[b[:, 0]] * s[b[:, 1]]
        mel_bond = jnp.asarray(self._bond_sign) * (self.jx - self.jy * zz) / 4.0
        sp_bond = s[None, :] * jnp.asarray(self._pair_flips)
        mask_bond = jnp.abs(mel_bond) > 0
        # masked rows get a tame forward input (same hygiene as Heisenberg)
        sp_bond = jnp.where(mask_bond[:, None], sp_bond, s[None, :])
        if self.hx == 0.0:
            return sp_bond, mel_bond.astype(s.dtype), mask_bond
        n = self.lattice.n_sites
        sp_flip = s[None, :] * (1.0 - 2.0 * jnp.eye(n, dtype=s.dtype))
        mel_flip = jnp.asarray(self._site_sign) * (-self.hx / 2.0)
        mask_flip = jnp.ones((n,), dtype=bool)
        return (jnp.concatenate([sp_bond, sp_flip], axis=0),
                jnp.concatenate([mel_bond, mel_flip]).astype(s.dtype),
                jnp.concatenate([mask_bond, mask_flip]))


def j1j2(lattice: Lattice, j1: float = 1.0, j2: float = 0.5,
         marshall: bool = True) -> Heisenberg:
    """2D J1-J2 frustrated Heisenberg model (BASELINE config 4)."""
    return Heisenberg(lattice, j=j1, j2=j2, marshall=marshall)
