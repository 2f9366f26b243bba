"""Single-mode-approximation (Feynman) magnon dispersion.

Physics. For the lowest excitation created by the spin-density operator
S^z_q = sum_j e^{-i q.r_j} S^z_j, the Feynman/Bijl bound (the first
moment over the zeroth) gives a variational UPPER bound on the magnon
dispersion at every momentum:

    omega_min(q) <= omega_SMA(q) = f(q) / S(q),

    f(q) = (1/2N) <[[S^z_q, H], S^z_{-q}]>     (first-moment sum rule)
    S(q) = (1/N)  <S^z_{-q} S^z_q>             (static structure factor)

For exchange (Heisenberg-class: heisenberg / XXZ / J1-J2) Hamiltonians
the double commutator has a closed form in the TRANSVERSE bond
correlators — the S^z S^z parts of H commute with S^z_q and drop out:

    f(q) = - sum_shells J_s sum_{delta in s} (1 - cos(q.delta)) C_t(delta),
    C_t(delta) = (1/N) sum_i <S^x_i S^x_{i+delta} + S^y_i S^y_{i+delta}>,

where the inner sum runs over the distinct bond displacements of coupling
shell s (e.g. the square lattice's NN shell contributes delta = x and
delta = y). Both ingredients are cheap at measurement time: C_t(delta) is
one amplitude-ratio pass per displacement (observables.spin_spin_connected
— the same estimator the energy's off-diagonal part uses), and S(q) is the
FFT of the S^z S^z correlation function the measure CLI already records.
Everything here is dense-oracle tested (tests/test_sma.py): the closed
form against a literal double-commutator matrix expectation, S(q) against
<|S^z_q|^2>, and the Feynman inequality against the momentum-resolved
exact spectrum.

TPU shape: the MC work is the C_t passes (batched [M*N, N] forwards that
reuse the Hamiltonian-chunk budget); this module is host-side NumPy
post-processing on the handful of resulting scalars plus the [N] corr
array, so it adds nothing to the device program.

Conventions match ops/observables.py: q lives on the reciprocal index
grid q_d = 2 pi k_d / L_d of the (1-site-basis) lattice coordinate grid,
the same grid structure_factor() uses; for non-square Bravais embeddings
(triangular) the dispersion is reported in that index basis.

Reference parity note: SURVEY.md's reference measures only energy; this
is beyond-parity measurement capability (the standard sum-rule dispersion
estimator of the VMC literature, e.g. Feynman 1954; Hohenberg-Brinkman
PRB 10:128).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from qmcnn_tpu.lattice import Lattice

__all__ = ["exchange_shells", "sma_dispersion"]


def exchange_shells(ham, lattice: Lattice) -> List[Tuple[float, int]]:
    """Distinct (transverse coupling J, displacement site index) shells of
    an exchange Hamiltonian's bond list.

    Each returned displacement stands for ALL n_sites ordered pairs
    (i, i + delta) — the function canonicalizes bond orientation (delta vs
    -delta hash to one representative) and checks the count, so the
    first-moment formula may replace the bond sum by
    n_sites * C_t(delta) per entry. Raises for non-exchange Hamiltonians
    (a transverse field does not commute with S^z_q — the closed form
    above would silently miss its contribution) and for multi-site-basis
    lattices (displacements index the site grid).
    """
    from qmcnn_tpu.ops.hamiltonians import Heisenberg

    if not isinstance(ham, Heisenberg):
        raise ValueError(
            "SMA dispersion needs an exchange (Heisenberg-class) "
            f"Hamiltonian; got {type(ham).__name__} (a transverse field "
            "contributes uncomputed double-commutator terms)")
    if lattice.basis > 1:
        raise ValueError("SMA dispersion indexes displacements on the "
                         "site grid; multi-site-basis lattices are not "
                         "supported")
    if not lattice.pbc:
        raise ValueError("SMA dispersion assumes periodic boundaries "
                         "(translation-averaged correlators)")
    n = lattice.n_sites
    shape = tuple(int(x) for x in lattice.shape)
    coords = np.asarray(lattice.coords)
    bonds = np.asarray(ham._all_bonds)
    coup = np.asarray(ham._couplings, dtype=np.float64)

    def disp_index(delta: np.ndarray) -> int:
        return int(np.ravel_multi_index(tuple(delta % np.asarray(shape)),
                                        shape))

    counts: Dict[Tuple[float, int], int] = {}
    for k, (i, j) in enumerate(bonds):
        delta = coords[j] - coords[i]
        # canonicalize orientation: delta and -delta name the same
        # unordered shell (the formula's (1 - cos) and C_t are both even)
        fwd, rev = disp_index(delta), disp_index(-delta)
        key = (float(coup[k]), min(fwd, rev))
        counts[key] = counts.get(key, 0) + 1
    shells = []
    for (j_s, didx), cnt in sorted(counts.items()):
        if didx == 0:
            raise ValueError("bond with zero displacement")
        if cnt != n and cnt != n // 2:
            # n unordered bonds per displacement on a torus; n//2 when
            # delta = -delta mod L (an L=2 axis) halves the orbit
            raise ValueError(
                f"displacement {didx} covers {cnt} bonds, expected "
                f"{n} (or {n//2} for a self-inverse displacement) — "
                "non-translation-invariant bond list?")
        weight = cnt / n  # 1.0 normally; 0.5 for self-inverse shells
        shells.append((j_s * weight, didx))
    return shells


def sma_dispersion(shells: List[Tuple[float, int]],
                   ct: Dict[int, float],
                   corr: np.ndarray,
                   lattice: Lattice):
    """(f, S, omega) grids of shape ``lattice.shape``.

    ``shells`` from :func:`exchange_shells`; ``ct[didx]`` the measured
    transverse correlator C_t(delta) for each shell displacement;
    ``corr`` the [n_sites] S^z S^z correlation function (the measure
    CLI's ``szsz_corr``). omega(q) = f(q)/S(q) is NaN where S(q) is
    numerically zero (q = 0 in an S^z-conserving sector: 0/0).
    """
    shape = tuple(int(x) for x in lattice.shape)
    sq = np.fft.fftn(np.asarray(corr, dtype=np.float64).reshape(shape)).real
    # q.delta phase on the reciprocal index grid, one axis at a time
    grids = np.meshgrid(
        *[2.0 * np.pi * np.fft.fftfreq(L) * L for L in shape],
        indexing="ij")  # grids[d][k] = 2 pi k_d (integer frequency * 2pi/L)
    f = np.zeros(shape)
    for j_s, didx in shells:
        delta = np.asarray(lattice.coords[didx], dtype=np.float64)
        phase = sum(g * (d / L)
                    for g, d, L in zip(grids, delta, shape))
        f += -j_s * (1.0 - np.cos(phase)) * float(ct[didx])
    with np.errstate(divide="ignore", invalid="ignore"):
        omega = np.where(np.abs(sq) > 1e-12, f / sq, np.nan)
    return f, sq, omega
