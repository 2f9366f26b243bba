"""Measurement estimators beyond the energy (VMC observables layer).

The reference's estimator layer (SURVEY.md R5-R7) measures the energy;
production VMC studies additionally track the diagonal observables below
(all computed directly from walker configurations — no extra forwards) and
off-diagonal observables via the same amplitude-ratio machinery as the local
energy. Everything is batched over walkers and reduces with the same pmean
hooks as the energy estimators, so it shards for free.

Conventions: spin-1/2, S^z_i = s_i / 2 with s in {-1, +1}.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.lattice import Lattice
from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.vmc import pmean

Array = jax.Array


def magnetization(s: Array, axis_name: Optional[str] = None) -> Array:
    """<M_z> = <sum_i S^z_i> / N per site, averaged over walkers."""
    m = (s / 2.0).mean(axis=-1)  # per-walker magnetization per site
    return pmean(m.mean(), axis_name)


def magnetization_sq(s: Array, axis_name: Optional[str] = None) -> Array:
    """<M_z^2> per site^2 — order parameter for Ising-like order."""
    m = (s / 2.0).mean(axis=-1)
    return pmean((m * m).mean(), axis_name)


def _require_site_grid(lattice: Lattice, what: str) -> None:
    """Displacement-indexed estimators reshape flat sites to the grid —
    only valid for 1-site-basis lattices (prod(shape) == n_sites)."""
    if lattice.basis > 1:
        raise ValueError(
            f"{what} indexes displacements on the site grid; "
            f"geometry={lattice.geometry!r} has a {lattice.basis}-site "
            f"basis — use per-sublattice estimators instead")


def szsz_correlation(s: Array, lattice: Lattice,
                     axis_name: Optional[str] = None) -> Array:
    """C(r) = <S^z_0 S^z_r> averaged over translations, [n_sites] array.

    Uses the lattice's translation group: C(r) = mean_i <S^z_i S^z_{i+r}>,
    computed with one [M, N] x [M, N] rolled product per displacement via an
    FFT-free roll loop (N is small; this is host-trace-time unrolled).
    """
    _require_site_grid(lattice, "szsz_correlation")
    m, n = s.shape
    sz = s.reshape(m, *lattice.shape) / 2.0
    axes = tuple(range(1, 1 + lattice.ndim))
    cs = []
    coords = lattice.coords
    for r in range(n):
        shift = tuple(int(c) for c in coords[r])
        rolled = jnp.roll(sz, shift, axis=axes)
        cs.append((sz * rolled).reshape(m, -1).mean())
    c = jnp.stack(cs)  # [n_sites], displacement indexed like sites
    return pmean(c, axis_name)


def structure_factor(corr: Array, lattice: Lattice) -> np.ndarray:
    """S(q) = sum_r e^{iq.r} C(r) on the reciprocal lattice (host-side).

    For the antiferromagnet the peak sits at q = (pi, pi) (or pi in 1D).
    """
    c = np.asarray(corr).reshape(lattice.shape)
    return np.abs(np.fft.fftn(c))


def szsz_correlation_basis(s: Array, lattice: Lattice,
                           axis_name: Optional[str] = None) -> Array:
    """Sublattice-resolved C_ab(r) for multi-site-basis lattices.

    Returns [basis, basis, n_cells] with
    C_ab(r) = mean_c <S^z_{(c,a)} S^z_{(c+r,b)}> — the displacement r runs
    over CELL translations (the actual symmetry group of a Bravais lattice
    with a basis; per-site grid rolls are not symmetries there, which is
    why szsz_correlation refuses basis > 1). Works for basis == 1 too,
    where C_00(r) reproduces szsz_correlation exactly.
    """
    m = s.shape[0]
    sz = s.reshape(m, *lattice.shape, lattice.basis) / 2.0
    axes = tuple(range(1, 1 + lattice.ndim))
    n_cells = int(np.prod(lattice.shape))
    cell_coords = np.stack(
        np.unravel_index(np.arange(n_cells), lattice.shape), axis=-1)
    cs = []
    for r in range(n_cells):
        # roll by -r so rolled[c] = sz[c + r] (pins the a->b direction;
        # C_ab is not symmetric in (a, b) at fixed r, only under
        # (a, b, r) -> (b, a, -r))
        shift = tuple(-int(c) for c in cell_coords[r])
        rolled = jnp.roll(sz, shift, axis=axes)
        cs.append(jnp.einsum("m...a,m...b->ab", sz, rolled) / (m * n_cells))
    c = jnp.stack(cs, axis=-1)  # [basis, basis, n_cells]
    return pmean(c, axis_name)


def structure_factor_basis(corr: Array, lattice: Lattice,
                           phases=None) -> np.ndarray:
    """S_w(q) = |sum_ab w_a* w_b FFT_r[C_ab](q)| on the cell reciprocal
    grid (host-side), from szsz_correlation_basis output.

    ``phases`` is a [basis] weight vector w: all-ones probes uniform
    (ferro) order; the honeycomb Neel order parameter is w = (1, -1)
    (staggered BY BASIS — its peak sits at q = 0 because the two Neel
    sublattices live in the same cell).
    """
    b = lattice.basis
    c = np.asarray(corr).reshape(b, b, *lattice.shape)
    w = np.ones(b) if phases is None else np.asarray(phases)
    f = np.fft.fftn(c, axes=tuple(range(2, 2 + lattice.ndim)))
    return np.abs(np.einsum("a,b,ab...->...", np.conj(w), w, f))


def staggered_magnetization_sq(s: Array, lattice: Lattice,
                               axis_name: Optional[str] = None) -> Array:
    """<M_st^2> with M_st = (1/N) sum_i (-1)^i S^z_i — AFM order parameter."""
    signs = jnp.asarray(1.0 - 2.0 * lattice.sublattice_mask.astype(np.float32))
    m_st = (s * signs[None, :] / 2.0).mean(axis=-1)
    return pmean((m_st * m_st).mean(), axis_name)


def staggered_moments(s: Array, lattice: Lattice,
                      axis_name: Optional[str] = None):
    """(<M_st^2>, <M_st^4>) — the moments entering the Binder cumulant.

    U_4 = 1 - <M^4>/(3 <M^2>^2) is the standard dimensionless
    order-parameter diagnostic: 2/3 for a saturated (two-delta) ordered
    distribution, 0 for Gaussian disorder, and its finite-size crossing
    locates a transition without knowing critical exponents. Combine the
    returned moments ACROSS samples first (means of m2 and m4 separately),
    then form the ratio — see :func:`binder_cumulant`.
    """
    signs = jnp.asarray(1.0 - 2.0 * lattice.sublattice_mask.astype(np.float32))
    m_st = (s * signs[None, :] / 2.0).mean(axis=-1)
    m2 = m_st * m_st
    return pmean(m2.mean(), axis_name), pmean((m2 * m2).mean(), axis_name)


def binder_cumulant(m2_mean: float, m4_mean: float) -> float:
    """U_4 = 1 - <M^4> / (3 <M^2>^2) from sample-averaged moments."""
    if m2_mean <= 0:
        return float("nan")
    return float(1.0 - m4_mean / (3.0 * m2_mean * m2_mean))


def correlation_length(corr: Array, lattice: Lattice,
                       q_peak=None) -> float:
    """Second-moment correlation length from the structure factor
    (host-side; Cooper-Frey-Hohenberg estimator).

        xi = 1 / (2 sin(pi / L)) * sqrt(S(Q) / S(Q + dq) - 1)

    with Q the ordering vector (default: the S(q) peak) and dq the
    smallest nonzero momentum 2*pi/L along the first axis. On a finite
    lattice xi saturates near L when the state is long-range ordered
    (S(Q+dq) -> 0 gives +inf here — saturated order) and is ~0 for
    delta-correlated (flat-S) states; the standard use is xi/L crossings
    across system sizes.
    """
    _require_site_grid(lattice, "correlation_length")
    sq = structure_factor(corr, lattice)
    if q_peak is None:
        q_peak = np.unravel_index(int(np.argmax(sq)), sq.shape)
    q_peak = tuple(int(q) % L for q, L in zip(q_peak, lattice.shape))
    neighbor = ((q_peak[0] + 1) % lattice.shape[0],) + q_peak[1:]
    s_peak = float(sq[q_peak])
    s_next = float(sq[neighbor])
    L = lattice.shape[0]
    if s_next <= 0 or s_peak <= s_next:
        # saturated order (ratio -> inf) or no peak structure (ratio <= 1)
        return float("inf") if s_next < s_peak else 0.0
    return float(np.sqrt(s_peak / s_next - 1.0) / (2.0 * np.sin(np.pi / L)))


def spin_spin_connected(lattice: Lattice, displacement: int,
                        marshall: bool = False):
    """connected_fn for the OFF-DIAGONAL part of (1/N) sum_i S_i . S_{i+r}.

    (S^+_i S^-_j + S^-_i S^+_j)/2 flips an anti-aligned pair with
    coefficient 1/2; aligned pairs contribute 0 (masked). ``displacement``
    indexes the lattice like a site (same convention as szsz_correlation;
    1-site-basis lattices only); must be nonzero (r = 0 has no
    off-diagonal part).

    ``marshall=True`` when the wavefunction was trained in the
    Marshall-rotated basis (hamiltonian.marshall, the Heisenberg/J1-J2
    default): the rotation sends S^+-_i -> -S^+-_i on sublattice A, so
    opposite-sublattice pairs pick up a -1 — without it the measured
    transverse correlation has the wrong sign (caught by a live run: NN
    <S_i.S_j> came out +0.15 on a 4x4 AFM ground state instead of ~ -0.35).
    """
    _require_site_grid(lattice, "spin_spin_connected")
    n = lattice.n_sites
    coords = np.asarray(lattice.coords)
    shape = np.asarray(lattice.shape)
    perm = np.ravel_multi_index(
        ((coords + coords[displacement]) % shape).T, tuple(lattice.shape))
    if int(displacement) == 0:
        raise ValueError("displacement 0 is purely diagonal (S_i.S_i = 3/4)")
    eye = np.eye(n, dtype=np.float32)
    # flip_sign[k] = -1 on sites k and perm[k], +1 elsewhere
    flip_sign = jnp.asarray(1.0 - 2.0 * np.clip(eye + eye[perm], 0, 1))
    perm_j = jnp.asarray(perm)
    sign = np.full(n, 0.5 / n, np.float32)
    if marshall:
        sub = np.asarray(lattice.sublattice_mask)
        sign = np.where(sub != sub[perm], -sign, sign).astype(np.float32)
    coeff_k = jnp.asarray(sign)

    def connected(s: Array):
        s_i = s                       # [N] spin at site k (k = i index)
        s_j = s[perm_j]               # spin at site k + r
        anti = (s_i * s_j) < 0.0
        sp = s[None, :] * flip_sign   # [K=N, N]
        return sp, coeff_k, anti

    return connected


def spin_spin_correlation(log_psi_fn, params, s: Array, log_psi: C,
                          lattice: Lattice, displacement: int,
                          marshall: bool = False,
                          axis_name: Optional[str] = None,
                          chunk_size: Optional[int] = None) -> C:
    """Full C(r) = (1/N) sum_i <S_i . S_{i+r}> for one displacement.

    Diagonal S^z S^z part from configurations (free); transverse part via
    the amplitude-ratio machinery (costs N forwards per walker). Set
    ``marshall`` to match the Hamiltonian's basis (see
    spin_spin_connected). The isotropic Heisenberg result is 3x the SzSz
    correlation only in SU(2)-symmetric states — measuring both is the
    standard check.
    """
    m, n = s.shape
    if int(displacement) == 0:
        c = jnp.asarray(0.75)
        return C(pmean(c, axis_name) * jnp.ones(()), jnp.zeros(()))
    sz = s.reshape(m, *lattice.shape) / 2.0
    axes = tuple(range(1, 1 + lattice.ndim))
    shift = tuple(int(c) for c in lattice.coords[displacement])
    diag = (sz * jnp.roll(sz, shift, axis=axes)).reshape(m, -1).mean()
    off = offdiag_observable(
        log_psi_fn, params, s, log_psi,
        spin_spin_connected(lattice, displacement, marshall=marshall),
        axis_name=axis_name, chunk_size=chunk_size)
    return C(pmean(diag, axis_name) + off.re, off.im)


def offdiag_observable(log_psi_fn, params, s: Array, log_psi: C,
                       connected_fn, axis_name: Optional[str] = None,
                       chunk_size: Optional[int] = None) -> C:
    """<O> for an off-diagonal operator given its connected decomposition.

    ``connected_fn(s) -> (s' [K, N], coeff [K], mask [K])`` mirrors the
    Hamiltonian interface; the estimator is the same amplitude-ratio sum as
    the local energy: O_loc(s) = sum_k mask*coeff*psi(s')/psi(s).
    ``chunk_size`` bounds the [chunk * K, N] forward exactly like
    ops/local_energy.py does — measurement passes reuse the training
    auto-chunk so big-M checkpoints can be measured without OOM.
    """

    def compute(args):
        s_c, lp_c = args
        sp, coeff, mask = jax.vmap(connected_fn)(s_c)
        m, k, n = sp.shape
        lp_prime = log_psi_fn(params, sp.reshape(m * k, n)).reshape(m, k)
        ratio = cplx.cexp(C(lp_prime.re - lp_c.re[:, None],
                            lp_prime.im - lp_c.im[:, None]))
        w = coeff * mask.astype(coeff.dtype)
        return C((w * ratio.re).sum(-1), (w * ratio.im).sum(-1))

    m_total = s.shape[0]
    if chunk_size is None or chunk_size >= m_total:
        o_loc = compute((s, log_psi))
    else:
        if m_total % chunk_size:
            raise ValueError(
                f"chunk_size {chunk_size} must divide M={m_total}")
        n_chunks = m_total // chunk_size
        o_loc = jax.lax.map(
            compute, (s.reshape(n_chunks, chunk_size, -1),
                      log_psi.reshape(n_chunks, chunk_size)))
        o_loc = o_loc.reshape(m_total)
    return C(pmean(o_loc.re.mean(), axis_name),
             pmean(o_loc.im.mean(), axis_name))


def chirality_connected(lattice: Lattice):
    """connected_fn for the scalar spin chirality
    chi = (1/n_tri) sum_triangles S_i . (S_j x S_k)  (CCW-ordered
    triangles from ``lattice.triangles``).

    Expansion (spin-1/2, S^z = s/2): chi restricted to one triangle is
      (i/2) sum_cyclic S_a^z (S_b^+ S_c^- - S_b^- S_c^+),
    so each cyclic pair (b, c) contributes one pair-flip connected state
    with the PURELY IMAGINARY matrix element i * (-s_a s_b / 4) when
    (b, c) is anti-aligned. This function returns the REAL weights c_k;
    the observable is chi = i * z with z = offdiag_observable(...), i.e.
    chi = C(-z.im, z.re) — see ``scalar_chirality``. No Marshall variant:
    elementary triangles only exist on non-bipartite geometries, where
    the rotation does not apply.
    """
    tris = np.asarray(lattice.triangles)            # [T, 3] CCW
    t = len(tris)
    cyc = [(0, 1, 2), (1, 2, 0), (2, 0, 1)]
    a_idx = np.concatenate([tris[:, p[0]] for p in cyc])   # [K = 3T]
    b_idx = np.concatenate([tris[:, p[1]] for p in cyc])
    c_idx = np.concatenate([tris[:, p[2]] for p in cyc])
    n = lattice.n_sites
    k = len(a_idx)
    flips = np.ones((k, n), np.float32)
    flips[np.arange(k), b_idx] = -1.0
    flips[np.arange(k), c_idx] = -1.0
    flips_j = jnp.asarray(flips)
    a_j, b_j, c_j = map(jnp.asarray, (a_idx, b_idx, c_idx))

    def connected(s: Array):
        s_a, s_b, s_c = s[a_j], s[b_j], s[c_j]
        anti = (s_b * s_c) < 0.0
        coeff = -(s_a * s_b) / (4.0 * t)
        sp = s[None, :] * flips_j
        return sp, coeff, anti

    return connected


def scalar_chirality(log_psi_fn, params, s: Array, log_psi: C,
                     lattice: Lattice,
                     axis_name: Optional[str] = None,
                     chunk_size: Optional[int] = None) -> C:
    """<chi> = (1/n_tri) sum_t <S_i . (S_j x S_k)> over CCW triangles.

    The order parameter for chiral spin liquids / chiral symmetry
    breaking on triangular and kagome lattices; identically 0 for any
    time-reversal-invariant state (e.g. any real-amplitude psi) — a
    finite value requires complex amplitudes AND broken chirality.
    """
    z = offdiag_observable(log_psi_fn, params, s, log_psi,
                           chirality_connected(lattice),
                           axis_name=axis_name, chunk_size=chunk_size)
    return C(-z.im, z.re)  # chi = i * z


def renyi2_swap(log_psi_fn, params, s1: Array, s2: Array,
                log_psi1: C, log_psi2: C, region: Array,
                sector_mask: bool = False,
                axis_name: Optional[str] = None) -> C:
    """<SWAP_A> = Tr(rho_A^2) estimator via the replica swap trick.

    Renyi-2 entanglement entropy S_2(A) = -ln Tr(rho_A^2), with
    Tr(rho_A^2) = <psi x psi| SWAP_A |psi x psi> / <psi|psi>^2 estimated
    over two INDEPENDENT walker batches s1, s2 ~ |psi|^2 (Hastings et al.,
    PRL 104:157201 (2010)):

      swap_loc(s, s') = psi(t) psi(t') / (psi(s) psi(s')),
      t  = s  with region-A spins replaced by s'_A,
      t' = s' with region-A spins replaced by s_A.

    Marshall-rotated bases need NO correction here: any diagonal rotation
    of product form D(s) = prod_i d_i(s_i) (the Marshall sign is one)
    satisfies D(t)D(t') = D(s)D(s') exactly — each site keeps its pair of
    replica values, merely exchanged — so the rotation cancels from the
    ratio.

    ``sector_mask=True`` zeroes pairs whose region-A magnetizations differ.
    For a state that is an exact S^z-sector eigenstate those terms
    contribute exactly 0 to Tr(rho_A^2) (rho_A is block-diagonal in m_A),
    but an unconstrained ansatz trained only inside the sector (CNN/GCNN
    under exchange moves) returns unphysical amplitudes for the
    out-of-sector swapped configs — masking removes that bias exactly.

    Returns the complex mean <SWAP_A> (Im -> 0 in expectation); take
    S_2 = -ln Re on the host. pmean'd, so it shards like the energy.
    """
    ratio = renyi2_swap_local(log_psi_fn, params, s1, s2, log_psi1,
                              log_psi2, region, sector_mask=sector_mask)
    return C(pmean(ratio.re.mean(), axis_name),
             pmean(ratio.im.mean(), axis_name))


def renyi2_swap_local(log_psi_fn, params, s1: Array, s2: Array,
                      log_psi1: C, log_psi2: C, region: Array,
                      sector_mask: bool = False) -> C:
    """Per-pair swap_loc values [M] (see renyi2_swap); no reduction —
    used directly by exact-enumeration tests with |psi|^2 pair weights."""
    region = jnp.asarray(region).astype(jnp.float32)  # [N] 1.0 inside A
    t1 = s1 * (1.0 - region) + s2 * region
    t2 = s2 * (1.0 - region) + s1 * region
    lp_t1 = log_psi_fn(params, t1)
    lp_t2 = log_psi_fn(params, t2)
    ratio = cplx.cexp(C(
        lp_t1.re + lp_t2.re - log_psi1.re - log_psi2.re,
        lp_t1.im + lp_t2.im - log_psi1.im - log_psi2.im))
    if sector_mask:
        keep = ((s1 * region).sum(-1) == (s2 * region).sum(-1))
        w = keep.astype(jnp.float32)
        ratio = C(ratio.re * w, ratio.im * w)
    return ratio


def renyi2_entropy(swap_mean: float) -> float:
    """S_2 = -ln Re<SWAP_A> (host-side; NaN if the estimate is <= 0,
    which signals too few samples for the exponentially small overlap)."""
    v = float(np.real(swap_mean))
    return float(-np.log(v)) if v > 0 else float("nan")


def dimer_correlation(s: Array, lattice: Lattice, direction: int = 0,
                      axis_name: Optional[str] = None
                      ) -> tuple[Array, Array]:
    """z-dimer correlations: the (diagonal, configuration-only) probe of
    valence-bond-solid order, the competing order at J1-J2 ~ 0.5
    (SURVEY.md §6's frustrated configs).

    With the bond-dimer field d_i = S^z_i S^z_{i+e_a} (a = ``direction``),
    returns (C_D [n_sites], <d>):  C_D(r) = mean_i <d_i d_{i+r}> — the
    CONNECTED correlator and structure factor are formed downstream via
    <d>. Full SU(2) dimer correlators need 4-point off-diagonal terms
    (4 forwards per pair); the z-z component shares the same symmetry
    breaking pattern and is the standard cheap probe. 2D hypercubic only.
    """
    _require_site_grid(lattice, "dimer_correlation")
    if lattice.ndim != 2:
        raise ValueError("dimer_correlation is for 2D lattices")
    m, n = s.shape
    sz = s.reshape(m, *lattice.shape) / 2.0
    axes = (1, 2)
    shift = [0, 0]
    shift[direction] = -1  # neighbor at +e_a
    d = sz * jnp.roll(sz, tuple(shift), axis=axes)   # [M, Lx, Ly]
    cs = []
    coords = lattice.coords
    for r in range(n):
        sh = tuple(int(c) for c in coords[r])
        cs.append((d * jnp.roll(d, sh, axis=axes)).reshape(m, -1).mean())
    c = jnp.stack(cs)
    d_mean = d.reshape(m, -1).mean()
    return pmean(c, axis_name), pmean(d_mean, axis_name)


def dimer_structure_factor(corr: Array, d_mean: float, lattice: Lattice
                           ) -> np.ndarray:
    """S_D(q) = |FFT[C_D(r) - <d>^2]| (host-side).

    Columnar VBS order peaks at q = (pi, 0) for x-bonds; the connected
    subtraction removes the trivial q = 0 weight of <d> != 0.
    """
    c = np.asarray(corr).reshape(lattice.shape) - float(d_mean) ** 2
    return np.abs(np.fft.fftn(c))


def total_spin_sq(log_psi_fn, params, s: Array, log_psi: C,
                  lattice: Lattice, marshall: bool = False,
                  axis_name: Optional[str] = None,
                  pair_chunk: int = 1024) -> C:
    """<S^2> of the total spin S = sum_i S_i (SU(2) Casimir).

    The sharpest state diagnostic for spin systems: 0 for a singlet
    ground state, S(S+1) = 2 for the triplet first excitation, etc. —
    e.g. validating what the excited-state penalty (ops/penalty.py)
    actually found.

    Decomposition per walker (s in {-1,+1}, S^z = s/2):
      S^2_loc(s) = M_z^2 + N/2
                   + sum_{i<j, anti} sign_ij * psi(s^{ij}) / psi(s)
    where M_z = sum_i s_i / 2, s^{ij} swaps the anti-aligned pair, and
    sign_ij = -1 for opposite-sublattice pairs when the state lives in the
    Marshall-rotated basis (same convention as spin_spin_connected).

    The off-diagonal sum runs over ALL N(N-1)/2 pairs — chunked through
    ``pair_chunk`` so the [M, K, N] connected batch stays bounded
    (measure-time cost: N(N-1)/2 forwards per walker).
    """
    m, n = s.shape
    pairs = np.array([(i, j) for i in range(n) for j in range(i + 1, n)],
                     np.int32)
    if marshall:
        sub = np.asarray(lattice.sublattice_mask)
        signs = np.where(sub[pairs[:, 0]] != sub[pairs[:, 1]],
                         -1.0, 1.0).astype(np.float32)
    else:
        signs = np.ones(len(pairs), np.float32)

    mz = s.sum(-1) / 2.0
    o_re = mz * mz + n / 2.0   # [M] diagonal part
    o_im = jnp.zeros_like(o_re)
    for lo in range(0, len(pairs), pair_chunk):
        pk = pairs[lo:lo + pair_chunk]
        sgn = jnp.asarray(signs[lo:lo + pair_chunk])
        kk = len(pk)
        flips = np.ones((kk, n), np.float32)
        flips[np.arange(kk), pk[:, 0]] = -1.0
        flips[np.arange(kk), pk[:, 1]] = -1.0
        anti = (s[:, pk[:, 0]] * s[:, pk[:, 1]]) < 0.0      # [M, kk]
        sp = s[:, None, :] * jnp.asarray(flips)[None]        # [M, kk, N]
        lp_prime = log_psi_fn(params, sp.reshape(m * kk, n)).reshape(m, kk)
        ratio = cplx.cexp(C(lp_prime.re - log_psi.re[:, None],
                            lp_prime.im - log_psi.im[:, None]))
        w = sgn * anti.astype(jnp.float32)
        o_re = o_re + (w * ratio.re).sum(-1)
        o_im = o_im + (w * ratio.im).sum(-1)
    return C(pmean(o_re.mean(), axis_name), pmean(o_im.mean(), axis_name))


def translation_projected_log_psi(log_psi_fn, lattice_shape,
                                  momentum, shift_stride: int = 1):
    """(params, s) -> log (P_q psi)(s): the momentum-q translation
    projection evaluated as a FUNCTION of the unprojected model.

    Same math as models.cnn.TranslationAveraged (logmeanexp over rolled
    configs with e^{i k.a} characters), but packaged for measurement-time
    use on states TRAINED WITHOUT the projection — the building block of
    the sector-energy ratio estimator below. Costs T = prod(L_d /
    stride) forwards per amplitude.
    """
    import itertools

    shifts = list(itertools.product(
        *[range(0, L, shift_stride) for L in lattice_shape]))
    k = [2.0 * np.pi * m / L for m, L in zip(momentum, lattice_shape)]
    phases = np.asarray([sum(kd * ad for kd, ad in zip(k, shift))
                         for shift in shifts], dtype=np.float32)

    def plog(params, s):
        batch = s.shape[0]
        grid = s.reshape(batch, *lattice_shape)
        axes = tuple(range(1, 1 + len(lattice_shape)))
        rolled = jnp.stack([jnp.roll(grid, sh, axis=axes).reshape(batch, -1)
                            for sh in shifts], axis=0)  # [T, B, N]
        t = rolled.shape[0]
        logs = log_psi_fn(params, rolled.reshape(t * batch, -1))
        logs = C(logs.re.reshape(t, batch), logs.im.reshape(t, batch))
        logs = C(logs.re, logs.im + jnp.asarray(phases)[:, None])
        return cplx.logmeanexp(logs, axis=0)

    return plog


def sector_energy_ratio(log_psi_fn, params, s: Array, log_psi: C,
                        ham, lattice_shape, momentum,
                        shift_stride: int = 1,
                        chunk_size: Optional[int] = None,
                        axis_name: Optional[str] = None):
    """Momentum-sector energy E_q by RATIO estimators under |psi|^2.

    The r4 (pi,pi) refutation (BASELINE.md r4): OPTIMIZING a projected
    net fails because sampling |P psi|^2 places walkers where log|P psi|
    sits near nodal singularities and the E_loc/score variances diverge.
    The fix named there — an SMA-style ratio estimator — MEASURES the
    sector energy of an existing state without ever sampling the
    projected distribution. With [P_q, H] = 0 and P_q^2 = P_q = P_q^+:

      E_q = <psi|H P_q|psi> / <psi|P_q|psi>
          = E_{|psi|^2}[num(s)] / E_{|psi|^2}[den(s)],
      den(s) = (P_q psi)(s) / psi(s)          (T amplitude ratios)
      num(s) = (H P_q psi)(s) / psi(s)
             = diag(s) den(s) + sum_k mel_k (P_q psi)(s'_k) / psi(s)

    Every integrand is a bounded sum of amplitude ratios at translated /
    connected configurations — no |P psi|^2 sampling, no divergence. The
    price is variance amplification when the sector weight <P_q> is
    small (den averages to the overlap), which error bars expose
    honestly: jackknife E_q on the host from the returned per-sample
    arrays. Cost: (K+1) x T forwards per walker; chunk_size bounds the
    working set exactly as local_energy does.

    Returns (num C[M], den C[M]); E_q = sum(num)/sum(den) (complex
    division; Im is a consistency diagnostic). Gap cross-check: compare
    E_q - E_0 against the SMA bound f(q)/S(q) on the same state.
    """
    plog = translation_projected_log_psi(log_psi_fn, lattice_shape,
                                         momentum, shift_stride)

    def compute(args):
        s_c, lp_c = args
        m = s_c.shape[0]
        kk = ham.n_conn
        s_prime, mel, mask = ham.connected_batch(s_c)
        pl_prime = plog(params, s_prime.reshape(m * kk, -1))
        pl_prime = C(pl_prime.re.reshape(m, kk), pl_prime.im.reshape(m, kk))
        ratio = cplx.cexp(C(pl_prime.re - lp_c.re[:, None],
                            pl_prime.im - lp_c.im[:, None]))
        w = mel * mask.astype(mel.dtype)
        offdiag = C((w * ratio.re).sum(-1), (w * ratio.im).sum(-1))
        pl_c = plog(params, s_c)
        den = cplx.cexp(C(pl_c.re - lp_c.re, pl_c.im - lp_c.im))
        diag = ham.diag_batch(s_c)
        num = C(diag * den.re + offdiag.re, diag * den.im + offdiag.im)
        return num, den

    m_total = s.shape[0]
    if chunk_size is None or chunk_size >= m_total:
        num, den = compute((s, log_psi))
    else:
        if m_total % chunk_size:
            raise ValueError(
                f"chunk_size {chunk_size} must divide M={m_total}")
        n_chunks = m_total // chunk_size
        num, den = jax.lax.map(
            compute, (s.reshape(n_chunks, chunk_size, -1),
                      C(log_psi.re.reshape(n_chunks, chunk_size),
                        log_psi.im.reshape(n_chunks, chunk_size))))
        num = C(num.re.reshape(m_total), num.im.reshape(m_total))
        den = C(den.re.reshape(m_total), den.im.reshape(m_total))
    return num, den


def sector_energy_from_samples(num: C, den: C):
    """(E_q, E_q_err, sector_weight): complex-ratio mean with a
    leave-one-out jackknife error on Re E_q (host-side, numpy)."""
    nr = np.asarray(num.re, np.float64) + 1j * np.asarray(num.im, np.float64)
    dr = np.asarray(den.re, np.float64) + 1j * np.asarray(den.im, np.float64)
    m = nr.size
    e_full = (nr.sum() / dr.sum()).real
    if m < 4:
        return float(e_full), float("nan"), float(np.abs(dr.mean()))
    loo = ((nr.sum() - nr) / (dr.sum() - dr)).real
    err = np.sqrt((m - 1) / m * ((loo - loo.mean()) ** 2).sum())
    return float(e_full), float(err), float(np.abs(dr.mean()))
