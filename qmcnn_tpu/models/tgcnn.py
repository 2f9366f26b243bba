"""D6-equivariant GCNN for the triangular lattice (space group p6m).

Reference parity note: the reference (SURVEY.md R2) ships a square-lattice
translation-averaged CNN; models/gcnn.py extends it to the square point
group C4v. This module is the same construction for the *triangular*
lattice embedded in the L x L index grid (lattice.py geometry
'triangular'): features carry the regular representation of the dihedral
group D6 (12 elements) on top of conv translation equivariance, and a
character-projected readout makes log psi exactly symmetric under the
full space group p6m in one forward.

Group action on the embedded torus. Grid coords (m, n) represent the
displacement m*a1 + n*a2 (a1, a2 at 60 degrees). The 60-degree rotation
maps a1 -> a2, a2 -> a2 - a1, i.e. R(m, n) = (-n, m+n); the mirror that
swaps the primitive vectors is M(m, n) = (n, m). Both are integer
unimodular maps, so they act on the L x L torus (square shapes only) and
permute the NN offset set {+-a1, +-a2, +-(a1-a2)} — conv equivariance
needs nothing beyond linearity: conv(g.x, g.w) = g.(conv(x, w)) holds for
ANY invertible integer matrix g when (g.w)[o] := w[g^-1 o].

Kernel support. A square k x k tap grid is NOT closed under the D6 shear
matrices; kernels live on hexagonal STARS (unions of full D6 orbits of
offsets) embedded in the smallest enclosing square grid with zeros
elsewhere. radius 1 = 7 taps in a 3x3 grid ('kernel_size: 3'); radius 2
adds the sqrt(3) and 2a shells = 19 taps in a 5x5 grid ('kernel_size:
5'). The zero taps cost ~20% wasted MXU FLOPs and buy the whole XLA conv
path unchanged (one dense circular conv per layer, same as gcnn.py).

Everything else (bf16 end-to-end activations, Karatsuba complex convs,
fan_in/selu deep recipe, variance-preserving residuals, logmeanexp
character readout) mirrors models/gcnn.py — see the measured design notes
there.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.models.cnn import kernel_std
from qmcnn_tpu.models.gcnn import _conv
from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array

#: D6 one-dimensional irrep characters on the generators (R = 60deg
#: rotation, M = a1<->a2 mirror). The two 2-dim irreps E1/E2 cannot label
#: a 1-dim readout.
_CHARACTERS = {
    "A1": (1, 1),
    "A2": (1, -1),
    "B1": (-1, 1),
    "B2": (-1, -1),
}

#: star shells by radius: each tuple is one D6 orbit seed; the orbit is
#: generated at table-build time so closure is by construction
_SHELL_SEEDS = {
    1: [(0, 0), (1, 0)],
    2: [(0, 0), (1, 0), (1, 1), (2, 0)],
}


@functools.lru_cache(maxsize=None)
def d6_tables(radius: int) -> tuple:
    """Group tables for D6 acting on the hexagonal star of ``radius``.

    Returns (G, offsets, inv, elem_idx, tap_perm, chars, mats):
      * G = 12; element g = R^r M^m (r in 0..5, m in 0..1) as a 2x2
        integer matrix on (row, col) = (m, n) grid displacements
      * offsets  [T, 2] star tap offsets (D6-closed by construction)
      * inv[g]           index of g^-1
      * elem_idx[g, h]   index of g^-1 h
      * tap_perm[g, t]   (g.w)[tap t] = w[tap_perm[g, t]]
      * chars[irrep][g]  characters of the four 1-dim irreps
      * mats [G, 2, 2]   the integer matrices (site-action in tests)
    """
    if radius not in _SHELL_SEEDS:
        raise ValueError(f"tgcnn radius must be one of "
                         f"{sorted(_SHELL_SEEDS)}, got {radius}")
    R = np.array([[0, -1], [1, 1]])   # (m, n) -> (-n, m + n)
    M = np.array([[0, 1], [1, 0]])    # (m, n) -> (n, m)
    mats, words = [], []
    for m in range(2):
        for r in range(6):
            g = np.linalg.matrix_power(R, r) @ np.linalg.matrix_power(M, m)
            mats.append(g)
            words.append((r, m))
    G = len(mats)

    def find(mat) -> int:
        for i, m_ in enumerate(mats):
            if np.array_equal(m_, mat):
                return i
        raise AssertionError("D6 not closed under composition")

    inv = np.array([find(np.round(np.linalg.inv(m)).astype(int))
                    for m in mats])
    elem_idx = np.array([[find(mats[inv[g]] @ mats[h]) for h in range(G)]
                         for g in range(G)])
    # star = union of D6 orbits of the shell seeds
    offs: list = []
    seen = set()
    for seed in _SHELL_SEEDS[radius]:
        for g in mats:
            o = tuple(g @ np.asarray(seed))
            if o not in seen:
                seen.add(o)
                offs.append(o)
    off_index = {o: t for t, o in enumerate(offs)}
    T = len(offs)
    tap_perm = np.zeros((G, T), np.int32)
    for g in range(G):
        gi = mats[inv[g]]
        for t, o in enumerate(offs):
            src = tuple(gi @ np.asarray(o))
            tap_perm[g, t] = off_index[src]  # closed by construction
    chars = {
        name: np.array([cr ** r * cm ** m for (r, m) in words], np.float32)
        for name, (cr, cm) in _CHARACTERS.items()
    }
    return (G, np.asarray(offs, np.int32), inv, elem_idx, tap_perm, chars,
            np.asarray(mats, np.int32))


def d6_site_perms(lattice_shape: Tuple[int, int]) -> np.ndarray:
    """[G, N] site permutations: (g.s)[p] = s[perm[g, p]] on the torus.

    perm[g, p] = flat index of g^-1 p (mod L). Test/diagnostic helper —
    the model itself never permutes sites.
    """
    lx, ly = lattice_shape
    if lx != ly:
        raise ValueError("D6 point-group action needs a square torus "
                         f"(got {lattice_shape})")
    G, _, inv, _, _, _, mats = d6_tables(1)
    coords = np.stack(np.meshgrid(np.arange(lx), np.arange(ly),
                                  indexing="ij"), -1).reshape(-1, 2)
    perms = np.zeros((G, lx * ly), np.int64)
    for g in range(G):
        src = (coords @ mats[inv[g]].T) % np.array([lx, ly])
        perms[g] = src[:, 0] * ly + src[:, 1]
    return perms


def _star_to_grid(star: Array, offsets: np.ndarray) -> Array:
    """[..., T] tap-indexed -> [..., k, k] grid kernel with zeros off-star.

    Leading axes are arbitrary; the scatter indices are trace-time
    constants, so XLA hoists kernel construction out of sampling scans
    exactly as in gcnn.py.
    """
    half = int(np.abs(offsets).max())
    k = 2 * half + 1
    lead = star.shape[:-1]
    grid = jnp.zeros(lead + (k * k,), star.dtype)
    flat_idx = (offsets[:, 0] + half) * k + (offsets[:, 1] + half)
    grid = grid.at[..., flat_idx].set(star)
    return grid.reshape(lead + (k, k))


def _star_lift_kernel(w: Array, tap_perm: np.ndarray,
                      offsets: np.ndarray) -> Array:
    """[T,Cin,Cout] base -> [k,k,Cin,G*Cout] lifting kernel."""
    G = tap_perm.shape[0]
    cin, cout = w.shape[-2], w.shape[-1]
    big = w[tap_perm]                          # [G, T, Cin, Cout]
    big = big.transpose(0, 2, 3, 1)            # [G, Cin, Cout, T]
    grid = _star_to_grid(big, offsets)         # [G, Cin, Cout, k, k]
    k = grid.shape[-1]
    return grid.transpose(3, 4, 1, 0, 2).reshape(k, k, cin, G * cout)


def _star_group_kernel(w: Array, elem_idx: np.ndarray,
                       tap_perm: np.ndarray, offsets: np.ndarray) -> Array:
    """[G,T,Cin,Cout] base -> [k,k,G*Cin,G*Cout] group-conv kernel.

    Output block (g, h) = g.(w[g^-1 h]), one gather with trace-time
    indices (same construction as gcnn._group_kernel, star-tap indexed).
    """
    G, T = tap_perm.shape
    cin, cout = w.shape[-2], w.shape[-1]
    comb = elem_idx[:, :, None] * T + tap_perm[:, None, :]   # [G, G, T]
    flat = w.reshape(G * T, cin, cout)
    big = flat[comb.reshape(-1)].reshape(G, G, T, cin, cout)
    big = big.transpose(0, 3, 1, 4, 2)         # [g, Cin, h, Cout, T]
    grid = _star_to_grid(big, offsets)         # [g, Cin, h, Cout, k, k]
    k = grid.shape[-1]
    # -> [k, k, (h, Cin), (g, Cout)]: input blocked by group element h,
    # output by g — the same layout the readout's [.., G, C] reshape uses
    return grid.transpose(4, 5, 2, 1, 0, 3).reshape(k, k, G * cin, G * cout)


class TriGroupConv(nn.Module):
    """One D6-equivariant layer: lifting (lift=True) or group conv.

    Mirrors gcnn.GroupConv; parameters are star-tap indexed, the dense
    [k,k,...] conv kernel is a pure gather + scatter of trace-time
    constants.
    """

    features: int
    radius: int = 1
    lift: bool = False
    complex_params: bool = False
    param_scale: float = 0.05
    use_bias: bool = True
    init_mode: str = "fixed"
    init_extra_scale: float = 1.0
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, z):
        cdt = jnp.dtype(self.compute_dtype)
        G, offsets, _, elem_idx, tap_perm, _, _ = d6_tables(self.radius)
        T = len(offsets)
        x0 = z.re if isinstance(z, C) else z
        if self.lift:
            cin = x0.shape[-1]
            shape = (T, cin, self.features)
            expand = lambda w: _star_lift_kernel(w, tap_perm, offsets)
            fan_in = T * cin
        else:
            cin = x0.shape[-1] // G
            shape = (G, T, cin, self.features)
            expand = lambda w: _star_group_kernel(w, elem_idx, tap_perm,
                                                  offsets)
            fan_in = T * G * cin
        init = nn.initializers.normal(self.init_extra_scale * kernel_std(
            self.init_mode, self.param_scale, fan_in,
            n_parts=2 if self.complex_params else 1))
        a = expand(self.param("kernel_re", init, shape, jnp.float32))
        if self.complex_params:
            b = expand(self.param("kernel_im", init, shape, jnp.float32))
            if isinstance(z, C):
                p1 = _conv(z.re, a, cdt)
                p2 = _conv(z.im, b, cdt)
                p3 = _conv(z.re + z.im, a + b, cdt)
                out = C(p1 - p2, p3 - p1 - p2)
            else:
                out = C(_conv(z, a, cdt), _conv(z, b, cdt))
        else:
            out = _conv(x0, a, cdt)
        if self.use_bias:
            odt = (out.re if isinstance(out, C) else out).dtype
            tile = lambda v: jnp.tile(v, (G,)).astype(odt)
            br = tile(self.param("bias_re", nn.initializers.zeros,
                                 (self.features,), jnp.float32))
            if self.complex_params:
                bi = tile(self.param("bias_im", nn.initializers.zeros,
                                     (self.features,), jnp.float32))
                out = C(out.re + br, out.im + bi)
            else:
                out = out + br
        return out


class LogPsiTriGCNN(nn.Module):
    """log psi(s) with exact p6m (translations x D6) symmetry on the
    triangular torus. Square shapes only (the rotation mixes axes).

    Same stack/readout design as gcnn.LogPsiGCNN (see the measured notes
    there): lift -> act -> group convs -> act -> per-element spatial+
    channel sums -> character-projected logmeanexp over the 12 elements.
    """

    lattice_shape: Tuple[int, ...]
    channels: Sequence[int] = (8, 8)
    radius: int = 1
    complex_params: bool = False
    param_scale: float = 0.05
    character: str = "A1"
    init_mode: str = "fixed"
    activation: str = "lncosh"
    residual: bool = False
    compute_dtype: str = "float32"

    def __call__(self, s: Array) -> C:
        """Character-projected readout over the per-element sums.

        Numerical note (measured, tests/test_tgcnn.py): for the SIGN
        characters (A2/B1/B2) a *shallow* stack produces a near-null
        state — after spatial summing, S_g is nearly degenerate on cosets
        of the {1, R^3} x {1, M'} subgroup, and the coset character-sum
        is exactly zero for those irreps, so sum_g chi(g) e^{S_g} is a
        deep cancellation whose value is f32 rounding residue. This is an
        expressivity property of shallow equivariant stacks, not a bug
        (the cancellation IS the projector removing the symmetric part);
        use >= 3 layers when targeting sign-character sectors. A1 (the
        ground-state sector) has no cancellation at any depth.
        """
        s_g = self.elements(s)                 # [B, G]
        G, _, _, _, _, chars, _ = d6_tables(self.radius)
        chi = np.asarray(chars[self.character])
        phase = jnp.asarray(np.where(chi < 0, np.pi, 0.0), jnp.float32)
        s_g = C(s_g.re, s_g.im + phase[None, :])
        return cplx.logmeanexp(s_g, axis=1)

    @nn.compact
    def elements(self, s: Array) -> C:
        """Per-group-element sums S_g [B, G] (the regular-rep features
        after spatial+channel reduction): S_g(u.s) = S_{u^-1 g}(s)."""
        if len(self.lattice_shape) != 2 \
                or self.lattice_shape[0] != self.lattice_shape[1]:
            raise ValueError("LogPsiTriGCNN needs a square 2D torus, got "
                             f"{self.lattice_shape}")
        if self.character not in _CHARACTERS:
            raise ValueError(f"unknown D6 character {self.character!r}; "
                             f"pick one of {sorted(_CHARACTERS)}")
        if 2 * self.radius + 1 > min(self.lattice_shape):
            raise ValueError(f"radius {self.radius} star exceeds the "
                             f"lattice {self.lattice_shape}")
        G, _, _, _, _, chars, _ = d6_tables(self.radius)
        batch = s.shape[0]
        act_c, act_r = cplx.ACTIVATIONS[self.activation]
        x = s.reshape(batch, *self.lattice_shape, 1).astype(
            jnp.dtype(self.compute_dtype))
        z = x
        n_layers = len(self.channels)
        for i, c in enumerate(self.channels):
            extra = 1.0
            if self.init_mode == "fan_in" and i == n_layers - 1:
                # shrink the last layer so the readout sum starts
                # near-uniform — same measured pathology as gcnn.py
                terms = float(np.prod(self.lattice_shape)) * G * c
                extra = 0.1 / np.sqrt(terms)
            z_in = z
            z = TriGroupConv(features=c, radius=self.radius, lift=(i == 0),
                             complex_params=self.complex_params,
                             param_scale=self.param_scale,
                             init_mode=self.init_mode,
                             init_extra_scale=extra,
                             compute_dtype=self.compute_dtype)(z)
            z = act_c(z) if isinstance(z, C) else act_r(z)
            if (self.residual and 0 < i < n_layers - 1
                    and c == self.channels[i - 1]):
                z = (z + z_in) * 0.7071067811865476
        c_last = self.channels[-1]
        sums = lambda t: t.reshape(batch, -1, G, c_last).astype(
            jnp.float32).sum((1, 3))
        z = cplx.as_c(z)
        return C(sums(z.re), sums(z.im))       # [B, G]
