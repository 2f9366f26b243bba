"""Group-equivariant CNN (GCNN) log-amplitude ansatz.

Reference parity note: the reference (dmaloneynygc/qmcnn, SURVEY.md R2) ships
a translation-averaged CNN; this module is an *accuracy extension* in the
same genre — a space-group equivariant network (Cohen & Welling group convs;
applied to NQS by Roth & MacDonald, PRB 104:235119 / arXiv:2104.05085) whose
features carry the regular representation of the square lattice's point group
C4v on top of the conv stack's built-in translation equivariance. Projecting
the readout onto a chosen 1-dim irrep (A1/A2/B1/B2 character) makes
log psi exactly symmetric under the FULL space group p4m — the standard
accuracy lever for frustrated models (J1-J2) where the plain CNN saturates.

TPU-native design:
  * A group conv over C4v is lowered to ONE dense circular convolution with
    expanded channels [k,k,G*Cin,G*Cout]: the big kernel is a pure gather of
    the base parameters with trace-time-constant indices, so XLA hoists its
    construction out of sampling scans and the MXU sees a single large conv.
  * Complex amplitudes as (re,im) float32 pairs ([[axon-tpu-no-complex64]]);
    complex group conv = Karatsuba, 3 real convs, exactly as models/cnn.py.
  * Everything fixed-shape; G=8 is a compile-time constant.

Equivariance math (kernel-transform convention): with correlation-style conv
y(p) = sum_o w[o] x(p+o) and (g.w)[o] := w[g^-1 o],
  conv(g.x, g.w) = g.(conv(x, w)), hence
  lifting:    y_g = conv(x, g.w)            -> y_g(u.x) = y_{u^-1 g}(u^-1 p)
  group conv: y_g = sum_h conv(f_h, g.(w[g^-1 h]))  (same regular transform)
Spatial-sum + character-weighted sum over g then gives
  psi(u.s) = chi(u) psi(s)  exactly (one forward, no symmetry averaging).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.models.cnn import _circular_pad, _real_conv, kernel_std
from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array

#: C4v one-dimensional irrep characters on the generators (R = 90deg
#: rotation, M = mirror). The 2-dim irrep E cannot label a 1-dim readout.
_CHARACTERS = {
    "A1": (1, 1),
    "A2": (1, -1),
    "B1": (-1, 1),
    "B2": (-1, -1),
}


@functools.lru_cache(maxsize=None)
def c4v_tables(k: int) -> tuple:
    """Group tables for C4v acting on a k x k conv kernel (k odd).

    Returns (G, inv, elem_idx, tap_perm, chars, grid_ops) as numpy arrays:
      * G = 8 group size; elements are R^r M^m, r in 0..3, m in 0..1.
      * inv[g]           index of g^-1
      * elem_idx[g, h]   index of g^-1 h (the kernel-slot map of group conv)
      * tap_perm[g, t]   (g.w)[tap t] = w[tap_perm[g, t]]  (k*k taps,
                         row-major over offsets -(k-1)//2 .. +(k-1)//2)
      * chars[irrep][g]  character of the 4 one-dim irreps
      * grid_ops[g]      (r, m): apply as rot90^r then flip^m on an [H, W]
                         grid for tests/transform checks
    """
    if k % 2 != 1:
        raise ValueError(f"GCNN needs an odd kernel size, got {k}")
    # 2x2 integer matrices on (row, col) displacement vectors.
    # R: 90deg rotation matching jnp.rot90(axes=(H, W)): (i, j) -> (j, -i)
    # M: mirror matching jnp.flip(axis=W): (i, j) -> (i, -j)
    R = np.array([[0, 1], [-1, 0]])
    M = np.array([[1, 0], [0, -1]])
    mats, words = [], []
    for m in range(2):
        for r in range(4):
            g = np.linalg.matrix_power(R, r) @ np.linalg.matrix_power(M, m)
            mats.append(g)
            words.append((r, m))
    G = len(mats)

    def find(mat) -> int:
        for i, m_ in enumerate(mats):
            if np.array_equal(m_, mat):
                return i
        raise AssertionError("not closed under composition")

    inv = np.array([find(np.round(np.linalg.inv(m)).astype(int))
                    for m in mats])
    elem_idx = np.array([[find(mats[inv[g]] @ mats[h]) for h in range(G)]
                         for g in range(G)])
    # tap permutation: offsets[tap_perm[g, t]] == g^-1 offsets[t]
    half = (k - 1) // 2
    offs = [(i, j) for i in range(-half, half + 1)
            for j in range(-half, half + 1)]
    off_index = {o: t for t, o in enumerate(offs)}
    tap_perm = np.zeros((G, k * k), np.int32)
    for g in range(G):
        gi = mats[inv[g]]
        for t, o in enumerate(offs):
            src = tuple(gi @ np.asarray(o))
            tap_perm[g, t] = off_index[src]
    # characters: chi(R^r M^m) = chi(R)^r chi(M)^m
    chars = {
        name: np.array([cr ** r * cm ** m for (r, m) in words], np.float32)
        for name, (cr, cm) in _CHARACTERS.items()
    }
    grid_ops = np.array(words, np.int32)
    return G, inv, elem_idx, tap_perm, chars, grid_ops


def grid_transform(grid: Array, r: int, m: int) -> Array:
    """Apply group element R^r M^m to [..., H, W] (last two axes)."""
    h_ax, w_ax = grid.ndim - 2, grid.ndim - 1
    if m:
        grid = jnp.flip(grid, axis=w_ax)
    return jnp.rot90(grid, k=r, axes=(h_ax, w_ax))


def _lift_kernel(w: Array, tap_perm: np.ndarray, k: int) -> Array:
    """[k,k,Cin,Cout] base -> [k,k,Cin,G*Cout] with block g = (g.w)."""
    G = tap_perm.shape[0]
    cin, cout = w.shape[-2], w.shape[-1]
    flat = w.reshape(k * k, cin, cout)
    big = flat[tap_perm]                       # [G, k*k, Cin, Cout]
    big = big.transpose(1, 2, 0, 3)            # [k*k, Cin, G, Cout]
    return big.reshape(k, k, cin, G * cout)


def _group_kernel(w: Array, elem_idx: np.ndarray, tap_perm: np.ndarray,
                  k: int) -> Array:
    """[G,k,k,Cin,Cout] base -> [k,k,G*Cin,G*Cout] group-conv kernel.

    Output block (g, h) = g.(w[g^-1 h]); one gather with trace-time indices:
    comb[g,h,t] selects (element elem_idx[g,h], tap tap_perm[g,t]).
    """
    G = elem_idx.shape[0]
    cin, cout = w.shape[-2], w.shape[-1]
    comb = (elem_idx[:, :, None] * (k * k)
            + tap_perm[:, None, :])            # [G, G, k*k]
    flat = w.reshape(G * k * k, cin, cout)
    big = flat[comb.reshape(-1)]               # [G*G*k*k, Cin, Cout]
    big = big.reshape(G, G, k * k, cin, cout)
    big = big.transpose(2, 1, 3, 0, 4)         # [k*k, h, Cin, g, Cout]
    return big.reshape(k, k, G * cin, G * cout)


def _conv(x: Array, w: Array, compute_dtype=jnp.float32) -> Array:
    """Circular VALID conv (periodic lattices only — GCNN requires PBC).

    Under reduced precision the output STAYS in compute_dtype: the GCNN
    stack keeps activations bf16 end-to-end (cast once at the input, once
    at the readout). Measured on v5e (BASELINE.md r2): per-layer cast-backs
    add f32 HBM round trips that make bf16 *slower* than f32, while the
    end-to-end form halves activation traffic on top of the 2x MXU rate.
    """
    return _real_conv(_circular_pad(x, w.shape[:-2]), w, compute_dtype,
                      cast_back=False)


class GroupConv(nn.Module):
    """One equivariant layer: lifting (lift=True) or C4v group conv.

    Parameters are the *base* kernels; the expanded conv kernel is a pure
    gather, built fresh each call (XLA hoists it out of sampling scans).
    Bias is shared across the group axis (required for equivariance).
    """

    features: int          # Cout per group element
    kernel_size: int       # odd
    lift: bool = False
    complex_params: bool = False
    param_scale: float = 0.05
    use_bias: bool = True
    init_mode: str = "fixed"
    #: extra multiplier on the init std (the log-psi stacks shrink the FINAL
    #: layer's init so the post-readout log-amplitude starts near-uniform)
    init_extra_scale: float = 1.0
    #: 'float32' or 'bfloat16' conv operands (params/activations stay f32;
    #: unlike the narrow CNN, the G-expanded conv IS MXU-rate-bound, so bf16
    #: pays here — energy-bias A/B in BASELINE.md before trusting a config)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, z):
        k = self.kernel_size
        cdt = jnp.dtype(self.compute_dtype)
        G, _, elem_idx, tap_perm, _, _ = c4v_tables(k)
        x0 = z.re if isinstance(z, C) else z
        if self.lift:
            cin = x0.shape[-1]
            shape = (k, k, cin, self.features)
            expand = lambda w: _lift_kernel(w, tap_perm, k)
            fan_in = k * k * cin
        else:
            cin = x0.shape[-1] // G
            shape = (G, k, k, cin, self.features)
            expand = lambda w: _group_kernel(w, elem_idx, tap_perm, k)
            # each output unit sums over all G input group elements
            fan_in = k * k * G * cin
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
            # real parameters: keep plain real arrays end-to-end
            out = _conv(x0, a, cdt)
        if self.use_bias:
            # cast the (f32) bias to the activation dtype — an f32 add
            # would silently promote the whole bf16 stack back to f32
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


class LogPsiGCNN(nn.Module):
    """log psi(s) with exact p4m (translations x C4v) symmetry.

    Stack: lifting group conv -> lncosh -> group convs -> lncosh -> spatial
    and channel sum per group element -> character-projected logsumexp over
    the 8 group elements:

      log psi = log( (1/G) sum_g chi(g) exp(S_g) ),   S_g = sum_{x,c} f_g

    chi(g) = -1 entries enter as a +i*pi shift on S_g, so the projection is
    a single complex logmeanexp — no symmetry averaging of forwards (the
    PointGroupAveraged wrapper costs 8 forwards; this costs one, with the
    symmetry built into the features).

    ``character``: A1 (fully symmetric, default), A2, B1, B2. Characters
    with -1 entries make psi sign-changing under those elements; use the
    complex form (or accept im in {0, pi}) — exactly what frustrated
    J1-J2 sign structures need.
    """

    lattice_shape: Tuple[int, ...]
    channels: Sequence[int] = (8, 8)
    kernel_size: int = 3
    complex_params: bool = False
    param_scale: float = 0.05
    character: str = "A1"
    #: 'fixed' or 'fan_in' (variance-preserving; param_scale = gain).
    #: Deep stacks (>= 4 layers) NEED fan_in: lncosh is quadratic near 0,
    #: so fixed-std init collapses (or NaNs) double-exponentially in depth.
    init_mode: str = "fixed"
    #: 'lncosh' or 'selu' (re/im-wise; pair with fan_in for deep stacks —
    #: measured: depth-6 lncosh has no stable init scale at all, collapsing
    #: at gain<=1.0 and NaN-ing at gain>=1.5, while selu+fan_in holds
    #: unit-scale signals; see cplx.selu_reim)
    activation: str = "lncosh"
    #: identity skips z <- act(conv(z)) + z on interior layers whose
    #: channel count matches the previous layer (never the lift layer —
    #: shape change — and never the LAST layer: its init is shrunk so the
    #: readout sum starts near-uniform, and a skip would smuggle O(1)
    #: features past the shrink, reviving the e^{+-10} init pathology).
    #: Group-equivariance is preserved: the identity commutes with the
    #: regular representation.
    residual: bool = False
    #: conv-operand precision, passed to every GroupConv (see there)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, s: Array) -> C:
        if len(self.lattice_shape) != 2:
            raise ValueError("LogPsiGCNN needs a 2D lattice")
        if self.character not in _CHARACTERS:
            raise ValueError(f"unknown C4v character {self.character!r}; "
                             f"pick one of {sorted(_CHARACTERS)}")
        k = min(self.kernel_size, min(self.lattice_shape))
        if k % 2 == 0:
            k -= 1
        G, _, _, _, chars, _ = c4v_tables(k)
        batch = s.shape[0]
        act_c0, act_r0 = cplx.ACTIVATIONS[self.activation]
        cdt = jnp.dtype(self.compute_dtype)
        if cdt == jnp.float32:
            act_c, act_r = act_c0, act_r0
        else:
            # bf16 STORAGE, f32 activation MATH: lncosh near 0 cancels
            # O(1) terms for a quadratically small result and bf16's
            # 8-bit mantissa turns that into a coherent bias (measured on
            # the CNN stack, tests/test_ansatz.py bf16 tests). The hero
            # configs use selu (no cancellation), but the guard keeps
            # bf16+lncosh honest too. XLA fuses upcast -> act -> downcast
            # into one elementwise kernel: no extra HBM traffic.
            def act_r(x):
                return act_r0(x.astype(jnp.float32)).astype(cdt)

            def act_c(zz):
                out = act_c0(C(zz.re.astype(jnp.float32),
                               zz.im.astype(jnp.float32)))
                return C(out.re.astype(cdt), out.im.astype(cdt))
        # activations live in compute_dtype end-to-end (one cast here, one
        # f32-accumulated cast at the readout) — see _conv for the measured
        # reason per-layer cast-backs lose
        x = s.reshape(batch, *self.lattice_shape, 1).astype(cdt)
        z = x
        n_layers = len(self.channels)
        for i, c in enumerate(self.channels):
            extra = 1.0
            if self.init_mode == "fan_in" and i == n_layers - 1:
                # shrink the last layer so the H*W*G*C readout sum starts
                # near-uniform (|log psi| ~ 0.1): O(1) self-normalized
                # features would otherwise give |log psi| ~ sqrt(terms),
                # i.e. e^{+-10} amplitude ratios, blown-up local energies
                # and ~0 acceptance at init (measured, BASELINE.md).
                terms = float(np.prod(self.lattice_shape)) * G * c
                extra = 0.1 / np.sqrt(terms)
            z_in = z
            z = GroupConv(features=c, kernel_size=k, lift=(i == 0),
                          complex_params=self.complex_params,
                          param_scale=self.param_scale,
                          init_mode=self.init_mode,
                          init_extra_scale=extra,
                          compute_dtype=self.compute_dtype)(z)
            z = act_c(z) if isinstance(z, C) else act_r(z)
            if (self.residual and 0 < i < n_layers - 1
                    and c == self.channels[i - 1]):
                # variance-preserving skip: plain z + z_in grows activation
                # variance linearly with depth, which measured as a NaN
                # blow-up mid-TRAINING (step ~650 of the depth-8 8x8 J1-J2
                # run) even though init was healthy — log psi has no
                # normalization layer to absorb the growth
                z = (z + z_in) * 0.7071067811865476
        # [B, H, W, G*C] -> per-element sums S_g: sum over space and C,
        # accumulated in f32 (XLA fuses the upcast into the reduction)
        c_last = self.channels[-1]
        sums = lambda t: t.reshape(batch, -1, G, c_last).astype(
            jnp.float32).sum((1, 3))
        z = cplx.as_c(z)
        s_g = C(sums(z.re), sums(z.im))        # [B, G]
        chi = np.asarray(chars[self.character])
        phase = jnp.asarray(np.where(chi < 0, np.pi, 0.0), jnp.float32)
        s_g = C(s_g.re, s_g.im + phase[None, :])
        return cplx.logmeanexp(s_g, axis=1)


class SpinFlipSymmetrized(nn.Module):
    """Z2 spin-inversion projection: psi_sym(s) = psi(s) + sector*psi(-s).

    log psi_sym = logmeanexp over {f(s), f(-s) (+ i*pi if sector = -1)}.
    The S^z = 0 Heisenberg/J1-J2 ground state on an even lattice lives in
    the sector = +1 (spin-parity even) subspace; projecting costs one extra
    forward and removes the odd-parity admixture exactly.
    """

    inner: nn.Module
    sector: int = 1

    @nn.compact
    def __call__(self, s: Array) -> C:
        if self.sector not in (1, -1):
            raise ValueError("spin-flip sector must be +1 or -1")
        both = jnp.concatenate([s, -s], axis=0)
        logs = cplx.as_c(self.inner(both))
        batch = s.shape[0]
        pair = logs.reshape(2, batch)
        if self.sector == -1:
            pair = C(pair.re, pair.im + jnp.asarray(
                [0.0, np.pi], jnp.float32)[:, None])
        return cplx.logmeanexp(pair, axis=0)
