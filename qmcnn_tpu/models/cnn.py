"""CNN log-amplitude ansaetze log psi_theta(s) (SURVEY.md R2 / N2).

Reference parity: circular-padded convolutions matching the lattice PBC,
ln-cosh activations, complex-valued amplitudes, exact translation invariance
via a spatial-sum readout, and optional explicit translation averaging.

TPU-native choices:
  * The axon TPU backend implements neither complex dtypes nor complex convs,
    so complex amplitudes live as explicit (re, im) float32 pairs
    (:mod:`qmcnn_tpu.ops.cplx`) and "complex" weights are pairs of real
    parameter leaves. Complex x complex convolution uses the
    3-multiplication Karatsuba form — three real convs on the MXU.
  * All parameters are real float32, so gradient/SR conventions are the
    simple real-parameter ones.
  * Everything is fixed-shape; the batch axis is the only large axis, which
    is what the Metropolis sampler and local-energy enumeration produce.

API: ``model.apply(variables, s)`` with ``s`` of shape ``[batch, n_sites]``
(flat, values in {-1.,+1.}) returns a ``C`` pair of ``[batch]`` float32
log-amplitude arrays (im identically zero for real models).
"""
from __future__ import annotations

import functools
import itertools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array


def _circular_pad(x: Array, kernel: Tuple[int, ...], pbc: bool = True
                  ) -> Array:
    """Pad the spatial dims of [batch, *spatial, C] for a 'VALID' conv:
    wrap-pad under periodic boundaries, zero-pad for open boundaries."""
    pads = [(0, 0)]
    for k in kernel:
        lo = (k - 1) // 2
        hi = k - 1 - lo
        pads.append((lo, hi))
    pads.append((0, 0))
    return jnp.pad(x, pads, mode="wrap" if pbc else "constant")


def _real_conv(x: Array, w: Array, compute_dtype=jnp.float32,
               cast_back: bool = True) -> Array:
    """VALID real conv, NWC/NHWC layout, float32 accumulation on the MXU.

    ``compute_dtype=bfloat16`` casts the conv operands to bf16 (2x MXU rate)
    while keeping f32 accumulation; activations, acceptance math, and local
    energies stay f32 throughout (SURVEY.md hard part #6 — enable only
    after the energy-bias A/B documented in BASELINE.md).

    ``cast_back=False`` returns the compute_dtype result instead of f32 —
    for stacks that keep activations in bf16 end-to-end (models/gcnn.py):
    measured on v5e, per-layer f32<->bf16 round trips ADD enough HBM
    traffic to cancel the bf16 MXU gain (BASELINE.md r2), so the cast must
    happen once at the input and once at the readout, not per conv.
    """
    ndim = w.ndim - 2  # spatial dims
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NWC", "WIO", "NWC") if ndim == 1 else ("NHWC", "HWIO", "NHWC"),
    )
    if compute_dtype == jnp.float32:
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,) * ndim, padding="VALID",
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
    # reduced precision: run the conv fully in compute_dtype (the MXU still
    # accumulates f32 internally; outputs round per layer).
    # NOTE: mixing preferred_element_type=f32 with bf16 operands breaks the
    # autodiff transpose rule (cotangent arrives f32), hence this form.
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w.astype(compute_dtype),
        window_strides=(1,) * ndim, padding="VALID",
        dimension_numbers=dn,
    )
    return out.astype(jnp.float32) if cast_back else out


# ---------------------------------------------------------------------------
# Circular-conv implementations (one parameter layout, three compute paths).
# Measured on v5e (see resolve_conv_impl): XLA's direct conv is already the
# fastest at VMC shapes, so it is the default; the matmul reformulations
# remain because (a) 'circulant' is the form the fused Pallas sweep kernel
# consumes (one [BLK, N*Cin] @ [N*Cin, N*Cout] MXU matmul per layer, weights
# VMEM-resident), and (b) they are the fallback if another backend's conv
# emitter underperforms.
#   * 'roll'      — im2col via jnp.roll: stack the K shifted copies on the
#                   channel axis, one [B*N, K*Cin] @ [K*Cin, Cout] matmul.
#   * 'circulant' — materialize the circulant weight matrix [N*Cin, N*Cout]
#                   (linear in w, hoisted out of the sweep scan by XLA);
#                   more FLOPs (N/K^d x), best for small lattices only.
#   * 'direct'    — lax.conv_general_dilated (default; also the correctness
#                   reference for the others).
# ---------------------------------------------------------------------------

def _tap_offsets(kernel: Tuple[int, ...]):
    """Offsets per tap matching lax.conv with (k-1)//2 left wrap-padding."""
    ranges = [[t - (k - 1) // 2 for t in range(k)] for k in kernel]
    return list(itertools.product(*ranges))


@functools.lru_cache(maxsize=None)
def _tap_onehot(lattice_shape: Tuple[int, ...], kernel: Tuple[int, ...]
                ) -> np.ndarray:
    """[N, T, N] one-hot: out site p via tap t reads input site q."""
    n = int(np.prod(lattice_shape))
    coords = np.stack(np.unravel_index(np.arange(n), lattice_shape), -1)
    offs = _tap_offsets(kernel)
    onehot = np.zeros((n, len(offs), n), np.float32)
    for t, off in enumerate(offs):
        src = (coords + np.asarray(off)) % np.asarray(lattice_shape)
        idx = np.ravel_multi_index(src.T, lattice_shape)
        onehot[np.arange(n), t, idx] = 1.0
    return onehot


def circulant_weight(w: Array, lattice_shape: Tuple[int, ...]) -> Array:
    """Expand kernel [*k, Cin, Cout] to the circulant [N*Cin, N*Cout]."""
    kernel = w.shape[:-2]
    cin, cout = w.shape[-2], w.shape[-1]
    n = int(np.prod(lattice_shape))
    onehot = jnp.asarray(_tap_onehot(tuple(lattice_shape), tuple(kernel)))
    wt = w.reshape(-1, cin, cout)  # [T, Cin, Cout]
    wc = jnp.einsum("ptq,tio->qipo", onehot, wt)
    return wc.reshape(n * cin, n * cout)


def _conv_roll(x: Array, w: Array, lattice_shape: Tuple[int, ...]) -> Array:
    """im2col via rolls + one matmul. x: [B, *sp, Cin] -> [B, *sp, Cout]."""
    kernel = w.shape[:-2]
    cin, cout = w.shape[-2], w.shape[-1]
    b = x.shape[0]
    n = int(np.prod(lattice_shape))
    axes = tuple(range(1, 1 + len(lattice_shape)))
    stacked = jnp.concatenate(
        [jnp.roll(x, tuple(-o for o in off), axis=axes)
         for off in _tap_offsets(kernel)],
        axis=-1,
    )  # [B, *sp, T*Cin]
    t = len(_tap_offsets(kernel))
    y = stacked.reshape(b * n, t * cin) @ w.reshape(t * cin, cout)
    return y.reshape(b, *lattice_shape, cout)


def _conv_circulant(x: Array, w: Array, lattice_shape: Tuple[int, ...]
                    ) -> Array:
    b = x.shape[0]
    cin, cout = w.shape[-2], w.shape[-1]
    n = int(np.prod(lattice_shape))
    wc = circulant_weight(w, lattice_shape)
    y = x.reshape(b, n * cin) @ wc
    return y.reshape(b, *lattice_shape, cout)


def resolve_conv_impl(impl: str, lattice_shape: Tuple[int, ...]) -> str:
    """'auto' -> 'direct' everywhere. Measured on a real v5e (batch 1024,
    10x10, C=16^3, marginal cost per forward with dispatch overhead
    cancelled): direct 43us / circulant 50us / roll 97us for the real net,
    and direct 233us / roll 343us / circulant 359us for the complex net —
    XLA's TPU conv emitter wins at VMC shapes. 'circulant' stays as the
    form the fused Pallas sweep kernel consumes; 'roll' as a fallback."""
    if impl != "auto":
        return impl
    return "direct"


def apply_conv(x: Array, w: Array, lattice_shape: Tuple[int, ...],
               impl: str, pbc: bool = True,
               compute_dtype=jnp.float32, cast_back: bool = True) -> Array:
    """``cast_back=False`` keeps the output in compute_dtype (end-to-end
    reduced-precision stacks — see _real_conv for the measured rationale).
    The roll/circulant matmul reformulations are f32-only reference paths
    and ignore compute_dtype (resolve_conv_impl never auto-picks them)."""
    if not pbc:
        # open boundaries: zero padding; the matmul reformulations assume
        # wrap-around, so OBC always takes the direct conv path.
        return _real_conv(_circular_pad(x, w.shape[:-2], pbc=False), w,
                          compute_dtype, cast_back=cast_back)
    impl = resolve_conv_impl(impl, lattice_shape)
    if impl == "direct":
        return _real_conv(_circular_pad(x, w.shape[:-2]), w, compute_dtype,
                          cast_back=cast_back)
    if impl == "roll":
        return _conv_roll(x, w, lattice_shape)
    if impl == "circulant":
        return _conv_circulant(x, w, lattice_shape)
    raise ValueError(f"unknown conv impl {impl!r}")


def kernel_std(init_mode: str, param_scale: float, fan_in: int,
               n_parts: int = 1) -> float:
    """Per-part normal() std for a conv kernel.

    ``fixed``: std = param_scale, depth-agnostic (the reference genre's
    choice; fine for <= 3-layer stacks, collapses or explodes deeper
    because lncosh is *quadratic* near 0 — an under-scaled signal shrinks
    double-exponentially with depth, an over-scaled one saturates to NaN).

    ``fan_in``: std = param_scale / sqrt(n_parts * fan_in) — variance-
    preserving (LeCun-style): pre-activation variance ~= param_scale^2 x
    input variance at every depth, with param_scale acting as the gain
    (~1 keeps a deep lncosh stack in its responsive region; measured in
    tests/test_ansatz.py::test_deep_fan_in_init_healthy). ``n_parts=2``
    for complex kernels — re and im parts both feed |psi|.
    """
    if init_mode == "fixed":
        return param_scale
    if init_mode == "fan_in":
        return param_scale / float(np.sqrt(n_parts * fan_in))
    raise ValueError(f"unknown init_mode {init_mode!r}")


class ComplexConv(nn.Module):
    """Circular complex convolution; weights = (kernel_re, kernel_im) leaves.

    For real input: 2 real convs. For C input, Karatsuba (3 real convs):
    with W = A + iB, z = x + iy,
      p1 = A*x, p2 = B*y, p3 = (A+B)*(x+y); Re = p1 - p2, Im = p3 - p1 - p2.
    """

    features: int
    kernel_size: Tuple[int, ...]
    lattice_shape: Tuple[int, ...]
    param_scale: float = 0.05
    use_bias: bool = True
    conv_impl: str = "auto"
    pbc: bool = True
    compute_dtype: str = "float32"
    init_mode: str = "fixed"
    init_extra_scale: float = 1.0
    #: False = leave the output in compute_dtype (end-to-end bf16 stacks)
    cast_back: bool = True

    @nn.compact
    def __call__(self, z) -> C:
        in_features = (z.re if isinstance(z, C) else z).shape[-1]
        shape = (*self.kernel_size, in_features, self.features)
        std = self.init_extra_scale * kernel_std(
            self.init_mode, self.param_scale,
            fan_in=int(np.prod(self.kernel_size)) * in_features,
            n_parts=2)
        a = self.param("kernel_re", nn.initializers.normal(std),
                       shape, jnp.float32)
        b = self.param("kernel_im", nn.initializers.normal(std),
                       shape, jnp.float32)
        conv = lambda x, w: apply_conv(
            x, w, self.lattice_shape, self.conv_impl, pbc=self.pbc,
            compute_dtype=jnp.dtype(self.compute_dtype),
            cast_back=self.cast_back)
        if isinstance(z, C):
            p1 = conv(z.re, a)
            p2 = conv(z.im, b)
            p3 = conv(z.re + z.im, a + b)
            out = C(p1 - p2, p3 - p1 - p2)
        else:
            out = C(conv(z, a), conv(z, b))
        if self.use_bias:
            br = self.param("bias_re", nn.initializers.zeros,
                            (self.features,), jnp.float32)
            bi = self.param("bias_im", nn.initializers.zeros,
                            (self.features,), jnp.float32)
            # cast the (f32) bias to the activation dtype — an f32 add
            # would silently upcast an end-to-end bf16 stack
            out = C(out.re + br.astype(out.re.dtype),
                    out.im + bi.astype(out.im.dtype))
        return out


class RealConv(nn.Module):
    """Circular real convolution (shares the padding/conv code path)."""

    features: int
    kernel_size: Tuple[int, ...]
    lattice_shape: Tuple[int, ...]
    param_scale: float = 0.05
    use_bias: bool = True
    conv_impl: str = "auto"
    pbc: bool = True
    compute_dtype: str = "float32"
    init_mode: str = "fixed"
    init_extra_scale: float = 1.0
    #: False = leave the output in compute_dtype (end-to-end bf16 stacks)
    cast_back: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        std = self.init_extra_scale * kernel_std(
            self.init_mode, self.param_scale,
            fan_in=int(np.prod(self.kernel_size)) * in_features)
        w = self.param("kernel", nn.initializers.normal(std),
                       (*self.kernel_size, in_features, self.features),
                       jnp.float32)
        out = apply_conv(x, w, self.lattice_shape, self.conv_impl,
                         pbc=self.pbc,
                         compute_dtype=jnp.dtype(self.compute_dtype),
                         cast_back=self.cast_back)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            out = out + bias.astype(out.dtype)
        return out


class LogPsiCNN(nn.Module):
    """log psi(s): stacked circular convs + lncosh, spatial-sum readout.

    The sum over the final feature map makes log psi exactly invariant under
    lattice translations (conv stack is translation-equivariant, readout is
    translation-invariant) — the 'free' form of the reference's translational
    symmetry averaging. ``complex_params=True`` gives complex-valued
    amplitudes (J1-J2; BASELINE config 4).
    """

    lattice_shape: Tuple[int, ...]
    channels: Sequence[int] = (8, 8)
    kernel_size: int | Tuple[int, ...] = 3
    complex_params: bool = False
    param_scale: float = 0.05
    conv_impl: str = "auto"
    #: periodic boundaries (wrap padding, exact translation invariance);
    #: False = open boundaries (zero padding, invariance does not apply)
    pbc: bool = True
    #: 'float32' or 'bfloat16'. bf16 runs the stack END-TO-END in bf16 —
    #: cast once at the input, activations stay bf16, spatial-sum readout
    #: accumulated in f32. The r1 per-layer-cast-back form measured ZERO
    #: speedup (28.2 vs 27.3 us/forward, BASELINE.md r1: the conv is
    #: HBM-bound at VMC shapes, and per-layer f32 round trips put the
    #: traffic right back); the end-to-end form is the one the GCNN
    #: measured +19% full-step with no energy bias (BASELINE.md r2).
    compute_dtype: str = "float32"
    #: 'fixed' (std = param_scale) or 'fan_in' (variance-preserving,
    #: param_scale = gain) — see kernel_std; use fan_in for deep stacks
    init_mode: str = "fixed"
    #: 'lncosh' (reference-style) or 'selu' (re/im-wise, self-normalizing —
    #: pair with init_mode='fan_in' for deep stacks; see cplx.selu_reim)
    activation: str = "lncosh"
    #: identity skips x <- act(conv(x)) + x on interior layers with matching
    #: channel counts (never the first — shape change — nor the last layer,
    #: whose shrunk init a skip would bypass; see LogPsiGCNN.residual)
    residual: bool = False
    #: sites per unit cell (honeycomb: 2). The conv grid is the CELL grid
    #: (``lattice_shape``) and the basis spins enter as input channels, so
    #: weight tying follows the true (cell) translation group and the
    #: spatial-sum readout is invariant under exactly those translations.
    basis: int = 1

    @nn.compact
    def __call__(self, s: Array) -> C:
        batch = s.shape[0]
        act_c0, act_r0 = cplx.ACTIVATIONS[self.activation]
        cdt = jnp.dtype(self.compute_dtype)
        if cdt == jnp.float32:
            act_c, act_r = act_c0, act_r0
        else:
            # bf16 STORAGE, f32 activation MATH: lncosh near 0 is a
            # catastrophic cancellation (t - log2 + log1p(e^{-2t}) — O(1)
            # terms for a quadratically small result; measured 0.14 abs
            # bias on a 4x4 C=(8,8) stack in pure bf16). XLA fuses
            # upcast -> act -> downcast into one elementwise kernel with
            # bf16 reads/writes, so this costs no HBM traffic.
            def act_r(x):
                return act_r0(x.astype(jnp.float32)).astype(cdt)

            def act_c(z):
                out = act_c0(C(z.re.astype(jnp.float32),
                               z.im.astype(jnp.float32)))
                return C(out.re.astype(cdt), out.im.astype(cdt))
        ksz = self.kernel_size
        if isinstance(ksz, int):
            ksz = (ksz,) * len(self.lattice_shape)
        ksz = tuple(min(k, L) for k, L in zip(ksz, self.lattice_shape))
        # activations live in compute_dtype end-to-end (one cast here, one
        # f32-accumulated cast at the readout)
        x = s.reshape(batch, *self.lattice_shape,
                      self.basis).astype(jnp.dtype(self.compute_dtype))

        def final_extra(i, c):
            # shrink the last layer under fan_in so the spatial-sum readout
            # starts near-uniform (see LogPsiGCNN for the measured rationale)
            if self.init_mode == "fan_in" and i == len(self.channels) - 1:
                return 0.1 / float(np.sqrt(
                    np.prod(self.lattice_shape) * c))
            return 1.0

        def skip(i, c):
            return (self.residual and 0 < i < len(self.channels) - 1
                    and c == self.channels[i - 1])

        if self.complex_params:
            for i, c in enumerate(self.channels):
                x_in = x
                x = ComplexConv(features=c, kernel_size=ksz,
                                lattice_shape=tuple(self.lattice_shape),
                                param_scale=self.param_scale,
                                conv_impl=self.conv_impl, pbc=self.pbc,
                                compute_dtype=self.compute_dtype,
                                init_mode=self.init_mode,
                                init_extra_scale=final_extra(i, c),
                                cast_back=False)(x)
                x = act_c(x)
                if skip(i, c):
                    # variance-preserving (see LogPsiGCNN residual note)
                    x = (x + x_in) * 0.7071067811865476
            # readout accumulated in f32 (XLA fuses the upcast into the
            # reduction)
            return C(x.re.reshape(batch, -1).astype(jnp.float32).sum(-1),
                     x.im.reshape(batch, -1).astype(jnp.float32).sum(-1))
        for i, c in enumerate(self.channels):
            x_in = x
            x = RealConv(features=c, kernel_size=ksz,
                         lattice_shape=tuple(self.lattice_shape),
                         param_scale=self.param_scale,
                         conv_impl=self.conv_impl, pbc=self.pbc,
                         compute_dtype=self.compute_dtype,
                         init_mode=self.init_mode,
                         init_extra_scale=final_extra(i, c),
                         cast_back=False)(x)
            x = act_r(x)
            if skip(i, c):
                x = (x + x_in) * 0.7071067811865476
        out = x.reshape(batch, -1).astype(jnp.float32).sum(-1)
        return C(out, jnp.zeros_like(out))


class TranslationAveraged(nn.Module):
    """Explicit translation symmetrization (SURVEY.md R2):

      psi_k(s) = mean over translations T_a of e^{i k.a} psi(T_a s)
      => log psi_k(s) = logmeanexp_a [log psi(T_a s) + i k.a].

    Exact projection onto the momentum-``k`` sector; ``momentum`` gives
    integer wavenumbers per dimension (k_d = 2 pi m_d / L_d), default the
    zero-momentum (fully translation-invariant) sector. Nonzero momenta
    target excited states (e.g. the Anderson-tower / magnon branches) the
    same way ``gcnn_character`` targets point-group sectors; the projected
    state obeys psi_k(T_b s) = e^{-i k.b} psi_k(s). Costs one forward per
    translation, so use on small lattices or with a ``shift_stride``
    subgroup (momentum components must then live on the subgroup's
    reciprocal grid: m_d * stride divisible constraints are the user's
    responsibility). For the spatial-sum LogPsiCNN the k = 0 projection
    is a mathematical no-op (already invariant) — which the tests exploit.
    """

    inner: nn.Module
    lattice_shape: Tuple[int, ...]
    shift_stride: int = 1
    #: integer wavenumbers m_d (k_d = 2 pi m_d / L_d); () = zero momentum
    momentum: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, s: Array) -> C:
        batch = s.shape[0]
        grid = s.reshape(batch, *self.lattice_shape)
        axes = tuple(range(1, 1 + len(self.lattice_shape)))
        shifts_per_dim = [range(0, L, self.shift_stride)
                          for L in self.lattice_shape]
        shifts = list(itertools.product(*shifts_per_dim))
        rolled = [jnp.roll(grid, shift, axis=axes).reshape(batch, -1)
                  for shift in shifts]
        stacked = jnp.stack(rolled, axis=0)  # [T, batch, N]
        t = stacked.shape[0]
        logs = self.inner(stacked.reshape(t * batch, -1))
        logs = cplx.as_c(logs).reshape(t, batch)
        if self.momentum and any(self.momentum):
            if len(self.momentum) != len(self.lattice_shape):
                raise ValueError("momentum needs one wavenumber per "
                                 "lattice dimension")
            k = [2.0 * np.pi * m / L
                 for m, L in zip(self.momentum, self.lattice_shape)]
            phases = np.asarray(
                [sum(kd * ad for kd, ad in zip(k, shift))
                 for shift in shifts], dtype=np.float32)
            logs = C(logs.re, logs.im + jnp.asarray(phases)[:, None])
        return cplx.logmeanexp(logs, axis=0)


class PointGroupAveraged(nn.Module):
    """Point-group symmetrization for square lattices (C4v, 8 elements):

      psi_sym(s) = mean over g in {rotations, reflections} of psi(g s)
      => log psi_sym = logmeanexp_g log psi(g s).

    Complements the CNN's built-in translation invariance (conv kernels are
    anisotropic, so rotations/reflections are NOT already symmetries) —
    projecting onto the trivial representation of the full space group is
    the standard accuracy lever for frustrated models like J1-J2. Costs 8
    forwards. Requires a square (Lx == Ly) lattice for the rotations;
    rectangular lattices fall back to the 4 reflection elements (C2v).
    """

    inner: nn.Module
    lattice_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self, s: Array) -> C:
        if len(self.lattice_shape) != 2:
            raise ValueError("PointGroupAveraged needs a 2D lattice")
        batch = s.shape[0]
        grid = s.reshape(batch, *self.lattice_shape)
        square_lattice = self.lattice_shape[0] == self.lattice_shape[1]
        transforms = []
        for flip in [False, True]:
            g0 = jnp.flip(grid, axis=2) if flip else grid
            if square_lattice:
                for k in range(4):
                    transforms.append(jnp.rot90(g0, k=k, axes=(1, 2)))
            else:
                transforms.append(g0)
                transforms.append(jnp.rot90(g0, k=2, axes=(1, 2)))
        stacked = jnp.stack([t.reshape(batch, -1) for t in transforms],
                            axis=0)  # [G, batch, N]
        g = stacked.shape[0]
        logs = cplx.as_c(self.inner(stacked.reshape(g * batch, -1)))
        return cplx.logmeanexp(logs.reshape(g, batch), axis=0)


def log_psi_apply(model: nn.Module, variables, s: Array) -> C:
    """Uniform entry point: always returns a C pair of log-amplitudes."""
    return cplx.as_c(model.apply(variables, s))
