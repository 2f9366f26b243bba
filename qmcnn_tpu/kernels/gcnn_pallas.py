"""Pallas TPU kernel: fused GCNN log-amplitude forward (SURVEY.md K2,
re-scoped in r2 to the GCNN per VERDICT r1).

**Measured outcome (v5e, 2026-08-17): NOT wired into production — XLA
wins.** At the 8x8 depth-6 width-80 hero shapes this kernel reaches
0.64x the XLA forward (bf16, block=16: 220k cfg/s vs XLA 344k cfg/s).
Roofline analysis of the XLA number: 3.5e8 FLOP/config (G-expanded
complex convs + spin-flip doubling) x 344k cfg/s = ~122 TFLOP/s = 62% of
v5e bf16 peak — which also proves XLA's DEFAULT-precision "f32" convs
already run single-pass-bf16 on the MXU (a 3-pass f32 path caps at ~65
TFLOP/s). Two consequences: (a) the fusion premise is void — activation
traffic at these shapes is ~42 GB/s, far under HBM bandwidth, so XLA's
layer-by-layer streaming costs nothing; (b) this kernel's tap-wise
[.,80]@[80,80] dots run the MXU at ~39% tiling efficiency where XLA's
implicit-GEMM conv (K = taps*C = 720) tiles far better. The G^2 group-
conv FLOPs themselves are irreducible (all G x G blocks of the expanded
kernel are dense), so the remaining headroom over XLA is <= 1.6x and not
reachable by this structure. Kept as a tested, compiling reference
implementation + the record of WHY (this docstring); the production GCNN
speedup is bf16 end-to-end in models/gcnn.py (1.19x in-train, zero
energy bias — BASELINE.md A/B).

Scope: the *evaluation* forward only (sampler + local energy — contexts
that never differentiate log psi). The gradient/Jacobian paths keep the
XLA forward: values agree to rounding (parity-tested), and the covariance
gradient only needs the stop-gradient'd E_loc residuals, not bitwise-equal
amplitudes.

Mosaic portability notes (hard-won on this backend's remote compiler):
only leading-dim-split reshapes ([N*r, C] <-> [N, r, C]) lower; anything
merging rows into lanes is "unsupported shape cast". No expm1/atan2
lowering rules (manual selu + Cephes atan below). No bf16 cmpf. MXU dots
default to single-pass bf16 — f32 compute must request
Precision.HIGHEST, and the tiny readout selector matmul must ALWAYS run
HIGHEST or it rounds f32 log-amplitudes to bf16 (~0.25 absolute error,
observed).

Implementation notes:
  * one grid step = one block of configs; the conv is 9 tap-shifted
    [B*HW, C] @ [C, C] MXU matmuls accumulated in f32 (complex = 4 real
    matmuls per tap — direct form, not Karatsuba: 3 simultaneous partial
    accumulators would blow the VMEM budget that keeps the block resident);
  * circular padding = static lane-preserving rolls (slice + concat);
  * activations in compute_dtype (bf16 capable end-to-end, matching
    models/gcnn.py); readout sums accumulate f32 via a [W, G] group
    selector matmul;
  * expanded kernels are built OUTSIDE (models/gcnn.py gathers, linear in
    the base params, once per step) and stay VMEM-resident across the grid.

Reference parity: reproduces models/gcnn.py LogPsiGCNN (+ optional
SpinFlipSymmetrized) — identities tested in tests/test_gcnn_pallas.py.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qmcnn_tpu.models.gcnn import (_CHARACTERS, _group_kernel, _lift_kernel,
                                   c4v_tables)
from qmcnn_tpu.ops import cplx
from qmcnn_tpu.ops.cplx import C

Array = jax.Array

LOG2 = 0.6931471805599453


# ---------------------------------------------------------------------------
# parameter expansion (plain JAX, once per step)
# ---------------------------------------------------------------------------

def expand_gcnn_params(variables, kernel_size: int, complex_params: bool):
    """Flax GCNN variables -> (lift_w, layer_ws, biases) of expanded dense
    kernels, tap-major:

      lift_w:  ([9, 1, W], [9, 1, W] or None)
      layer_ws: list of ([9, W, W], [9, W, W] or None) for layers 1..L-1
      biases:   list of ([W], [W] or None) for layers 0..L-1  (G-tiled)
    """
    k = kernel_size
    G, _, elem_idx, tap_perm, _, _ = c4v_tables(k)
    params = variables["params"]

    def tap_major(w):  # [k, k, Cin, Cout] -> [k*k, Cin, Cout]
        return w.reshape(k * k, w.shape[-2], w.shape[-1])

    names = sorted((n for n in params if n.startswith("GroupConv_")),
                   key=lambda n: int(n.split("_")[1]))
    lift_w = None
    layer_ws = []
    biases = []
    for i, name in enumerate(names):
        leaf = params[name]
        if i == 0:
            expand = lambda w: tap_major(_lift_kernel(w, tap_perm, k))
        else:
            expand = lambda w: tap_major(
                _group_kernel(w, elem_idx, tap_perm, k))
        w_re = expand(leaf["kernel_re"])
        w_im = expand(leaf["kernel_im"]) if complex_params else None
        b_re = jnp.tile(leaf["bias_re"], (G,))
        b_im = jnp.tile(leaf["bias_im"], (G,)) if complex_params else None
        if i == 0:
            lift_w = (w_re, w_im)
        else:
            layer_ws.append((w_re, w_im))
        biases.append((b_re, b_im))
    return lift_w, layer_ws, biases


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _roll_mid(x: Array, shift: int) -> Array:
    """Static circular roll of a 3D array's MIDDLE axis via slice+concat.

    This Mosaic build crashes (remote-compile 500) on slice/concat over the
    middle axes of 4D arrays but handles the 3D form, so the kernel keeps
    activations flat [blk*hw, C] and reshapes to exactly 3D per roll."""
    if shift == 0:
        return x
    n = x.shape[1]
    shift = shift % n
    a = jax.lax.slice_in_dim(x, n - shift, n, axis=1)
    b = jax.lax.slice_in_dim(x, 0, n - shift, axis=1)
    return jnp.concatenate([a, b], axis=1)


def _roll_hw(x: Array, sh: int, sw: int, blk: int, h: int, w: int) -> Array:
    """Per-image circular roll by (sh, sw) of x viewed as [blk, h, w, C],
    stored flat as [blk*h*w, C] — via two 3D middle-axis rolls.

    Only leading-(sublane-)dim splits are used: [N*r, C] -> [N, r, C].
    Reshapes that merge rows into lanes (e.g. [blk, h, w*C]) are
    "unsupported shape cast" in this Mosaic build. The h-roll rides the
    identity (i*w + j + sh*w) mod hw = ((i+sh) mod h)*w + j."""
    c = x.shape[-1]
    if sh:
        x = _roll_mid(x.reshape(blk, h * w, c), sh * w
                      ).reshape(blk * h * w, c)
    if sw:
        x = _roll_mid(x.reshape(blk * h, w, c), sw).reshape(blk * h * w, c)
    return x


def _selu(x):
    # jax.nn.selu lowers through expm1, which Mosaic TC has no rule for;
    # exp(x)-1 differs from expm1 only below f32 epsilon of the selu scale.
    # The compare runs in f32: Mosaic rejects bf16 cmpf ("Target does not
    # support this comparison").
    scale = jnp.asarray(1.0507009873554805, x.dtype)
    alpha = jnp.asarray(1.6732632423543772, x.dtype)
    pos = x.astype(jnp.float32) > 0
    return scale * jnp.where(
        pos, x, alpha * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0))


def _lncosh_real(x):
    t = jnp.abs(x)
    return t - LOG2 + jnp.log1p(jnp.exp(-2.0 * t))


def _atan(t):
    """Cephes atanf (branch-free): Mosaic TC has no atan/atan2 rule.
    Max error ~1e-7 over the reals, inf-safe."""
    at = jnp.abs(t)
    big = at > 2.414213562373095      # tan(3pi/8)
    mid = at > 0.4142135623730950     # tan(pi/8)
    safe_at = jnp.maximum(at, 1e-30)
    x = jnp.where(big, -1.0 / safe_at,
                  jnp.where(mid, (at - 1.0) / (at + 1.0), at))
    y0 = jnp.where(big, jnp.float32(np.pi / 2),
                   jnp.where(mid, jnp.float32(np.pi / 4), 0.0))
    z = x * x
    y = ((((8.05374449538e-2 * z - 1.38776856032e-1) * z
           + 1.99777106478e-1) * z - 3.33329491539e-1) * z * x + x)
    return jnp.sign(t) * (y0 + y)


def _lncosh_c(re, im):
    """Complex log cosh on a (re, im) pair — mirrors cplx.lncosh."""
    s = jnp.where(re >= 0, 1.0, -1.0).astype(re.dtype)
    tr, ti = re * s, im * s
    mag = jnp.exp(-2.0 * tr)
    wr = mag * jnp.cos(-2.0 * ti)
    wi = mag * jnp.sin(-2.0 * ti)
    xr, xi = 1.0 + wr, wi
    lg_re = 0.5 * jnp.log(xr * xr + xi * xi)
    # arg(xr + i xi) with xr = 1 + mag*cos >= 0 always (mag <= 1 since
    # tr >= 0), so plain atan of the ratio covers the full range
    lg_im = _atan(xi / jnp.maximum(xr, 1e-30))
    return tr - LOG2 + lg_re, ti + lg_im


def _make_kernel(lattice_shape, channels, k, complex_params, activation,
                 residual, blk, dtype):
    h, w = lattice_shape
    hw = h * w
    G = 8
    c_last = channels[-1]
    width = G * c_last
    n_layers = len(channels)
    half = (k - 1) // 2
    taps = [(a, b) for a in range(k) for b in range(k)]

    def act_c(re, im):
        if activation == "selu":
            return _selu(re), _selu(im)
        return _lncosh_c(re, im)

    def act_r(x):
        if activation == "selu":
            return _selu(x)
        return _lncosh_real(x)

    def conv(z_re, z_im, w_re_taps, w_im_taps, get_w):
        """Circular k x k conv on flat [blk*hw, Cin] activations via
        tap-shifted matmuls. get_w(taps, t) reads tap t's [Cin, Cout]
        matrix. f32 accumulation. Returns (re, im) or (re, None) flat as
        [blk*hw, Cout]."""
        cout = get_w(w_re_taps, 0).shape[-1]
        acc_re = jnp.zeros((blk * hw, cout), jnp.float32)
        acc_im = (jnp.zeros((blk * hw, cout), jnp.float32)
                  if (z_im is not None or w_im_taps is not None) else None)
        # MXU DEFAULT precision is a single bf16 pass; an f32 compute
        # dtype must mean honest f32 (6-pass emulation), or "f32" would
        # silently be bf16-with-extra-HBM-traffic
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST
                       if dtype == jnp.float32 else
                       jax.lax.Precision.DEFAULT))
        for t, (a, b) in enumerate(taps):
            # y[i,j] += x[(i+a-half) mod H, (j+b-half) mod W] w[a,b]
            zs_re = _roll_hw(z_re, half - a, half - b, blk, h, w)
            wa = get_w(w_re_taps, t)
            if w_im_taps is None:           # real parameters
                acc_re = acc_re + dot(zs_re, wa)
                continue
            wb = get_w(w_im_taps, t)
            if z_im is None:                # complex params, real input
                acc_re = acc_re + dot(zs_re, wa)
                acc_im = acc_im + dot(zs_re, wb)
            else:                           # full complex: 4 matmuls
                zs_im = _roll_hw(z_im, half - a, half - b, blk, h, w)
                acc_re = acc_re + dot(zs_re, wa) - dot(zs_im, wb)
                acc_im = acc_im + dot(zs_re, wb) + dot(zs_im, wa)
        return acc_re, acc_im

    def kernel(x_ref, lift_re_ref, lift_im_ref, w_re_ref, w_im_ref,
               b_re_ref, b_im_ref, sel_ref, out_re_ref, out_im_ref):
        # arrives pre-flattened [blk*hw, 1] from the host: the in-kernel
        # [blk, hw] -> [blk*hw, 1] cast is a cross-lane relayout Mosaic
        # rejects ("unsupported shape cast")
        x = x_ref[:].astype(dtype)

        def finish(acc_re, acc_im, layer):
            # bias add + activation on the f32 accumulators, downcast
            # after: the VPU transcendentals are cheap next to the
            # matmuls, and Mosaic rejects bf16 cmpf anyway
            br = b_re_ref[layer].astype(jnp.float32)
            acc_re = acc_re + br
            if acc_im is not None:
                bi = b_im_ref[layer].astype(jnp.float32)
                acc_im = acc_im + bi
                zr, zi = act_c(acc_re, acc_im)
                return zr.astype(dtype), zi.astype(dtype)
            zr = act_r(acc_re)
            return zr.astype(dtype), None

        # layer 0: lift (Cin = 1)
        lift_im = lift_im_ref if complex_params else None
        acc_re, acc_im = conv(
            x, None,
            lift_re_ref, lift_im,
            lambda ref, t: ref[t].astype(dtype))
        z_re, z_im = finish(acc_re, acc_im, 0)

        for i in range(1, n_layers):
            zin_re, zin_im = z_re, z_im
            w_im_taps = w_im_ref if complex_params else None
            acc_re, acc_im = conv(
                z_re, z_im,
                w_re_ref, w_im_taps,
                lambda ref, t, _i=i: ref[_i - 1, t].astype(dtype))
            z_re, z_im = finish(acc_re, acc_im, i)
            if (residual and 0 < i < n_layers - 1
                    and channels[i] == channels[i - 1]):
                z_re = (z_re + zin_re) * 0.7071067811865476
                if z_im is not None:
                    z_im = (z_im + zin_im) * 0.7071067811865476

        # readout: f32 sums over space, then group-select matmul over C.
        # The selector dot MUST run at HIGHEST precision in every mode: at
        # DEFAULT the MXU rounds the accumulated f32 sums to bf16 (~1e-3
        # relative on O(30) log-amplitudes — a 0.25 log-psi error measured
        # on v5e), and the [blk, width] x [width, G] matmul is too small
        # to ever matter for speed.
        sel = sel_ref[:]
        rdot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        flat_re = z_re.astype(jnp.float32).reshape(blk, hw, width).sum(1)
        out_re_ref[:] = rdot(flat_re, sel)
        if z_im is not None:
            flat_im = z_im.astype(jnp.float32).reshape(blk, hw, width).sum(1)
            out_im_ref[:] = rdot(flat_im, sel)
        else:
            out_im_ref[:] = jnp.zeros((blk, G), jnp.float32)

    return kernel


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("lattice_shape", "channels", "kernel_size",
                     "complex_params", "activation", "residual", "block",
                     "interpret", "dtype_name"))
def _group_sums(x, lift_re, lift_im, w_re, w_im, b_re, b_im,
                lattice_shape, channels, kernel_size, complex_params,
                activation, residual, block, interpret, dtype_name):
    """[B, n_sites] spins -> per-group-element readout sums S_g [B, G] C."""
    batch = x.shape[0]
    G = 8
    c_last = channels[-1]
    width = G * c_last
    dtype = jnp.dtype(dtype_name)

    pad = (-batch) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    n_blocks = x.shape[0] // block
    hw = x.shape[1]
    # flatten to [B*hw, 1] host-side (in-kernel would be an unsupported
    # cross-lane shape cast; here it is a free XLA relayout)
    x = x.reshape(x.shape[0] * hw, 1)

    sel = jnp.asarray(
        np.repeat(np.eye(G, dtype=np.float32), c_last, axis=0))  # [W, G]

    kernel = _make_kernel(tuple(lattice_shape), tuple(channels), kernel_size,
                          complex_params, activation, residual, block, dtype)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block * hw, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full(lift_re.shape),
            full(lift_im.shape),
            full(w_re.shape),
            full(w_im.shape),
            full(b_re.shape),
            full(b_im.shape),
            full(sel.shape),
        ],
        out_specs=[
            pl.BlockSpec((block, G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, G), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((x.shape[0], G), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], G), jnp.float32),
        ],
        interpret=interpret,
    )(x, lift_re, lift_im, w_re, w_im, b_re, b_im, sel)
    return C(out_re[:batch], out_im[:batch])


def make_fused_log_psi(
    lattice_shape: Tuple[int, int],
    channels: Tuple[int, ...],
    kernel_size: int,
    complex_params: bool,
    character: str = "A1",
    activation: str = "lncosh",
    residual: bool = False,
    spin_flip_sector: int = 0,
    compute_dtype: str = "float32",
    block: int = 128,
    interpret: bool = False,
):
    """Returns fast_log_psi(variables, s) -> C[batch], the fused-kernel
    equivalent of log_psi_apply(model, variables, s) for LogPsiGCNN
    (optionally SpinFlipSymmetrized). Evaluation-only (no autodiff)."""
    if len(set(channels)) != 1:
        raise ValueError("fused GCNN forward needs equal channel widths")
    k = min(kernel_size, min(lattice_shape))
    if k % 2 == 0:
        k -= 1
    G, _, _, _, chars, _ = c4v_tables(k)
    chi = np.asarray(chars[character])
    phase = jnp.asarray(np.where(chi < 0, np.pi, 0.0), jnp.float32)

    def fast_log_psi(variables, s: Array) -> C:
        inner_vars = variables
        if spin_flip_sector:
            inner_vars = {"params": variables["params"]["inner"]}
            s_eval = jnp.concatenate([s, -s], axis=0)
        else:
            s_eval = s
        lift_w, layer_ws, biases = expand_gcnn_params(
            inner_vars, k, complex_params)
        zeros_like = lambda a: jnp.zeros_like(a)
        lift_re, lift_im = lift_w
        if lift_im is None:
            lift_im = zeros_like(lift_re)
        if layer_ws:
            w_re = jnp.stack([a for a, _ in layer_ws])
            w_im = (jnp.stack([b for _, b in layer_ws])
                    if complex_params else zeros_like(w_re))
        else:  # single-layer net: dummy deep stack
            width = G * channels[-1]
            w_re = jnp.zeros((1, k * k, width, width), jnp.float32)
            w_im = jnp.zeros_like(w_re)
        b_re = jnp.stack([a for a, _ in biases])
        b_im = (jnp.stack([b for _, b in biases])
                if complex_params else zeros_like(b_re))

        s_g = _group_sums(
            s_eval, lift_re, lift_im, w_re, w_im, b_re, b_im,
            lattice_shape=tuple(lattice_shape), channels=tuple(channels),
            kernel_size=k, complex_params=complex_params,
            activation=activation, residual=residual, block=block,
            interpret=interpret, dtype_name=compute_dtype)
        s_g = C(s_g.re, s_g.im + phase[None, :])
        lp = cplx.logmeanexp(s_g, axis=1)
        if spin_flip_sector:
            batch = s.shape[0]
            pair = C(lp.re.reshape(2, batch), lp.im.reshape(2, batch))
            if spin_flip_sector == -1:
                pair = C(pair.re, pair.im + jnp.asarray(
                    [0.0, np.pi], jnp.float32)[:, None])
            lp = cplx.logmeanexp(pair, axis=0)
        return lp

    return fast_log_psi
