"""Autoregressive neural-quantum-state ansatz (ARNN) with EXACT sampling.

Reference parity note: the reference (dmaloneynygc/qmcnn, SURVEY.md R2/R3)
is MCMC-only — a CNN amplitude sampled by Metropolis walkers. This module is
a capability *extension* in the same genre: a masked autoregressive network
(MADE masks, Germain et al. 2015; applied to NQS by Sharir, Levine, Wies,
Carleo & Shashua, PRL 124:020503 (2020)) that factorizes the amplitude as

  psi(s) = prod_i sqrt(p(s_i | s_<i)) * exp(i phi(s)),

so |psi|^2 is EXACTLY normalized and can be sampled DIRECTLY (one ancestral
pass, zero autocorrelation, zero thermalization, no Metropolis chain) — see
qmcnn_tpu/sampler/direct.py. Everything downstream (local energy, gradient,
SR) is unchanged: log psi is just another C-valued log-amplitude.

TPU-native design:
  * The network is a stack of MASKED dense layers over the flattened site
    order (raster order for 2D lattices): each layer is ONE [B, F_in] x
    [F_in, F_out] MXU matmul with a trace-time-constant binary mask baked
    into the weights — no gathers, no dynamic shapes.
  * Conditionals for ALL sites come out of ONE forward ([B, N] logits), so
    ancestral sampling is a lax.scan of N full forwards on the walker batch
    (each forward is MXU-batched over walkers; see sampler/direct.py).
  * S^z = 0 sector support (Heisenberg/J1-J2) is built into the conditional
    log-probabilities: prefix spin counts force p_up to 0/1 when the
    remaining up-budget requires it (Hibat-Allah et al., PRR 2:023358
    (2020) style), keeping the wavefunction exactly normalized ON the
    sector and the sampler exactly inside it.
  * Complex amplitudes via per-site phases selected by the realized spin
    (phase table conditioned on s_<i and s_i), summed over sites — full
    configuration dependence with all-real parameters (ops/cplx.py pairs;
    the axon backend has no complex dtypes).

Autoregressive masks (MADE): input site j carries degree j+1; hidden unit k
carries degree m_k = (k mod (N-1)) + 1; a weight is kept iff
  input->hidden / hidden->hidden:  m_out >= m_in
  hidden->output(site i, deg i+1): m_hidden <= i
so output i depends on inputs {j : j < i} only — the autoregressive
property tests/test_arnn.py checks exactly (perturb s_j for j >= i and the
conditional for site i must not move).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from qmcnn_tpu.ops.cplx import C

Array = jax.Array

#: log-prob assigned to a sector-forbidden branch: exp(-100) underflows any
#: f32 amplitude ratio to exactly 0 without producing inf/NaN in gradients.
_FORBIDDEN = -100.0


def made_degrees(n_sites: int, widths: Tuple[int, ...]):
    """Deterministic MADE degree assignment for every layer.

    Returns [input_degrees, hidden_degrees..., ] where input degrees are
    1..N and hidden degrees cycle over 1..N-1 (a degree-N hidden unit could
    feed no output and would be dead weight).
    """
    degs = [np.arange(1, n_sites + 1)]
    for w in widths:
        degs.append(np.arange(w) % max(n_sites - 1, 1) + 1)
    return degs


def made_masks(n_sites: int, widths: Tuple[int, ...]):
    """Binary masks for input->h1, h->h, ..., last_h->output.

    The output mask is per-site ([last_width, N]); callers tile it over
    output channels. Masks are float32 numpy (trace-time constants).
    """
    degs = made_degrees(n_sites, widths)
    masks = []
    for d_in, d_out in zip(degs[:-1], degs[1:]):
        masks.append((d_out[None, :] >= d_in[:, None]).astype(np.float32))
    # hidden (degree m) feeds output site i (degree i+1) iff m <= i
    d_last = degs[-1]
    out_deg = np.arange(1, n_sites + 1)
    masks.append((d_last[:, None] <= out_deg[None, :] - 1).astype(np.float32))
    return masks


def causal_conv_mask(k: int, include_center: bool) -> np.ndarray:
    """[k, k] PixelCNN raster-causal tap mask (mask A / mask B).

    Taps strictly before the center in raster order (rows above; same row
    left of center); ``include_center`` (mask B, layers >= 1) also allows
    the center tap, whose incoming features already depend on the strict
    past only.
    """
    c = k // 2
    m = np.zeros((k, k), np.float32)
    m[:c, :] = 1.0
    m[c, :c] = 1.0
    if include_center:
        m[c, c] = 1.0
    return m


class LogPsiARNN(nn.Module):
    """Masked autoregressive log-amplitude over flattened spin configs.

    Two interchangeable trunks, both exactly autoregressive in the raster
    site order (same conditionals/sampling contract):
      * MADE masked-dense stack (default; any lattice) — hidden widths
        from ``hidden``.
      * PixelCNN masked-conv stack (``conv_kernel > 0``, 2D lattices):
        raster-causal kxk convs (mask A then mask B, zero padding — the
        causal order must NOT wrap), ``hidden`` as channel counts. Spatial
        weight sharing gives 2D inductive bias and O(k^2 C^2) params
        instead of O(N^2 H); note the usual PixelCNN blind spot applies
        (expressiveness, not correctness).

    Args:
      n_sites: total lattice sites (raster order; for the conv trunk this
        must equal prod(lattice_shape)).
      hidden: masked hidden-layer widths (MADE) or channels (conv).
      complex_params: add per-site phase outputs (complex psi). The phase
        for site i is conditioned on (s_<i, s_i) — summed over sites the
        total phase sees every spin.
      sz_zero: bake the S^z = 0 sector into the conditionals (exactly
        normalized on the sector; the direct sampler then never leaves it).
      param_scale: gain for the fan-in-scaled normal init.
      activation: 'selu' (default; self-normalizing for deep masked stacks)
        or 'lncosh'.
      conv_kernel: 0 = MADE dense trunk; odd k >= 3 = masked-conv trunk.
      lattice_shape: required for the conv trunk (2D raster geometry).
    """

    n_sites: int
    hidden: Tuple[int, ...] = (64, 64)
    complex_params: bool = False
    sz_zero: bool = False
    param_scale: float = 1.0
    activation: str = "selu"
    conv_kernel: int = 0
    lattice_shape: Optional[Tuple[int, ...]] = None
    #: fixed phase prior: log psi += i * sum_i half_angles[i] * s_i
    #: (models/phase.py semantics). A pure phase — |psi|, normalization,
    #: the conditionals, and exact ancestral sampling are all untouched,
    #: so unlike the generic PhaseBias wrapper it composes with the
    #: direct sampler. None = off.
    phase_half_angles: Optional[Tuple[float, ...]] = None

    def _act(self, x: Array) -> Array:
        from qmcnn_tpu.ops.cplx import ACTIVATIONS

        return ACTIVATIONS[self.activation][1](x)

    @nn.compact
    def _heads(self, s: Array):
        """Masked forward: s [B, N] in {-1,+1} (entries at/after a site are
        ignored by that site's head) -> (logit [B,N], phase_up, phase_dn).

        Phases are None for real models. (Single compact method: flax
        allows one per module; the two trunks branch inside.)
        """
        if self.conv_kernel:
            return self._heads_conv(s)
        return self._heads_made(s)

    def _heads_made(self, s: Array):
        n = self.n_sites
        masks = made_masks(n, self.hidden)
        x = s
        f_in = n
        for li, w in enumerate(self.hidden):
            mask = jnp.asarray(masks[li])
            # fan-in init on the UNMASKED weight count per unit (~f_in/2)
            std = self.param_scale / np.sqrt(max(f_in, 2) / 2.0)
            kern = self.param(f"w{li}", nn.initializers.normal(std),
                              (f_in, w), jnp.float32)
            bias = self.param(f"b{li}", nn.initializers.zeros, (w,),
                              jnp.float32)
            x = self._act(x @ (kern * mask) + bias)
            f_in = w
        out_mask = jnp.asarray(masks[-1])  # [f_in, N]
        n_heads = 3 if self.complex_params else 1
        std = self.param_scale / np.sqrt(max(f_in, 2) / 2.0)
        kern = self.param("w_out", nn.initializers.normal(std),
                          (f_in, n * n_heads), jnp.float32)
        bias = self.param("b_out", nn.initializers.zeros, (n * n_heads,),
                          jnp.float32)
        full_mask = jnp.tile(out_mask, (1, n_heads))
        out = x @ (kern * full_mask) + bias  # [B, N*n_heads]
        if self.complex_params:
            logit, ph_up, ph_dn = jnp.split(out, 3, axis=-1)
            return logit, ph_up, ph_dn
        return out, None, None

    def _heads_conv(self, s: Array):
        if self.lattice_shape is None or len(self.lattice_shape) != 2:
            raise ValueError("conv_kernel > 0 needs a 2D lattice_shape")
        k = self.conv_kernel
        if k % 2 == 0 or k < 3:
            raise ValueError(f"conv_kernel must be odd >= 3, got {k}")
        h, w_dim = self.lattice_shape
        b = s.shape[0]
        x = s.reshape(b, h, w_dim, 1)
        c_in = 1
        for li, ch in enumerate(self.hidden):
            mask = causal_conv_mask(k, include_center=(li > 0))
            fan_in = max(float(mask.sum()) * c_in, 2.0)
            std = self.param_scale / np.sqrt(fan_in)
            kern = self.param(f"conv{li}", nn.initializers.normal(std),
                              (k, k, c_in, ch), jnp.float32)
            bias = self.param(f"cb{li}", nn.initializers.zeros, (ch,),
                              jnp.float32)
            kern = kern * jnp.asarray(mask)[:, :, None, None]
            # zero padding: raster causality must not wrap around PBC
            x = jax.lax.conv_general_dilated(
                x, kern, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = self._act(x + bias)
            c_in = ch
        n_heads = 3 if self.complex_params else 1
        std = self.param_scale / np.sqrt(max(c_in, 2))
        kern = self.param("conv_out", nn.initializers.normal(std),
                          (1, 1, c_in, n_heads), jnp.float32)
        bias = self.param("cb_out", nn.initializers.zeros, (n_heads,),
                          jnp.float32)
        out = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        out = out.reshape(b, self.n_sites, n_heads)
        if self.complex_params:
            return out[..., 0], out[..., 1], out[..., 2]
        return out[..., 0], None, None

    def conditional_log_probs(self, s: Array):
        """(log_p_up [B,N], log_p_dn [B,N]) — conditional i given s_<i.

        Sector forcing (sz_zero): with u = ups already placed before site i
        and r = sites remaining (incl. i), p_up is forced to 1 when the
        budget needs every remaining site up (N/2 - u == r) and to 0 when
        the budget is spent (u == N/2).
        """
        logit, _, _ = self._heads(s)
        log_p_up = jax.nn.log_sigmoid(logit)
        log_p_dn = jax.nn.log_sigmoid(-logit)
        if not self.sz_zero:
            return log_p_up, log_p_dn
        n = self.n_sites
        up = (s > 0).astype(jnp.float32)
        # exclusive prefix count of ups before each site
        u = jnp.cumsum(up, axis=-1) - up
        i = jnp.arange(n, dtype=jnp.float32)
        ups_left = n / 2.0 - u            # ups still to place (incl. site i)
        sites_left = n - i                # sites still to fill (incl. i)
        force_up = ups_left >= sites_left
        force_dn = ups_left <= 0.0
        log_p_up = jnp.where(force_up, 0.0,
                             jnp.where(force_dn, _FORBIDDEN, log_p_up))
        log_p_dn = jnp.where(force_dn, 0.0,
                             jnp.where(force_up, _FORBIDDEN, log_p_dn))
        return log_p_up, log_p_dn

    def __call__(self, s: Array) -> C:
        """log psi(s) for full configurations s [B, N] in {-1,+1}."""
        log_p_up, log_p_dn = self.conditional_log_probs(s)
        is_up = s > 0
        log_p = jnp.where(is_up, log_p_up, log_p_dn).sum(-1)
        re = 0.5 * log_p
        prior = 0.0
        if self.phase_half_angles is not None:
            prior = s.astype(jnp.float32) @ jnp.asarray(
                self.phase_half_angles, jnp.float32)
        if not self.complex_params:
            return C(re, jnp.zeros_like(re) + prior)
        _, ph_up, ph_dn = self._heads(s)
        im = jnp.where(is_up, ph_up, ph_dn).sum(-1)
        return C(re, im + prior)


def conditional_fn(model: LogPsiARNN):
    """(variables, s [B,N]) -> (log_p_up, log_p_dn) through model.apply."""

    def fn(variables, s):
        return model.apply(variables, s, method="conditional_log_probs")

    return fn
