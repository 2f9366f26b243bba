"""HBM-estimate-driven auto-chunking (SURVEY.md section 5, the
"long-context analogue": lattice-size scaling bounded by chunked forwards).

Round-1 large-lattice runs needed hand-tuned ``run.chunk_size`` /
``sr.jacobian_chunk`` (trial-and-error against OOM; the calibration table
lives in docs/GUIDE.md). This module computes those defaults from the
config's shapes, so ``chunk_size: null`` / ``jacobian_chunk: null`` mean
"fit it for me" instead of "never chunk" — the estimator returns None
(no chunking) whenever the unchunked batch fits, which preserves the old
behavior for every small/medium config.

Model: peak HBM of a batched conv forward ~ batch x (live-layer window of
activations), where the window is ~2 layers for a forward-only pass (XLA
frees layer l-1 once l+1 is computed) and ~all layers for a backward pass
(saved residuals). Calibrated against the round-1 measurements: the
flagship 10x10 CNN E_loc (2048 walkers x 201 connected, ~5 GB at window 2)
ran unchunked on a 16 GB chip, while the deep 8x8/10x10 GCNN table rows
(docs/GUIDE.md) sit at 5.5-6.6 GB with their working hand-tuned chunks.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

#: live activation window of a forward-only pass, in layers
_FWD_WINDOW = 2.0
#: fraction of physical HBM the transient forward batch may claim (the
#: rest covers XLA workspace, fragmentation, and everything persistent
#: not itemized below)
_BUDGET_FRACTION = 0.45
#: default HBM when the backend does not report it (v5e chip)
_DEFAULT_HBM_BYTES = 16 * 1024**3


def device_hbm_bytes() -> int:
    """Physical device memory of the default device, if discoverable."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return _DEFAULT_HBM_BYTES


def connected_k(ham, n_sites: int) -> int:
    """Static connected-state count K, via abstract evaluation (no FLOPs)."""
    _, mel, _ = jax.eval_shape(
        ham.connected, jax.ShapeDtypeStruct((n_sites,), jnp.float32))
    return int(mel.shape[0])


@dataclasses.dataclass(frozen=True)
class ModelFootprint:
    """Per-configuration activation cost of one log-psi forward."""

    n_sites: int
    max_width: int        # widest layer's channel count (G-expanded for gcnn)
    n_layers: int
    n_parts: int          # 2 when activations are (re, im) pairs
    sym_batch: int        # internal batch blow-up (spin-flip wrapper: 2)
    fwd_window: float = _FWD_WINDOW   # live layer-buffers per part
    bwd_param_bytes: float = 0.0      # per-sample expanded-kernel grads

    def fwd_bytes(self) -> float:
        """Transient bytes per config of a forward-only pass."""
        return (self.fwd_window * self.n_sites * self.max_width
                * self.n_parts * self.sym_batch * 4.0)

    def bwd_bytes(self) -> float:
        """Transient bytes per config of a value+grad pass: residuals for
        every layer stay live, plus (group convs) the per-sample gradient
        of every layer's G-expanded kernel — the transpose of the
        trace-time gather materializes [B, G, G, taps, Cin, Cout] buffers
        before summing over the batch (measured: 12 x 684M f32 live on
        the tri6x6 D6-GCNN minSR Jacobian, runs/r2_pipeline10.out)."""
        return (self.n_layers * self.n_sites * self.max_width
                * self.n_parts * self.sym_batch * 4.0 * 2.0
                + self.bwd_param_bytes)


def model_footprint(cfg, n_sites: int) -> ModelFootprint:
    m = cfg.model
    channels = tuple(m.channels) or (1,)
    # G-expanded channel width: C4v = 8 on the square lattice, D6 = 12 on
    # the triangular embedding (models/tgcnn.py)
    if m.kind == "gcnn":
        geom = getattr(cfg.lattice, "geometry", "hypercubic")
        group = 12 if geom in ("triangular", "kagome") else 8
        if geom == "kagome":
            # depleted-triangular embedding (models/kgcnn.py): the fine
            # torus carries 4 points per cell vs the 3 kagome sites the
            # caller's n_sites counts — fold the 4/3 into the width
            group = int(np.ceil(group * 4.0 / 3.0))
    else:
        group = 1
    if m.kind == "rbm":
        width = max(1, int(m.rbm_alpha))
        n_layers = 1
    elif m.kind == "arnn":
        # masked dense stack: activations are [B, width] (no per-site
        # feature map), plus the [B, 3N] output heads — fold the site
        # factor out by reporting an effective per-site width
        width = max(max(channels), 3 * n_sites)
        n_layers = len(channels) + 1
        return ModelFootprint(n_sites=1, max_width=width,
                              n_layers=n_layers, n_parts=1, sym_batch=1)
    elif m.kind == "vit":
        # the p^d sub-patch roll projection multiplies the batch by p^d
        # while the token grid divides the sites by p^d — they cancel, so
        # per-config activations are ~ n_sites * d_model * mlp_ratio (the
        # MLP hidden is the widest tensor; factored attention's
        # softmax(bias) is input-independent and hoisted by XLA, and
        # dot-product logits [heads, T, T] are smaller than the MLP
        # hidden at these token counts). The generic n_parts/sym factors
        # below stay: complex_params doubling is conservative (only the
        # lncosh head is complex) — auto-chunking should err OOM-safe.
        width = max(channels) * max(1, int(m.vit_mlp_ratio))
        n_layers = len(channels)
    else:
        width = max(channels) * group
        n_layers = len(channels)
    pn = tuple(getattr(m, "phase_net_channels", ()) or ())
    if pn and m.kind != "arnn":
        # the phase-net trunk (models/phasenet.py) is a second real CNN
        # over the same cell grid: count its layers toward backward
        # residual liveness and let its width raise the live-buffer bound
        # (conservative — the trunk is real even when the inner stack is
        # complex, so the shared n_parts factor over-counts it OOM-safe)
        width = max(width, max(pn))
        n_layers += len(pn)
    n_parts = 2 if m.complex_params else 1
    sym = 2 if m.spin_flip_sector else 1
    if m.kind == "cnn" and m.translation_average:
        sym *= n_sites  # one forward per translation (shift_stride aside)
    if m.kind == "cnn" and m.point_group_average:
        sym *= 8
    # Complex conv stacks lower each layer to FOUR real convs (re*re,
    # im*im, re*im, im*re) whose outputs are all live before combining,
    # plus bf16 operand copies — measured on the tri6x6 D6-GCNN compile
    # OOM (runs/tri6x6_tgcnn.log): 4 x f32[B,6,6,96] + 3 x bf16 temps,
    # program 16.4 GB where the window-2 model predicted 6.2 GB. Window 4
    # per part (x n_parts=2 = 8 live buffers) tracks that dump; real conv
    # models keep the round-1-calibrated window 2.
    window = _FWD_WINDOW
    if m.kind in ("cnn", "gcnn") and m.complex_params:
        window = 4.0
    bwd_param = 0.0
    if m.kind == "gcnn":
        # per-sample expanded-kernel gradients (see bwd_bytes docstring):
        # sum over layers of G_in * G_out * taps * Cin * Cout floats —
        # the lift layer has G_in = 1. Triangular star kernels carry
        # 1 + 3r(r+1) taps (r = (k-1)/2: hexagonal shells), square k^2.
        # kagome routes through the triangular stack on the fine torus
        # (models/kgcnn.py), so it shares the hex-star tap count
        tri = getattr(cfg.lattice, "geometry",
                      "hypercubic") in ("triangular", "kagome")
        g = 12 if tri else 8
        ksz = int(getattr(m, "kernel_size", 3) or 3)
        if tri:
            r = max(1, (ksz - 1) // 2)
            taps = 1 + 3 * r * (r + 1)
        else:
            taps = ksz * ksz
        floats = 0.0
        cin = 1
        for cout in channels:
            g_in = 1 if cin == 1 else g
            floats += g_in * g * taps * cin * cout
            cin = cout
        # 1.5: measured liveness beyond one buffer per (layer, part)
        bwd_param = floats * 4.0 * n_parts * 1.5
    return ModelFootprint(n_sites=n_sites, max_width=width,
                          n_layers=n_layers, n_parts=n_parts, sym_batch=sym,
                          fwd_window=window, bwd_param_bytes=bwd_param)


def _largest_pow2_divisor_leq(m: int, target: float) -> int:
    """Largest power-of-two divisor of m that is <= target (>= 1)."""
    best = 1
    d = 1
    while m % (d * 2) == 0:
        d *= 2
        if d <= target:
            best = d
    return best


def auto_chunk_size(cfg, lattice, ham, n_params: Optional[int] = None,
                    hbm_bytes: Optional[int] = None) -> Optional[int]:
    """Local-energy walker chunk (run.chunk_size) or None for unchunked.

    Budget = _BUDGET_FRACTION x HBM minus the persistent SR Jacobian
    (M x P, doubled unless the model is real) when a materializing solver
    is configured.
    """
    hbm = device_hbm_bytes() if hbm_bytes is None else hbm_bytes
    m_local = _local_walkers(cfg)
    k1 = connected_k(ham, lattice.n_sites) + 1
    fp = model_footprint(cfg, lattice.n_sites)
    budget = _BUDGET_FRACTION * hbm - _persistent_bytes(cfg, n_params,
                                                        m_local)
    budget = max(budget, 0.05 * hbm)
    full = m_local * k1 * fp.fwd_bytes()
    if full <= budget:
        return None
    return _largest_pow2_divisor_leq(m_local, budget / (k1 * fp.fwd_bytes()))


def auto_jacobian_chunk(cfg, lattice, ham, n_params: Optional[int] = None,
                        hbm_bytes: Optional[int] = None) -> Optional[int]:
    """Sample chunk for the materialized SR Jacobian, or None."""
    hbm = device_hbm_bytes() if hbm_bytes is None else hbm_bytes
    m_local = _local_walkers(cfg)
    fp = model_footprint(cfg, lattice.n_sites)
    budget = _BUDGET_FRACTION * hbm - _persistent_bytes(cfg, n_params,
                                                        m_local)
    budget = max(budget, 0.05 * hbm)
    full = m_local * fp.bwd_bytes()
    if full <= budget:
        return None
    return _largest_pow2_divisor_leq(m_local, budget / fp.bwd_bytes())


def _local_walkers(cfg) -> int:
    n_dev = cfg.run.n_devices
    if not n_dev:
        try:
            n_dev = jax.device_count()
        except Exception:
            n_dev = 1
    return max(1, cfg.sampler.n_walkers // max(1, n_dev))


def _persistent_bytes(cfg, n_params: Optional[int], m_local: int) -> float:
    """Jacobian + Gram + a generous pad for params/opt/walker state."""
    pad = 256 * 1024**2
    if not cfg.sr.enabled or cfg.sr.solver == "cg" or not n_params:
        return pad
    from qmcnn_tpu.builder import model_log_psi_is_real

    parts = 1 if model_log_psi_is_real(cfg) else 2
    jac = float(m_local) * n_params * 4.0 * parts
    gram = 0.0
    if cfg.sr.solver == "minsr":
        gram = (parts * m_local) ** 2 * 4.0 * 3.0  # gram + cho workspace
    if cfg.sr.solver == "dense":
        gram = float(n_params) ** 2 * 4.0 * 3.0
    return pad + jac + gram


def peak_estimate(cfg, lattice, ham, n_params: Optional[int] = None,
                  hbm_bytes: Optional[int] = None,
                  solver: Optional[str] = None,
                  chunk_size: Optional[int] = None,
                  jacobian_chunk: Optional[int] = None) -> dict:
    """Rough per-chip peak-HBM estimate for the configured train step.

    persistent (SR Jacobian/Gram + pad) + max(E_loc transient, Jacobian-
    materialization transient) at the *given* chunk sizes. This is a
    lower-bound sanity model (XLA workspace, buffer copies during chunked
    Jacobian assembly, and fragmentation are not itemized), so treat
    fractions near 1 as "will OOM" and fractions above ~0.8 as risky: on
    the tunneled TPU an OOM does not raise RESOURCE_EXHAUSTED but
    hard-crashes the worker and can wedge the chip for over an hour
    (observed in round-2 production at M=4096 materialized minSR, P=101k).
    """
    hbm = device_hbm_bytes() if hbm_bytes is None else hbm_bytes
    m_local = _local_walkers(cfg)
    fp = model_footprint(cfg, lattice.n_sites)
    k1 = connected_k(ham, lattice.n_sites) + 1
    if solver is not None:
        cfg = dataclasses.replace(
            cfg, sr=dataclasses.replace(cfg.sr, solver=solver))
    persistent = _persistent_bytes(cfg, n_params, m_local)
    cs = chunk_size or m_local
    eloc_t = cs * k1 * fp.fwd_bytes()
    jac_t = 0.0
    if cfg.sr.enabled and cfg.sr.solver != "cg" and n_params:
        jac_t = (jacobian_chunk or m_local) * fp.bwd_bytes()
    transient = max(eloc_t, jac_t)
    peak = persistent + transient
    return {"hbm_bytes": float(hbm), "persistent_bytes": persistent,
            "transient_bytes": transient, "peak_bytes": peak,
            "fraction": peak / hbm}


def preflight_message(est: dict) -> Optional[str]:
    """A warning string when the estimate looks dangerous, else None."""
    frac = est["fraction"]
    if frac <= 0.8:
        return None
    return (f"estimated peak HBM {est['peak_bytes'] / 2**30:.1f} GiB of "
            f"{est['hbm_bytes'] / 2**30:.0f} GiB ({100 * frac:.0f}%; "
            f"persistent SR buffers {est['persistent_bytes'] / 2**30:.1f} "
            "GiB). A device OOM on the tunneled TPU hard-crashes the "
            "worker and can wedge the chip — consider fewer walkers "
            "(sampler.n_walkers), sr.solver=cg, or more devices.")


def describe(cfg, lattice, ham, n_params: Optional[int] = None,
             hbm_bytes: Optional[int] = None) -> str:
    cs = auto_chunk_size(cfg, lattice, ham, n_params, hbm_bytes)
    jc = auto_jacobian_chunk(cfg, lattice, ham, n_params, hbm_bytes)
    return (f"auto-chunking: chunk_size={cs or 'off'} "
            f"jacobian_chunk={jc or 'off'}")
