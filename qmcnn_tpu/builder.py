"""Config -> framework objects (the L5 glue; SURVEY.md layer map).

``build(config)`` wires lattice, ansatz, Hamiltonian, sampler, optimizer and
(optionally) SR into a :class:`qmcnn_tpu.vmc.VMC`, and ``build_sharded``
additionally wraps it over the walker mesh.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from qmcnn_tpu.configs import Config
from qmcnn_tpu.lattice import Lattice
from qmcnn_tpu.models.cnn import (LogPsiCNN, PointGroupAveraged,
                                  TranslationAveraged, log_psi_apply)
from qmcnn_tpu.ops.hamiltonians import TFIM, XYZ, Heisenberg
from qmcnn_tpu.parallel.mesh import ShardedVMC, make_sharded_vmc, walker_mesh
from qmcnn_tpu.sampler.metropolis import MetropolisSampler
from qmcnn_tpu.sr import SR
from qmcnn_tpu.vmc import VMC


def build_lattice(cfg: Config) -> Lattice:
    return Lattice(tuple(cfg.lattice.shape), pbc=cfg.lattice.pbc,
                   geometry=cfg.lattice.geometry)


def build_hamiltonian(cfg: Config, lattice: Lattice):
    h = cfg.hamiltonian
    if h.kind == "tfim":
        return TFIM(lattice, j=h.j, h=h.h, hz=h.hz)
    if h.kind == "heisenberg":
        return Heisenberg(lattice, j=h.j, marshall=h.marshall, delta=h.delta)
    if h.kind == "j1j2":
        return Heisenberg(lattice, j=h.j, j2=h.j2, marshall=h.marshall,
                          delta=h.delta)
    if h.kind == "xyz":
        return XYZ(lattice, jx=h.jx, jy=h.jy, jz=h.jz, hx=h.hx, hz=h.hz,
                   marshall=h.marshall)
    raise ValueError(f"unknown hamiltonian kind {h.kind!r}")


def build_model(cfg: Config, lattice: Lattice):
    m = cfg.model
    if m.translation_average and not lattice.pbc:
        raise ValueError("translation averaging requires periodic boundaries")
    if lattice.basis > 1:
        # honeycomb (2-site basis): only CELL translations are lattice
        # symmetries; anything that ties or averages over per-SITE grid
        # shifts would impose a non-symmetry on psi
        for flag, name in ((m.translation_average, "translation_average"),
                           (m.point_group_average, "point_group_average")):
            if flag:
                raise ValueError(
                    f"model.{name} rolls the flat site grid — not a "
                    f"symmetry of geometry={lattice.geometry!r}; the CNN's "
                    f"spatial-sum readout already gives exact cell-"
                    f"translation invariance")
        if m.kind == "rbm" and m.rbm_tie_translations:
            raise ValueError("rbm_tie_translations ties per-site shifts — "
                             f"not a symmetry of {lattice.geometry!r}; use "
                             "rbm_tie_translations: false")
        if m.kind == "arnn" and m.arnn_conv_kernel:
            raise ValueError("the PixelCNN ARNN trunk rasterizes a 1-site-"
                             f"basis grid; {lattice.geometry!r} needs the "
                             "MADE trunk (arnn_conv_kernel: 0)")
    if m.momentum and any(m.momentum):
        # validated before the per-kind branches so a finite-momentum
        # request can never be silently ignored (e.g. by gcnn/rbm, which
        # have no momentum projector)
        if m.kind != "cnn":
            raise ValueError(
                f"model.momentum is only supported by the cnn ansatz via "
                f"translation averaging (got kind={m.kind!r})")
        if not m.translation_average:
            raise ValueError("model.momentum requires translation_average: "
                             "true (the sector is defined by the projection)")
    if m.kind == "rbm":
        from qmcnn_tpu.models.rbm import LogPsiRBM

        if m.rbm_tie_translations and not lattice.pbc:
            raise ValueError("tied-RBM weights require periodic boundaries")
        return _maybe_spin_flip(_maybe_priors(LogPsiRBM(
            lattice_shape=tuple(lattice.shape),
            alpha=m.rbm_alpha,
            complex_params=m.complex_params,
            tie_translations=m.rbm_tie_translations,
            param_scale=m.param_scale,
        ), m, lattice), m)
    if m.kind == "arnn":
        from qmcnn_tpu.models.arnn import LogPsiARNN

        for flag, name in ((m.translation_average, "translation_average"),
                           (m.point_group_average, "point_group_average"),
                           (m.spin_flip_sector, "spin_flip_sector")):
            if flag:
                raise ValueError(
                    f"model.{name} is incompatible with the autoregressive "
                    f"ansatz: symmetrized sums of normalized amplitudes are "
                    f"no longer normalized, which breaks exact sampling")
        if m.jastrow:
            raise ValueError(
                "model.jastrow is incompatible with the autoregressive "
                "ansatz: a configuration-dependent amplitude factor breaks "
                "the exact-sampling normalization (jastrow_phase — a pure "
                "phase, |psi| untouched — composes fine)")
        if m.phase_net_channels:
            raise ValueError(
                "model.phase_net_channels is not wired for the "
                "autoregressive ansatz (it already has per-site phase "
                "heads; the CNN-trunk wrapper cannot forward the exact-"
                "sampling conditional contract)")
        sz_zero = resolve_arnn_sector(cfg)
        if sz_zero and lattice.n_sites % 2:
            raise ValueError("sz0 sector needs an even number of sites")
        if m.arnn_conv_kernel and len(lattice.shape) != 2:
            raise ValueError("arnn_conv_kernel (PixelCNN trunk) needs a 2D "
                             "lattice; chains use the MADE trunk (0)")
        half = None
        if m.phase_bias:
            # a pure phase composes with exact sampling — baked into the
            # ARNN's own phase output instead of the generic wrapper
            # (which cannot forward the sampler contract)
            from qmcnn_tpu.models.phase import phase_half_angles

            half = phase_half_angles(m.phase_bias, lattice)
        arnn = LogPsiARNN(
            n_sites=lattice.n_sites,
            hidden=tuple(m.channels),
            complex_params=m.complex_params,
            sz_zero=sz_zero,
            param_scale=m.param_scale,
            activation=m.activation if m.activation != "lncosh" else "selu",
            conv_kernel=m.arnn_conv_kernel,
            lattice_shape=tuple(lattice.shape),
            phase_half_angles=half,
        )
        if m.jastrow_phase:
            # a pure phase preserves |psi|^2, so exact ancestral sampling
            # survives the wrapper; the sampler reaches the inner ARNN's
            # conditionals through it (build()'s DirectSampler adapter)
            from qmcnn_tpu.models.jastrow import wrap_jastrow

            return wrap_jastrow(arnn, lattice, amplitude=False, phase=True)
        return arnn
    if m.kind == "gcnn":
        from qmcnn_tpu.models.gcnn import LogPsiGCNN

        if len(lattice.shape) != 2 or not lattice.pbc:
            raise ValueError("gcnn needs a periodic 2D lattice")
        if lattice.geometry not in ("hypercubic", "triangular", "kagome"):
            raise ValueError("gcnn is point-group equivariant for square "
                             "(C4v), triangular (D6) and kagome (D6 via "
                             "the depleted-triangular embedding) lattices "
                             f"only — not geometry={lattice.geometry!r}")
        if m.translation_average or m.point_group_average:
            raise ValueError("gcnn is already fully space-group symmetric; "
                             "drop translation/point_group averaging")
        if lattice.geometry == "kagome":
            from qmcnn_tpu.models.kgcnn import LogPsiKagomeGCNN

            inner = LogPsiKagomeGCNN(
                cell_shape=tuple(lattice.shape),
                channels=tuple(m.channels),
                radius=max((m.kernel_size - 1) // 2, 1),
                complex_params=m.complex_params,
                param_scale=m.param_scale,
                character=m.gcnn_character,
                init_mode=m.init_mode,
                activation=m.activation,
                residual=m.residual,
                compute_dtype=m.compute_dtype,
            )
            return _maybe_spin_flip(_maybe_priors(inner, m, lattice), m)
        if lattice.geometry == "triangular":
            from qmcnn_tpu.models.tgcnn import LogPsiTriGCNN

            # kernel_size names the enclosing grid (3 -> radius-1 star of
            # 7 taps, 5 -> radius-2 star of 19 taps), matching the square
            # GCNN's config surface
            inner = LogPsiTriGCNN(
                lattice_shape=tuple(lattice.shape),
                channels=tuple(m.channels),
                radius=max((m.kernel_size - 1) // 2, 1),
                complex_params=m.complex_params,
                param_scale=m.param_scale,
                character=m.gcnn_character,
                init_mode=m.init_mode,
                activation=m.activation,
                residual=m.residual,
                compute_dtype=m.compute_dtype,
            )
            return _maybe_spin_flip(_maybe_priors(inner, m, lattice), m)
        inner = LogPsiGCNN(
            lattice_shape=tuple(lattice.shape),
            channels=tuple(m.channels),
            kernel_size=m.kernel_size,
            complex_params=m.complex_params,
            param_scale=m.param_scale,
            character=m.gcnn_character,
            init_mode=m.init_mode,
            activation=m.activation,
            residual=m.residual,
            compute_dtype=m.compute_dtype,
        )
        return _maybe_spin_flip(_maybe_priors(inner, m, lattice), m)
    if m.kind == "vit":
        from qmcnn_tpu.models.vit import LogPsiViT

        if not lattice.pbc:
            raise ValueError("vit projects translations by rolling the "
                             "grid — periodic boundaries required")
        if lattice.geometry != "hypercubic" or lattice.basis > 1:
            raise ValueError("vit patchifies the hypercubic site grid; "
                             f"geometry={lattice.geometry!r} is not "
                             "supported")
        if m.translation_average:
            raise ValueError("vit is already exactly translation invariant "
                             "(relpos attention + sub-patch projection); "
                             "drop translation_average")
        inner = LogPsiViT(
            lattice_shape=tuple(lattice.shape),
            channels=tuple(m.channels),
            patch=m.vit_patch,
            n_heads=m.vit_heads,
            mlp_ratio=m.vit_mlp_ratio,
            factored=m.vit_factored,
            complex_params=m.complex_params,
            param_scale=m.param_scale,
            compute_dtype=m.compute_dtype,
        )
        inner = _maybe_priors(inner, m, lattice)
        if m.point_group_average:
            if lattice.ndim != 2:
                raise ValueError("point_group_average needs a 2D lattice")
            inner = PointGroupAveraged(inner=inner,
                                       lattice_shape=tuple(lattice.shape))
        return _maybe_spin_flip(inner, m)
    if m.kind != "cnn":
        raise ValueError(f"unknown model kind {m.kind!r}")
    inner = LogPsiCNN(
        lattice_shape=tuple(lattice.shape),
        channels=tuple(m.channels),
        kernel_size=m.kernel_size,
        complex_params=m.complex_params,
        param_scale=m.param_scale,
        conv_impl=m.conv_impl,
        pbc=lattice.pbc,
        compute_dtype=m.compute_dtype,
        init_mode=m.init_mode,
        activation=m.activation,
        residual=m.residual,
        basis=lattice.basis,
    )
    inner = _maybe_priors(inner, m, lattice)
    if m.translation_average:
        inner = TranslationAveraged(inner=inner,
                                    lattice_shape=tuple(lattice.shape),
                                    shift_stride=m.shift_stride,
                                    momentum=tuple(m.momentum or ()))
    if m.point_group_average:
        if lattice.ndim != 2 or not lattice.pbc:
            raise ValueError("point_group_average needs a periodic 2D "
                             "lattice")
        if lattice.geometry != "hypercubic":
            raise ValueError("point_group_average applies the square C4v "
                             "group — not a symmetry of "
                             f"geometry={lattice.geometry!r}")
        inner = PointGroupAveraged(inner=inner,
                                   lattice_shape=tuple(lattice.shape))
    return _maybe_spin_flip(inner, m)


def _maybe_priors(inner, m, lattice):
    # Innermost wrappers (inside translation/point-group/spin-parity
    # projections) so the projected state is the projection of the BIASED
    # state — see models/phase.py. The Jastrow factor and the phase priors
    # are both isometry-invariant and Z2-even, so their order (and their
    # placement relative to the projections) is mathematically irrelevant.
    if m.phase_net_channels:
        from qmcnn_tpu.models.phasenet import wrap_phase_net

        inner = wrap_phase_net(inner, lattice,
                               channels=m.phase_net_channels,
                               kernel_size=m.phase_net_kernel)
    if m.jastrow or m.jastrow_phase:
        from qmcnn_tpu.models.jastrow import wrap_jastrow

        inner = wrap_jastrow(inner, lattice, amplitude=m.jastrow,
                             phase=m.jastrow_phase)
    if not m.phase_bias:
        return inner
    from qmcnn_tpu.models.phase import PhaseBias, phase_half_angles

    return PhaseBias(inner=inner,
                     half_angles=phase_half_angles(m.phase_bias, lattice))


def _maybe_spin_flip(inner, m):
    if not m.spin_flip_sector:
        return inner
    from qmcnn_tpu.models.gcnn import SpinFlipSymmetrized

    return SpinFlipSymmetrized(inner=inner, sector=m.spin_flip_sector)


def build_lr_schedule(cfg: Config):
    o = cfg.optimizer
    decay = o.decay_steps or cfg.run.n_steps
    if o.schedule == "constant":
        lr = o.lr
    elif o.schedule == "cosine":
        lr = optax.cosine_decay_schedule(o.lr, decay,
                                         alpha=o.lr_min_ratio)
    elif o.schedule == "warmup_cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, o.lr, max(o.warmup_steps, 1), decay,
            end_value=o.lr * o.lr_min_ratio)
    elif o.schedule == "linear":
        lr = optax.linear_schedule(o.lr, o.lr * o.lr_min_ratio, decay)
    else:
        raise ValueError(f"unknown lr schedule {o.schedule!r}")
    return lr


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    o = cfg.optimizer
    lr = build_lr_schedule(cfg)
    if o.kind == "sgd":
        base = optax.sgd(lr, momentum=o.momentum)
    elif o.kind == "adam":
        base = optax.adam(lr)
    else:
        raise ValueError(f"unknown optimizer kind {o.kind!r}")
    if o.clip_norm:  # null OR 0 disable clipping (0 would freeze training)
        return optax.chain(optax.clip_by_global_norm(o.clip_norm), base)
    return base


def model_log_psi_is_real(cfg: Config) -> bool:
    """True iff log psi(s) is real for ALL parameter values, so the J_im
    score block is identically zero and SR can skip it (sr.py
    real_log_psi). Conservative: any feature that can put a phase on psi
    (complex weights, odd spin-flip sector, a sign-changing C4v character,
    a finite momentum sector) disqualifies."""
    m = cfg.model
    if m.complex_params:
        return False
    if m.spin_flip_sector == -1:
        return False
    if m.kind == "gcnn" and m.gcnn_character != "A1":
        return False
    if m.momentum and any(m.momentum):
        return False
    if m.phase_bias:
        return False
    if m.jastrow_phase:
        return False
    if m.phase_net_channels:
        return False
    return True


def build_sr(cfg: Config, lattice=None, ham=None,
             n_params: Optional[int] = None) -> Optional[SR]:
    s = cfg.sr
    if not s.enabled:
        return None
    solver = s.solver
    if solver == "auto":
        if n_params is None:
            raise ValueError("sr.solver='auto' needs the built model's "
                             "n_params to resolve (use builder.build)")
        from qmcnn_tpu.sr import resolve_solver

        solver = resolve_solver(solver, cfg.sampler.n_walkers, n_params,
                                model_log_psi_is_real(cfg))
        # the memory estimator keys off the *resolved* solver
        import dataclasses as _dc

        cfg = _dc.replace(cfg, sr=_dc.replace(s, solver=solver))
    if s.momentum and solver != "minsr":
        raise ValueError("sr.momentum (SPRING) requires solver='minsr' "
                         f"(resolved solver: {solver!r})")
    jacobian_chunk = s.jacobian_chunk
    if jacobian_chunk is None and lattice is not None and ham is not None:
        from qmcnn_tpu.utils import memory

        jacobian_chunk = memory.auto_jacobian_chunk(cfg, lattice, ham,
                                                    n_params)
    return SR(
        solver=solver,
        diag_shift0=s.diag_shift0,
        diag_shift_decay=s.diag_shift_decay,
        diag_shift_min=s.diag_shift_min,
        proportional_shift=s.proportional_shift,
        cg_tol=s.cg_tol,
        cg_maxiter=s.cg_maxiter,
        jacobian_chunk=jacobian_chunk,
        real_log_psi=model_log_psi_is_real(cfg),
        minsr_assembly=s.minsr_assembly,
        momentum=s.momentum,
    )


def resolve_arnn_sector(cfg: Config) -> bool:
    """True iff the ARNN conditionals bake in the S^z = 0 sector."""
    sec = cfg.model.arnn_sector
    if sec == "auto":
        return cfg.hamiltonian.kind in ("heisenberg", "j1j2")
    if sec == "sz0":
        return True
    if sec == "none":
        return False
    raise ValueError(f"unknown model.arnn_sector {sec!r}")


def resolve_sampler_kind(cfg: Config) -> str:
    k = cfg.sampler.kind
    if k == "auto":
        return "direct" if cfg.model.kind == "arnn" else "metropolis"
    if k == "direct" and cfg.model.kind != "arnn":
        raise ValueError("sampler.kind='direct' requires the autoregressive "
                         "ansatz (model.kind='arnn'); other models are not "
                         "normalized and cannot be sampled ancestrally")
    if k not in ("metropolis", "direct"):
        raise ValueError(f"unknown sampler.kind {k!r}")
    return k


def resolve_move(cfg: Config) -> str:
    h = cfg.hamiltonian
    xyz_conserves_sz = h.jx == h.jy and h.hx == 0.0
    if cfg.sampler.move != "auto":
        if (h.kind == "xyz" and not xyz_conserves_sz
                and cfg.sampler.move.startswith("exchange")):
            raise ValueError(
                "xyz with jx != jy or hx != 0 does not conserve S^z; "
                "exchange moves would freeze the sampler in one sector — "
                "use sampler.move: flip (or auto)")
        return cfg.sampler.move
    if cfg.hamiltonian.kind == "tfim":
        return "flip"
    if cfg.hamiltonian.kind == "xyz":
        return "exchange" if xyz_conserves_sz else "flip"
    return "exchange"


def resolve_sampler_backend(cfg: Config) -> str:
    """'pallas' needs the real (non-complex, non-averaged) CNN whose
    circulant form the kernel implements. 'auto' selects pallas on TPU for
    compatible models — measured 32% faster than the XLA sweep on v5e
    (171k vs 130k walker-sweeps/s, exact decision parity) — and the XLA
    sweep everywhere else."""
    b = cfg.sampler.backend
    pallas_ok = (cfg.model.kind == "cnn"
                 # (1 + alpha H) wrapping changes |psi| itself — the fused
                 # kernel would sample the bare CNN (same reason as jastrow)
                 and cfg.model.lanczos_alpha is None
                 and not cfg.model.complex_params
                 and not cfg.model.translation_average
                 and not cfg.model.point_group_average
                 and not cfg.model.spin_flip_sector
                 # wrapper modules (jastrow, phase priors) nest the conv
                 # params under 'inner/' (prepare_circulant_params would
                 # not find them), and the jastrow factor changes |psi|
                 # itself — the fused kernel would sample the bare CNN
                 and not cfg.model.jastrow
                 and not cfg.model.jastrow_phase
                 and not cfg.model.phase_net_channels
                 and not cfg.model.phase_bias
                 # the fused kernel computes its f32 circulant forward;
                 # an end-to-end bf16 XLA stack would make different
                 # accept decisions than the kernel's f32 ones
                 and cfg.model.compute_dtype == "float32"
                 # the fused kernel's circulant form assumes a 1-site basis
                 # on the site grid (prod(shape) == n_sites)
                 and cfg.lattice.geometry not in ("honeycomb", "kagome"))
    if b == "auto":
        # measured on v5e: pallas wins for single-flip sweeps (+32% at
        # M=1024 flagship shapes); for exchange sweeps the gather-free XLA
        # scan wins decisively (279k vs 121k w-sweeps/s at M=2048) — the
        # fused kernel pays the circulant form's ~11x FLOP overhead.
        if (pallas_ok and jax.default_backend() == "tpu"
                and resolve_move(cfg) == "flip"):
            return "pallas"
        return "xla"
    if b == "pallas" and not pallas_ok:
        raise ValueError("sampler backend 'pallas' supports only plain "
                         "real CNN models (no complex params, symmetry "
                         "projections, phase priors, or jastrow)")
    return b


def build(cfg: Config, axis_name: Optional[str] = None
          ) -> Tuple[VMC, dict, Lattice]:
    """Returns (vmc, initial params, lattice)."""
    lattice = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lattice)
    model = build_model(cfg, lattice)

    def log_psi_fn(params, s):
        return log_psi_apply(model, params, s)

    params = model.init(
        jax.random.key(cfg.run.seed),
        jnp.ones((1, lattice.n_sites), jnp.float32),
    )
    if cfg.model.lanczos_alpha is not None:
        # phi = (1 + alpha H) psi as a trainable ansatz (ops/lanczos.py):
        # wrap AFTER model composition so priors/projections are inside,
        # BEFORE the sampler so the walk targets |phi|^2. Base leaves keep
        # their paths (alpha is a separate top-level collection), so warm
        # starts from plain-model checkpoints transfer unchanged.
        from qmcnn_tpu.ops.lanczos import lanczos_init_alpha, lanczos_wrap

        if resolve_sampler_kind(cfg) == "direct":
            raise ValueError(
                "model.lanczos_alpha needs Metropolis sampling: the ARNN "
                "conditionals sample |psi|^2, not |(1+aH)psi|^2")
        if cfg.sampler.backend == "pallas":
            raise ValueError(
                "model.lanczos_alpha runs on the xla sampler backend (the "
                "fused Pallas sweep computes the bare CNN forward only)")
        base_fn = log_psi_fn
        log_psi_fn = lanczos_wrap(base_fn, ham)
        params = dict(params)
        params["lanczos"] = lanczos_init_alpha(cfg.model.lanczos_alpha)
    if resolve_sampler_kind(cfg) == "direct":
        from qmcnn_tpu.models.arnn import conditional_fn
        from qmcnn_tpu.sampler.direct import DirectSampler

        if cfg.sampler.tempering_betas is not None:
            raise ValueError("tempering_betas is a Metropolis mixing aid — "
                             "exact ancestral sampling draws i.i.d. "
                             "samples and needs no tempering")
        from qmcnn_tpu.models.jastrow import Jastrow

        if isinstance(model, Jastrow):
            # jastrow_phase-wrapped ARNN: the pure-phase factor leaves
            # |psi|^2 untouched, so sampling uses the INNER conditionals
            # (params nest under 'inner/'); log_psi_fn stays the wrapped
            # model so estimators see the pair phases
            inner_arnn = model.inner

            def cond_fn(variables, s):
                return inner_arnn.apply(
                    {"params": variables["params"]["inner"]}, s,
                    method="conditional_log_probs")
        else:
            cond_fn = conditional_fn(model)
        sampler = DirectSampler(
            log_psi_fn,
            cond_fn,
            n_sites=lattice.n_sites,
            sz_zero=resolve_arnn_sector(cfg),
        )
    else:
        move = resolve_move(cfg)
        betas = cfg.sampler.tempering_betas
        backend = resolve_sampler_backend(cfg)
        if betas is not None and backend == "pallas":
            if cfg.sampler.backend == "pallas":
                raise ValueError("tempering_betas runs on the xla backend")
            backend = "xla"  # auto-selected pallas defers to tempering
        sampler = MetropolisSampler(
            log_psi_fn,
            n_sites=lattice.n_sites,
            move=move,
            bonds=lattice.nn_bonds if move.startswith("exchange") else None,
            sweep_size=cfg.sampler.sweep_size,
            backend=backend,
            lattice_shape=tuple(lattice.shape),
            pallas_block=cfg.sampler.pallas_block,
            betas=tuple(betas) if betas is not None else None,
        )
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    chunk_size = cfg.run.chunk_size
    if chunk_size is None:
        # null = auto: estimate from shapes; returns None (unchunked) when
        # the full E_loc batch fits the HBM budget (utils/memory.py)
        from qmcnn_tpu.utils import memory

        chunk_size = memory.auto_chunk_size(cfg, lattice, ham, n_params)
        if cfg.model.lanczos_alpha is not None:
            # the wrapped log_psi internally expands each batch element by
            # K more forwards (its own E_loc), so the training E_loc's
            # working set is K^2 x the estimator's model — scale the auto
            # chunk down by K and round to a divisor of M (local_energy's
            # divisibility contract)
            m_w = cfg.sampler.n_walkers
            target = max(1, (chunk_size or m_w) // ham.n_conn)
            while m_w % target:
                target -= 1
            chunk_size = None if target >= m_w else target
        if cfg.optimizer.sector_momentum is not None and chunk_size is None:
            # the sector projector evaluates every connected state at all
            # T translations (vmc.sector_energy_and_grad — it divides the
            # chunk it receives by T internally), so "plain E_loc fits
            # unchunked" does NOT mean the sector pass does: hand it the
            # full walker count as the plain-scale budget, which chunks
            # the sector pass at ~M/T walkers
            chunk_size = cfg.sampler.n_walkers
    sr = build_sr(cfg, lattice, ham, n_params)
    penalty_states = ()
    if cfg.optimizer.orthogonalize_to:
        from qmcnn_tpu.ops.penalty import make_frozen_state
        from qmcnn_tpu.utils.transfer import (load_checkpoint_params,
                                              transfer_params)

        frozen = []
        for i, d in enumerate(cfg.optimizer.orthogonalize_to):
            source = load_checkpoint_params(d)
            p_k, n_copied, n_fresh = transfer_params(params, source)
            if n_fresh:
                raise ValueError(
                    f"orthogonalize_to checkpoint {d!r} does not match this "
                    f"run's model ({n_fresh} leaves missing/mismatched) — "
                    f"frozen states must use the same model config")
            p_k = jax.tree_util.tree_map(jnp.asarray, p_k)
            # draw the frozen two-chain batch once: psi_k never changes,
            # so one well-thermalized sample is valid for the whole run
            # (ops/penalty.py docstring)
            key = jax.random.key(cfg.run.seed + 7919 * (i + 1))
            st = sampler.init_state(p_k, key, cfg.sampler.n_walkers)
            st = jax.jit(lambda st_, pk=p_k, k=key: sampler.sample(
                pk, st_, jax.random.fold_in(k, 1),
                jnp.arange(st_.s.shape[0]),
                n_sweeps=max(cfg.sampler.n_therm_sweeps, 20)))(st)
            frozen.append(make_frozen_state(log_psi_fn, p_k, st.s))
        penalty_states = tuple(frozen)
    if (penalty_states and cfg.optimizer.deflate_c <= 0
            and sr is not None and sr.solver == "minsr"):
        import warnings

        # Measured failure mode (BASELINE.md r3, runs/j1j2_4x4_excited_
        # minsr.csv): the sample-space minSR metric projects the update
        # onto the span of the CURRENT state's score vectors, which
        # suppresses the penalty's move-away direction — the run silently
        # collapses back onto the reference state (final overlap 0.999)
        # while every logged metric looks healthy. Raw-gradient, dense-SR
        # and pcg solves do move off the reference.
        warnings.warn(
            "optimizer.orthogonalize_to with sr.solver='minsr' is a "
            "documented silent-collapse mode: the sample-space natural-"
            "gradient metric suppresses the orthogonality-penalty "
            "direction and the run converges back onto the reference "
            "state. Use sr.solver='dense' or 'pcg' (or sr.enabled=false) "
            "for penalty/excited-state runs, or set optimizer.deflate_c "
            "(exact H + c|psi0><psi0| deflation folded into e_loc, "
            "which the sample-space solvers see natively).", stacklevel=2)
    if cfg.optimizer.sector_momentum is not None and (
            penalty_states or cfg.optimizer.deflate_c > 0):
        raise ValueError(
            "optimizer.sector_momentum is incompatible with "
            "orthogonalize_to/deflate_c: both redefine the effective "
            "local energy the solvers see")
    vmc = VMC(
        log_psi_fn=log_psi_fn,
        ham=ham,
        sampler=sampler,
        optimizer=build_optimizer(cfg),
        n_sweeps=cfg.sampler.n_sweeps_per_step,
        sr=sr,
        axis_name=axis_name,
        chunk_size=chunk_size,
        penalty_states=penalty_states,
        penalty_beta=cfg.optimizer.orth_beta,
        deflate_c=cfg.optimizer.deflate_c,
        ema_decay=cfg.optimizer.ema_decay,
        sector_momentum=(tuple(cfg.optimizer.sector_momentum)
                         if cfg.optimizer.sector_momentum is not None
                         else None),
        sector_kappa=cfg.optimizer.sector_kappa,
        lattice_shape=tuple(lattice.shape),
    )
    # Preflight HBM sanity: a device OOM on the tunneled TPU hard-crashes
    # the worker (no RESOURCE_EXHAUSTED) and can wedge the chip for over an
    # hour, so surface dangerous-looking configs before any dispatch.
    if cfg.sr.enabled:
        from qmcnn_tpu.utils import memory

        est = memory.peak_estimate(
            cfg, lattice, ham, n_params, solver=sr.solver,
            chunk_size=chunk_size, jacobian_chunk=sr.jacobian_chunk)
        msg = memory.preflight_message(est)
        if msg:
            print(f"WARNING: {msg}", flush=True)
    return vmc, params, lattice


def build_sharded(cfg: Config) -> Tuple[ShardedVMC, dict, Lattice]:
    """Build over the walker mesh (all visible or run.n_devices devices)."""
    mesh = walker_mesh(cfg.run.n_devices)
    vmc, params, lattice = build(cfg, axis_name="dp")
    template_vmc, _, _ = build(cfg, axis_name=None)
    # abstract evaluation: pytree structure only, no compute
    template = jax.eval_shape(
        lambda key, p: template_vmc.init_state(key, cfg.sampler.n_walkers, p),
        jax.random.key(cfg.run.seed + 1), params,
    )
    return make_sharded_vmc(vmc, mesh, template), params, lattice
