"""Experiment configuration (SURVEY.md R12 / N10): frozen dataclasses with
YAML serialization and dotted-key overrides.

configs/ ships one file per BASELINE config (tfim16_sgd, heis40_exchange,
heis8x8_cnn, j1j2_8x8_complex, heis10x10_sr). CLI:
  python -m qmcnn_tpu.train --config configs/tfim16_sgd.yaml \
      --override run.n_steps=500 --override optimizer.lr=0.02
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import yaml


@dataclass(frozen=True)
class LatticeConfig:
    shape: Tuple[int, ...] = (16,)
    pbc: bool = True
    #: 'hypercubic' (chain/square), 'triangular' (2D; 6 NN per site —
    #: geometric frustration; requires hamiltonian marshall: false and is
    #: incompatible with the C4v-based gcnn/point-group projections), or
    #: 'honeycomb' (2D; shape = CELL grid of the 2-site-basis lattice, so
    #: n_sites = 2*Lx*Ly; bipartite by basis — Marshall applies; basis
    #: spins enter the CNN as input channels; per-site tying/averaging
    #: [gcnn, translation/point-group average, tied RBM] is refused), or
    #: 'kagome' (2D; 3-site basis on the triangular Bravais cell grid, so
    #: n_sites = 3*Lx*Ly; corner-sharing triangles — never bipartite, so
    #: marshall: false is required; same basis-channel CNN treatment and
    #: per-site tying/averaging refusals as honeycomb)
    geometry: str = "hypercubic"


@dataclass(frozen=True)
class ModelConfig:
    kind: str = "cnn"  # cnn | gcnn | rbm | arnn | vit
    channels: Tuple[int, ...] = (8, 8)
    kernel_size: int = 3
    complex_params: bool = False
    param_scale: float = 0.05
    #: activation after each conv: 'lncosh' (reference-style) or 'selu'
    #: (re/im-wise, self-normalizing; required for deep stacks — measured:
    #: depth-6 lncosh collapses at any fixed init scale)
    activation: str = "lncosh"
    #: kernel init: 'fixed' (std = param_scale; reference-style, fine for
    #: <= 3 conv layers) or 'fan_in' (variance-preserving LeCun scaling with
    #: param_scale as the gain, ~1.0 — REQUIRED for deep stacks: lncosh is
    #: quadratic near zero, so fixed-std signals collapse/NaN with depth)
    init_mode: str = "fixed"
    #: identity skips on interior equal-width layers (deep stacks; see
    #: models/gcnn.py LogPsiGCNN.residual for why first/last are excluded)
    residual: bool = False
    #: explicit zero-momentum projection (logmeanexp over translations);
    #: the spatial-sum CNN is already invariant, so keep False unless the
    #: reference's explicit averaging is wanted (costs n_sites forwards).
    translation_average: bool = False
    shift_stride: int = 1
    #: integer wavenumbers per dim (k_d = 2 pi m_d / L_d) for the
    #: translation projection — nonzero targets a finite-momentum sector
    #: (excited states); requires translation_average: true
    momentum: Optional[List[int]] = None
    #: C4v point-group projection (8 forwards; 2D lattices): rotations and
    #: reflections are NOT built into the conv stack, unlike translations
    point_group_average: bool = False
    #: circular-conv compute path: auto | direct | roll | circulant
    conv_impl: str = "auto"
    #: conv operand precision: float32 | bfloat16 (f32 accumulation; run the
    #: energy-bias A/B in BASELINE.md before enabling bf16 on a new system)
    compute_dtype: str = "float32"
    #: RBM-only (kind='rbm'): hidden density H = alpha * N, and circulant
    #: weight tying for translation invariance
    rbm_alpha: int = 2
    rbm_tie_translations: bool = True
    #: GCNN-only (kind='gcnn'): C4v character of the projected readout
    #: (A1 | A2 | B1 | B2); channels are per-group-element widths
    gcnn_character: str = "A1"
    #: Z2 spin-inversion projection (any model kind): 0 = off, +1/-1 = the
    #: parity sector (S^z=0 Heisenberg/J1-J2 ground states: +1)
    spin_flip_sector: int = 0
    #: fixed phase prior on log psi (models/phase.py): null (off),
    #: 'sublattice_120' (Huse-Elser 120-degree order for triangular/kagome)
    #: or 'marshall' (the bipartite sign rule as an ansatz phase). Applied
    #: inside all symmetry projections; |psi| and the sampler are untouched.
    phase_bias: Optional[str] = None
    #: learnable two-body Jastrow amplitude factor tied over minimal-image
    #: distance shells (models/jastrow.py): exactly isometry-invariant,
    #: zero-initialized (identity at init), one extra [M,N]x[N,N] matmul
    #: per forward. Any kind except 'arnn' (breaks exact sampling).
    jastrow: bool = False
    #: learnable two-body PAIR PHASES: the same distance-shell quadratic
    #: form on the imaginary part, exp(i/2 sum u_c s_i s_j) — a trainable
    #: diagonal sign structure (Huse-Elser two-body term), the rung past
    #: the fixed 120-degree phase_bias priors. |psi| is untouched, so it
    #: composes with every sampler INCLUDING the ARNN's exact one; makes
    #: log psi complex (real-model SR fast path disqualifies itself).
    jastrow_phase: bool = False
    #: dedicated deep phase network (models/phasenet.py): a real CNN trunk
    #: over the cell grid whose scalar readout adds to Im log psi through a
    #: zero-initialized gate (exact identity at init; |psi| untouched, so
    #: sampling is preserved). The configuration-level sign-structure rung
    #: past jastrow_phase's pair-level form — the split amplitude/phase
    #: ansatz of Szabo & Castelnovo, PRB 102:214304. Empty/None = off; the
    #: trunk is fixed to the deep-safe recipe (selu, fan_in, residual>2).
    phase_net_channels: Tuple[int, ...] = ()
    phase_net_kernel: int = 3
    #: ARNN-only (kind='arnn'; channels are the masked hidden widths, and
    #: the default 'lncosh' activation is upgraded to 'selu' — lncosh is
    #: even, which wastes the masked stack's sign information):
    #: S^z sector baked into the conditionals — 'auto' (sz0 for
    #: heisenberg/j1j2, free for tfim) | 'none' | 'sz0'
    arnn_sector: str = "auto"
    #: ARNN trunk: 0 = MADE masked-dense (any lattice); odd k >= 3 = the
    #: PixelCNN raster-causal masked-conv trunk (2D lattices; channels =
    #: `channels`, spatial weight sharing, O(k^2 C^2) params)
    arnn_conv_kernel: int = 0
    #: Lanczos-improved variational ansatz (ops/lanczos.lanczos_wrap):
    #: non-null wraps the built model as phi = (1 + alpha H) psi with
    #: TRAINABLE alpha initialized here (a good init = the alpha* a
    #: measurement-time `measure --lanczos-step` reported). The exact
    #: identity log phi = log psi + log(1 + alpha E_loc) makes one Krylov
    #: step part of the ansatz — the structural rung the kagome-27 arm-I
    #: diagnostic pointed at (BASELINE.md r4). Training E_loc costs K^2
    #: base forwards per sample (K = hamiltonian connected states), so
    #: keep n_walkers modest; xla sampler backend only.
    lanczos_alpha: Optional[float] = None
    #: ViT-only (kind='vit'; channels = constant per-block width, one entry
    #: per transformer block): patch edge (must divide every lattice dim)
    vit_patch: int = 2
    vit_heads: int = 4
    vit_mlp_ratio: int = 2
    #: position-only ("factored") attention — the NQS-literature default;
    #: False = standard dot-product attention + relative-position bias
    vit_factored: bool = True


@dataclass(frozen=True)
class HamiltonianConfig:
    kind: str = "tfim"  # tfim | heisenberg | j1j2 | xyz
    j: float = 1.0
    h: float = 1.0      # TFIM transverse field
    hz: float = 0.0     # TFIM longitudinal (sigma) / xyz longitudinal (S)
    j2: float = 0.0     # J1-J2 frustration (kind='j1j2')
    marshall: bool = True
    #: XXZ anisotropy on Sz Sz (heisenberg/j1j2 kinds; 1.0 = isotropic,
    #: 0.0 = XY model; scales only the diagonal term)
    delta: float = 1.0
    #: kind='xyz' only: per-axis NN couplings Jx Sx Sx + Jy Sy Sy +
    #: Jz Sz Sz and a transverse field -hx sum Sx (S = sigma/2 convention
    #: throughout, fields included). S^z is conserved iff jx == jy and
    #: hx == 0; otherwise the sampler must use 'flip' moves.
    jx: float = 1.0
    jy: float = 1.0
    jz: float = 1.0
    hx: float = 0.0


@dataclass(frozen=True)
class SamplerConfig:
    #: 'metropolis' (MCMC chains; any model) or 'direct' (exact ancestral
    #: sampling; autoregressive models only — zero autocorrelation, no
    #: thermalization). 'auto' = direct for kind='arnn', metropolis else.
    kind: str = "auto"
    n_walkers: int = 1024
    move: str = "auto"  # auto -> flip (TFIM) / exchange (Heisenberg);
    # exchange_anti = Hastings-corrected anti-aligned-only proposals
    # (no identity proposals, ~2x mixing per forward)
    n_sweeps_per_step: int = 1
    n_therm_sweeps: int = 50
    sweep_size: Optional[int] = None  # proposals per sweep; default n_sites
    #: sweep engine: auto | xla | pallas (fused VMEM-resident kernel; real
    #: circulant-form CNNs only — auto falls back to xla otherwise)
    backend: str = "auto"
    pallas_block: int = 1024
    #: parallel tempering: strictly decreasing exponent ladder starting at
    #: 1.0 (e.g. [1.0, 0.7, 0.45, 0.25]); replica r samples |psi|^{2 b_r}
    #: and adjacent replicas swap configurations once per sweep. Mixing
    #: aid for rugged frustrated landscapes (kagome/triangular/J1-J2);
    #: costs len(betas) x sampling FLOPs, estimators see only the
    #: physical b=1 chain. Null = off. Metropolis xla backend only.
    tempering_betas: Optional[Tuple[float, ...]] = None


@dataclass(frozen=True)
class OptimizerConfig:
    kind: str = "sgd"  # sgd | adam
    lr: float = 0.02
    clip_norm: Optional[float] = 1.0  # global-norm clip; null/0 = off
    momentum: Optional[float] = None
    #: learning-rate schedule: constant | cosine | warmup_cosine | linear
    schedule: str = "constant"
    warmup_steps: int = 0
    #: total decay horizon for cosine/linear (defaults to run.n_steps)
    decay_steps: Optional[int] = None
    lr_min_ratio: float = 0.1
    #: excited-state targeting (ops/penalty.py): checkpoint directories of
    #: FROZEN states (same model config as this run) to stay orthogonal
    #: to. Adds orth_beta * sum_k |<psi_k|psi>|^2-normalized to the loss;
    #: with beta above the energy gap the minimizer is the lowest state
    #: orthogonal to every psi_k (the next excited state in the sector).
    orthogonalize_to: Optional[List[str]] = None
    orth_beta: float = 2.0
    #: exact deflation (ops/penalty.deflation_e_loc): when > 0, optimize
    #: the ground state of H + c sum_k |psi_k><psi_k| over the
    #: orthogonalize_to states INSTEAD of adding the beta-penalty
    #: gradient. The projector is folded into the local energy, so the
    #: minSR/SPRING sample-space solvers see it natively — use this (not
    #: orth_beta) with sr.solver='minsr'; choose c comfortably above the
    #: expected gap E1 - E0 (the deflated spectrum moves E0 up by c).
    deflate_c: float = 0.0
    #: Polyak/EMA parameter averaging: ema <- d*ema + (1-d)*params after
    #: every step (0 = off). Averages out the O(1/sqrt(M)) MC gradient
    #: noise over ~1/(1-d) steps of the converged tail; evaluate the
    #: averaged state with ``measure --ema``. Choose 1/(1-d) well below
    #: the tail length (e.g. 0.995 for a >=1000-step tail). Enabling it
    #: adds a params-sized pytree to TrainState/checkpoints (pre-EMA
    #: checkpoints stay loadable only with ema_decay=0; warm-start via
    #: run.init_from instead when turning it on for an existing state).
    ema_decay: float = 0.0
    #: momentum-sector targeting (vmc.sector_energy_and_grad): optimize
    #: the Rayleigh quotient of the translation projection P_q psi with
    #: bounded ratio estimators under |psi|^2 sampling — the
    #: metric-compatible route to E(q) after the r4 refutation of
    #: projected-net optimization (BASELINE.md (pi,pi) rows). Momentum in
    #: index units (q_d = 2 pi m_d / L_d). Cost: the connected-state
    #: working set grows by T = prod(shape) (auto-chunked). The model
    #: must NOT be translation-invariant (use e.g. an untied RBM: a
    #: spatial-sum CNN has exactly zero q != 0 weight). Incompatible with
    #: orthogonalize_to/deflate_c.
    sector_momentum: Optional[List[int]] = None
    #: strength of the -kappa log <P_q> sector-weight drive: pulls the
    #: state INTO the sector (weight -> 1), which also repairs the 1/D
    #: estimator variance amplification of a low-overlap warm start.
    sector_kappa: float = 0.5


@dataclass(frozen=True)
class SRConfig:
    enabled: bool = False
    #: pcg | cg | dense | minsr (sample-space, P>>M) | auto.
    #: 'auto' resolves at build time by the documented cutover (sr.py
    #: resolve_solver): minsr when the sample-space system is smaller
    #: (parts*M_total <= P — exact solve, Gram fits, and under a mesh its
    #: all_gather ships parts*M_total*P floats over ICI, cheaper than
    #: pcg's cg_maxiter psum(P) round trips precisely in that regime);
    #: pcg otherwise.
    solver: str = "pcg"
    diag_shift0: float = 1.0
    diag_shift_decay: float = 0.95
    diag_shift_min: float = 1e-2
    proportional_shift: bool = False
    cg_tol: float = 1e-4
    cg_maxiter: int = 200
    jacobian_chunk: Optional[int] = None
    #: distributed-minSR Gram assembly: 'gather' (default) or 'ring'
    #: (ppermute; O(M_local x P) peak memory — for very large P)
    minsr_assembly: str = "gather"
    #: SPRING momentum mu (minsr solver only; 0 = plain SR). The previous
    #: natural gradient seeds the regularized solve, and the current step's
    #: residuals CORRECT its stale directions rather than blindly adding
    #: them (arXiv:2401.10190). Typical mu 0.4-0.9 with a small constant
    #: diag_shift (e.g. 1e-3); threads the [P] carry through TrainState.
    momentum: float = 0.0


@dataclass(frozen=True)
class RunConfig:
    n_steps: int = 1000
    seed: int = 0
    #: training steps fused into one device dispatch (lax.scan over steps);
    #: amortizes host round trips (~30ms each on the TPU tunnel). Keep
    #: steps_per_dispatch x per-step time under ~60s — the tunneled TPU
    #: kills longer single dispatches with an UNAVAILABLE device error.
    #: 0 = auto: time one single-step dispatch, then pick the largest
    #: chunk that fits the ~40s safety budget (costs one extra compile).
    steps_per_dispatch: int = 10
    #: thermalization sweeps fused into one device dispatch. Thermalization
    #: is sampler.n_therm_sweeps sequential lattice sweeps; on large
    #: lattices with deep models a single all-sweeps dispatch exceeds the
    #: tunnel's ~80s dispatch kill (observed: 16x16 depth-8 GCNN died at
    #: the first dispatch, runs/r2_pipeline24.out). Chunking costs one
    #: ~30ms host round trip per chunk and (for a non-divisible tail) one
    #: extra compile; the MC stream stays deterministic (per-chunk keys
    #: are folded from the sweep offset). 0 = all sweeps in one dispatch.
    therm_sweeps_per_dispatch: int = 10
    log_every: int = 10
    csv_path: Optional[str] = None
    tensorboard_dir: Optional[str] = None
    ckpt_dir: Optional[str] = None
    ckpt_every: int = 200
    ckpt_keep: int = 3
    n_devices: Optional[int] = None  # None = all visible devices
    chunk_size: Optional[int] = None  # local-energy walker chunking
    validate_against_ed: bool = True  # only runs when n_sites <= 20
    #: wrap the train step in jax.experimental.checkify (utils/debug.py):
    #: OOB indices / NaN / Inf raise instead of being silently clamped.
    #: Debugging aid — instruments every indexing op, so keep off for speed.
    checkify: bool = False
    #: warm-start: checkpoint directory to transfer params from before
    #: training (conv kernels are lattice-size-agnostic, so a converged
    #: small-lattice state initializes a larger lattice — the standard NQS
    #: scaling trick). Leaves are copied where (path, shape) match the
    #: fresh init; the rest stay freshly initialized. Ignored when resuming
    #: from this run's own ckpt_dir. See utils/transfer.py.
    init_from: Optional[str] = None
    #: which step to read from init_from (None = latest)
    init_from_step: Optional[int] = None
    #: net2net-style width expansion for init_from: ALSO transfer leaves
    #: whose shape is strictly contained in the fresh leaf's (source block
    #: embedded at the leading corner, fresh init fills the widened
    #: channels — the transferred function is perturbed only at second
    #: order). For widening a converged rung (e.g. C=10 -> C=12 GCNN)
    #: without a cold start. See utils/transfer.transfer_params.
    init_expand: bool = False
    #: RELATIVE stddev of an isotropic gaussian kick added to the params
    #: AFTER the init_from transfer (ignored without init_from / on
    #: resume): each leaf is perturbed by init_noise x its own RMS.
    #: Saddle breaking for warm starts that begin at a stationary point —
    #: e.g. excited-state runs deflating away the very state they start
    #: from. ~0.05 = a 5% kick
    init_noise: float = 0.0
    #: print a loud warning if a single device dispatch blocks longer than
    #: this many seconds (a wedged TPU tunnel otherwise hangs silently —
    #: observed on the tunneled v5e). 0 disables.
    dispatch_warn_s: float = 300.0
    #: liveness file for the wedge-recovery supervisor (qmcnn_tpu.supervise):
    #: after every completed dispatch train() rewrites this file with
    #: "<step> <unix-time>". The supervisor watches its mtime and
    #: kills+restarts a child whose heartbeat goes stale (the run resumes
    #: from ckpt_dir). Null = no heartbeat. Normally set by the supervisor
    #: via --override, not by hand.
    heartbeat_path: Optional[str] = None
    #: post-checkpoint settle: seconds to pause after each Orbax save
    #: before launching the next dispatch. All three r4 tunnel wedges
    #: clustered within ~25 steps of a (synchronous) save (BASELINE.md r4
    #: ops note), so train() already pings the device after every save and
    #: logs save/dispatch timestamps to <heartbeat_path>.events; this knob
    #: adds a cool-down for wedge-prone workloads. 0 = ping only.
    save_settle_s: float = 0.0
    #: multi-host: call jax.distributed.initialize() before any device use
    #: (SURVEY.md P3). On TPU pods leave the address/count/id fields null —
    #: they auto-detect from the pod metadata; for manual process groups
    #: (e.g. the 2-process CPU integration test) set all three. The walker
    #: mesh then spans every process's devices and all pmean/psum hooks
    #: reduce globally; walkers shard by global device order.
    distributed: bool = False
    coordinator_address: Optional[str] = None  # "host:port"
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    #: what to do when a dispatch returns a non-finite energy (a diverged
    #: optimizer NaNs every later step — observed: the r1 depth-8 run
    #: burned 2350 steps after a step-650 NaN):
    #:   'rollback' (default) — restore the last checkpoint, re-derive the
    #:     MC stream with a retry-folded key (a deterministic replay would
    #:     NaN identically), and continue; after nan_max_retries failed
    #:     rollbacks, or with no checkpoint to restore, raise.
    #:   'halt' — raise immediately (the supervisor counts it as a crash).
    #:   'ignore' — pre-round-2 behavior: keep training through NaN.
    nan_policy: str = "rollback"
    nan_max_retries: int = 3


@dataclass(frozen=True)
class Config:
    name: str = "experiment"
    lattice: LatticeConfig = field(default_factory=LatticeConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    hamiltonian: HamiltonianConfig = field(default_factory=HamiltonianConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    sr: SRConfig = field(default_factory=SRConfig)
    run: RunConfig = field(default_factory=RunConfig)


# ---------------------------------------------------------------------------
# (de)serialization
# ---------------------------------------------------------------------------

def _to_dict(cfg) -> dict:
    d = dataclasses.asdict(cfg)

    def tuples_to_lists(x):
        if isinstance(x, dict):
            return {k: tuples_to_lists(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return list(x)
        return x

    return tuples_to_lists(d)


_TUPLE_FIELDS = {"shape", "channels", "phase_net_channels"}


def _from_dict(data: dict) -> Config:
    def sub(cls, d):
        if d is None:
            return cls()
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name in d:
                v = d[f.name]
                if f.name in _TUPLE_FIELDS and isinstance(v, list):
                    v = tuple(v)
                kwargs[f.name] = v
        unknown = set(d) - {f.name for f in dataclasses.fields(cls)}
        if unknown:
            raise ValueError(f"unknown {cls.__name__} keys: {sorted(unknown)}")
        return cls(**kwargs)

    return Config(
        name=data.get("name", "experiment"),
        lattice=sub(LatticeConfig, data.get("lattice")),
        model=sub(ModelConfig, data.get("model")),
        hamiltonian=sub(HamiltonianConfig, data.get("hamiltonian")),
        sampler=sub(SamplerConfig, data.get("sampler")),
        optimizer=sub(OptimizerConfig, data.get("optimizer")),
        sr=sub(SRConfig, data.get("sr")),
        run=sub(RunConfig, data.get("run")),
    )


def to_yaml(cfg: Config) -> str:
    return yaml.safe_dump(_to_dict(cfg), sort_keys=False)


def from_yaml(text: str) -> Config:
    return _from_dict(yaml.safe_load(text) or {})


def load(path: str, overrides: Tuple[str, ...] = ()) -> Config:
    """Load a YAML config and apply ``section.key=value`` overrides."""
    with open(path) as f:
        cfg = from_yaml(f.read())
    return apply_overrides(cfg, overrides)


def apply_overrides(cfg: Config, overrides) -> Config:
    data = _to_dict(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be section.key=value: {ov!r}")
        path, _, raw = ov.partition("=")
        keys = path.split(".")
        value = yaml.safe_load(raw)
        d = data
        for k in keys[:-1]:
            if k not in d:
                raise KeyError(f"unknown config section {k!r} in {ov!r}")
            d = d[k]
        if keys[-1] not in d:
            raise KeyError(f"unknown config key {keys[-1]!r} in {ov!r}")
        d[keys[-1]] = value
    return _from_dict(data)
