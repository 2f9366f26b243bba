"""Auto-chunking estimator tests (VERDICT r1 item 4; SURVEY.md section 5
"long-context analogue"). The estimator is a pure function of shapes +
an hbm_bytes argument, so these are exact, device-free checks."""
import jax
import jax.numpy as jnp

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.builder import build_hamiltonian, build_lattice
from qmcnn_tpu.utils import memory

HBM = 16 * 1024**3


def _cfg(shape, kind, channels, n_walkers, ham="heisenberg", j2=0.0,
         complex_params=False, spin_flip=0, solver="pcg"):
    return cfglib.Config(
        name="t",
        lattice=cfglib.LatticeConfig(shape=shape),
        model=cfglib.ModelConfig(kind=kind, channels=channels,
                                 complex_params=complex_params,
                                 spin_flip_sector=spin_flip),
        hamiltonian=cfglib.HamiltonianConfig(kind=ham, j2=j2),
        sampler=cfglib.SamplerConfig(n_walkers=n_walkers),
        sr=cfglib.SRConfig(enabled=True, solver=solver),
        run=cfglib.RunConfig(n_devices=1),
    )


def test_connected_k():
    cfg = _cfg((10, 10), "cnn", (16, 16, 16), 2048)
    lat = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lat)
    assert memory.connected_k(ham, lat.n_sites) == 200  # 2N NN bonds
    cfg = _cfg((8, 8), "cnn", (8,), 64, ham="j1j2", j2=0.5)
    lat = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lat)
    assert memory.connected_k(ham, lat.n_sites) == 256  # 4N


def test_flagship_stays_unchunked():
    """The round-1 flagship (10x10 CNN C=16^3, M=2048) ran unchunked on a
    16 GB chip — auto must NOT regress it to chunking."""
    cfg = _cfg((10, 10), "cnn", (16, 16, 16), 2048)
    lat = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lat)
    assert memory.auto_chunk_size(cfg, lat, ham, n_params=40000,
                                  hbm_bytes=HBM) is None
    assert memory.auto_jacobian_chunk(cfg, lat, ham, n_params=40000,
                                      hbm_bytes=HBM) is None


def test_deep_gcnn_16x16_gets_chunked():
    """The 16x16 deep-GCNN run needed hand-tuned chunks in round 1; auto
    must produce finite chunks that divide M."""
    cfg = _cfg((16, 16), "gcnn", (10,) * 6, 256, ham="j1j2", j2=0.5,
               complex_params=True, spin_flip=1, solver="minsr")
    lat = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lat)
    n_params = 60000
    cs = memory.auto_chunk_size(cfg, lat, ham, n_params, hbm_bytes=HBM)
    assert cs is not None and 256 % cs == 0 and cs <= 64
    # the M=256 Jacobian backward fits (None is correct); at M=4096 the
    # saved-residual cost forces a finite chunk
    big = _cfg((16, 16), "gcnn", (10,) * 6, 4096, ham="j1j2", j2=0.5,
               complex_params=True, spin_flip=1, solver="minsr")
    jc = memory.auto_jacobian_chunk(big, lat, ham, n_params, hbm_bytes=HBM)
    assert jc is not None and 4096 % jc == 0 and jc < 4096


def test_vit_hero_gets_chunked():
    """The 8x8 ViT hero (6 x 48-wide blocks, mlp_ratio 2, complex head +
    spin-parity, M=1024 on J1-J2 K=257) is a ~50 GB E_loc batch unchunked
    — auto must produce a finite divisor chunk, and the estimate must
    grow with mlp_ratio (the widest trunk tensor)."""
    cfg = cfglib.Config(
        name="t",
        lattice=cfglib.LatticeConfig(shape=(8, 8)),
        model=cfglib.ModelConfig(kind="vit", channels=(48,) * 6,
                                 complex_params=True, spin_flip_sector=1,
                                 vit_patch=2, vit_mlp_ratio=2),
        hamiltonian=cfglib.HamiltonianConfig(kind="j1j2", j2=0.5),
        sampler=cfglib.SamplerConfig(n_walkers=1024),
        sr=cfglib.SRConfig(enabled=True, solver="minsr"),
        run=cfglib.RunConfig(n_devices=1),
    )
    lat = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lat)
    cs = memory.auto_chunk_size(cfg, lat, ham, n_params=150000,
                                hbm_bytes=HBM)
    assert cs is not None and 1024 % cs == 0 and cs <= 256
    fp = memory.model_footprint(cfg, lat.n_sites)
    wide = cfglib.Config(
        name="t", lattice=cfg.lattice,
        model=cfglib.ModelConfig(kind="vit", channels=(48,) * 6,
                                 complex_params=True, spin_flip_sector=1,
                                 vit_patch=2, vit_mlp_ratio=4),
        hamiltonian=cfg.hamiltonian, sampler=cfg.sampler, sr=cfg.sr,
        run=cfg.run)
    assert (memory.model_footprint(wide, lat.n_sites).fwd_bytes()
            > fp.fwd_bytes())


def test_chunk_monotone_in_hbm():
    cfg = _cfg((12, 12), "gcnn", (10,) * 6, 512, ham="j1j2", j2=0.5,
               complex_params=True, spin_flip=1, solver="minsr")
    lat = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lat)
    sizes = []
    for hbm in (8 * 1024**3, 16 * 1024**3, 64 * 1024**3):
        cs = memory.auto_chunk_size(cfg, lat, ham, 60000, hbm_bytes=hbm)
        sizes.append(cs if cs is not None else cfg.sampler.n_walkers)
    assert sizes[0] <= sizes[1] <= sizes[2]


def test_builder_wires_auto_chunks():
    """chunk_size: null on a big config must come out finite via build()."""
    from qmcnn_tpu.builder import build

    cfg = _cfg((16, 16), "gcnn", (10,) * 6, 256, ham="j1j2", j2=0.5,
               complex_params=True, spin_flip=1, solver="minsr")
    assert cfg.run.chunk_size is None and cfg.sr.jacobian_chunk is None
    vmc, params, lat = build(cfg)
    assert vmc.chunk_size is not None and 256 % vmc.chunk_size == 0
    # M=256 Jacobian fits unchunked — None must mean "fits", not "unwired"
    assert vmc.sr.jacobian_chunk is None


def test_real_model_persistent_budget_smaller():
    """real_log_psi halves the Jacobian bytes, so the same config must get
    an equal-or-larger chunk when the model is real."""
    kw = dict(shape=(12, 12), kind="gcnn", channels=(10,) * 6,
              n_walkers=1024, ham="j1j2", j2=0.5, solver="minsr",
              spin_flip=1)
    real = _cfg(complex_params=False, **kw)
    cplx = _cfg(complex_params=True, **kw)
    lat = build_lattice(real)
    ham = build_hamiltonian(real, lat)
    n_params = 300000
    cs_real = memory.auto_chunk_size(real, lat, ham, n_params,
                                     hbm_bytes=HBM) or 10**9
    cs_cplx = memory.auto_chunk_size(cplx, lat, ham, n_params,
                                     hbm_bytes=HBM) or 10**9
    assert cs_real >= cs_cplx


def test_peak_estimate_and_preflight():
    """peak_estimate: fraction scales with walkers; preflight_message only
    fires above 80% of HBM and names the persistent share."""
    kw = dict(shape=(8, 8), kind="gcnn", channels=(10,) * 8, ham="j1j2",
              j2=0.5, complex_params=True, spin_flip=1, solver="minsr")
    lat = build_lattice(_cfg(n_walkers=1024, **kw))
    ham = build_hamiltonian(_cfg(n_walkers=1024, **kw), lat)
    n_params = 101000
    def est(n_walkers):
        # mirror build(): the preflight estimate uses post-auto-chunk sizes
        cfg = _cfg(n_walkers=n_walkers, **kw)
        cs = memory.auto_chunk_size(cfg, lat, ham, n_params, hbm_bytes=HBM)
        jc = memory.auto_jacobian_chunk(cfg, lat, ham, n_params,
                                        hbm_bytes=HBM)
        return memory.peak_estimate(cfg, lat, ham, n_params, hbm_bytes=HBM,
                                    chunk_size=cs, jacobian_chunk=jc)

    small = est(1024)
    big = est(16384)
    assert small["fraction"] < big["fraction"]
    assert big["peak_bytes"] >= big["persistent_bytes"]
    # M=16384 materialized minSR at P=101k: Jacobian alone is ~13 GiB
    assert memory.preflight_message(big) is not None
    assert "persistent" in memory.preflight_message(big)
    assert memory.preflight_message(small) is None


def test_peak_estimate_respects_explicit_chunks():
    """Explicit chunk sizes bound the transient term."""
    kw = dict(shape=(10, 10), kind="gcnn", channels=(10,) * 6,
              n_walkers=2048, ham="j1j2", j2=0.5, complex_params=True,
              spin_flip=1, solver="minsr")
    cfg = _cfg(**kw)
    lat = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lat)
    full = memory.peak_estimate(cfg, lat, ham, 101000, hbm_bytes=HBM)
    chunked = memory.peak_estimate(cfg, lat, ham, 101000, hbm_bytes=HBM,
                                   chunk_size=128, jacobian_chunk=128)
    assert chunked["transient_bytes"] < full["transient_bytes"]
    assert chunked["persistent_bytes"] == full["persistent_bytes"]


def test_complex_conv_window_tri6x6_tgcnn():
    """Regression for the tri6x6 D6-GCNN compile OOM (runs/
    tri6x6_tgcnn.log): complex conv stacks lower to four live real convs,
    so the window-2 footprint under-predicted 16.4G as 6.2G and auto
    returned a chunk whose conv batch blew HBM. The complex cnn/gcnn
    window is now 4 buffers per part; on the hero shapes the chunk must
    come out <= 256 (measured-safe: predicted program ~8 GB)."""
    cfg = cfglib.Config(
        name="t",
        lattice=cfglib.LatticeConfig(shape=(6, 6), geometry="triangular"),
        model=cfglib.ModelConfig(kind="gcnn", channels=(8, 8, 8, 8),
                                 kernel_size=5, complex_params=True,
                                 spin_flip_sector=1),
        hamiltonian=cfglib.HamiltonianConfig(kind="heisenberg",
                                             marshall=False),
        sampler=cfglib.SamplerConfig(n_walkers=1024),
        sr=cfglib.SRConfig(enabled=True, solver="minsr"),
        run=cfglib.RunConfig(n_devices=1),
    )
    lat = build_lattice(cfg)
    ham = build_hamiltonian(cfg, lat)
    fp = memory.model_footprint(cfg, lat.n_sites)
    assert fp.fwd_window == 4.0   # complex conv: 4 live real-conv outputs
    cs = memory.auto_chunk_size(cfg, lat, ham, n_params=30000,
                                hbm_bytes=HBM)
    assert cs is not None and 1024 % cs == 0 and cs <= 256
    # real-parameter conv models keep the round-1-calibrated window 2
    real = _cfg((10, 10), "cnn", (16, 16, 16), 2048)
    assert memory.model_footprint(real, 100).fwd_window == 2.0
