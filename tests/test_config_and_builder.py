"""Config round-trip, overrides, builder wiring for all five BASELINE
configs, and a CLI smoke train (SURVEY.md R12/N10)."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.builder import build, build_sharded

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_yaml_roundtrip():
    cfg = cfglib.Config(name="x")
    text = cfglib.to_yaml(cfg)
    back = cfglib.from_yaml(text)
    assert back == cfg


def test_overrides():
    cfg = cfglib.Config()
    out = cfglib.apply_overrides(
        cfg, ["optimizer.lr=0.5", "run.n_steps=7", "sr.enabled=true",
              "model.channels=[4, 4]"]
    )
    assert out.optimizer.lr == 0.5
    assert out.run.n_steps == 7
    assert out.sr.enabled is True
    assert out.model.channels == (4, 4)
    with pytest.raises(KeyError):
        cfglib.apply_overrides(cfg, ["optimizer.nope=1"])
    with pytest.raises(ValueError):
        cfglib.apply_overrides(cfg, ["garbage"])


def test_unknown_yaml_key_rejected():
    with pytest.raises(ValueError):
        cfglib.from_yaml("model: {bogus_key: 3}")


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))
)
def test_baseline_configs_build(path):
    """Every shipped BASELINE config must load and build end-to-end."""
    cfg = cfglib.load(path)
    vmc, params, lattice = build(cfg)
    assert lattice.n_sites == int(np.prod(cfg.lattice.shape)) * lattice.basis
    # one cheap forward to prove model/params wiring
    s = jnp.ones((2, lattice.n_sites), jnp.float32)
    out = vmc.log_psi_fn(params, s)
    assert out.re.shape == (2,)
    assert np.all(np.isfinite(np.asarray(out.re)))


def test_train_smoke(tmp_path):
    """Tiny end-to-end run through the CLI train() path incl. CSV metrics."""
    from qmcnn_tpu.train import train

    cfg = cfglib.from_yaml(f"""
name: smoke
lattice: {{shape: [8]}}
model: {{channels: [4]}}
hamiltonian: {{kind: tfim, h: 1.0}}
sampler: {{n_walkers: 64, move: flip, n_therm_sweeps: 5}}
optimizer: {{kind: sgd, lr: 0.05}}
run: {{n_steps: 6, log_every: 2, csv_path: '{tmp_path}/m.csv'}}
""")
    state, logger = train(cfg)
    assert int(state.step) == 6
    assert os.path.exists(f"{tmp_path}/m.csv")
    e = logger.history["energy_re"]
    assert len(e) >= 2 and all(np.isfinite(e))
    assert "rel_err" in logger.history  # N=8 -> ED validation active


@pytest.mark.slow
def test_train_resume(tmp_path):
    """Checkpoint save/restore continues from the saved step."""
    from qmcnn_tpu.train import train
    from qmcnn_tpu.utils.checkpoint import CheckpointManager

    yaml_cfg = f"""
name: resume
lattice: {{shape: [8]}}
model: {{channels: [4]}}
hamiltonian: {{kind: tfim}}
sampler: {{n_walkers: 64, move: flip, n_therm_sweeps: 3}}
optimizer: {{kind: sgd, lr: 0.05}}
run: {{n_steps: 4, log_every: 2, ckpt_every: 2}}
"""
    cfg = cfglib.from_yaml(yaml_cfg)
    ck = CheckpointManager(str(tmp_path / "ck"), keep=2)
    state1, _ = train(cfg, ckpt_manager=ck)
    assert ck.latest_step() == 4
    # extend to 6 steps; must resume from 4, not rerun from 0
    cfg2 = cfglib.apply_overrides(cfg, ["run.n_steps=6"])
    ck2 = CheckpointManager(str(tmp_path / "ck"), keep=2)
    state2, _ = train(cfg2, ckpt_manager=ck2)
    assert int(state2.step) == 6
    ck.close()
    ck2.close()


def test_lr_schedules_build_and_run():
    from qmcnn_tpu.builder import build_lr_schedule

    for sched in ["constant", "cosine", "warmup_cosine", "linear"]:
        cfg = cfglib.apply_overrides(
            cfglib.Config(),
            [f"optimizer.schedule={sched}", "optimizer.warmup_steps=5",
             "run.n_steps=100"],
        )
        lr = build_lr_schedule(cfg)
        val = lr(50) if callable(lr) else lr
        assert float(val) > 0
        vmc, params, lattice = build(cfg)  # full optimizer builds
    with pytest.raises(ValueError):
        build(cfglib.apply_overrides(cfglib.Config(),
                                     ["optimizer.schedule=bogus"]))


def test_debug_nans_compatible():
    """A train step runs under jax_debug_nans (SURVEY section 5 sanitizers)."""
    import jax

    cfg = cfglib.from_yaml("""
name: nan_check
lattice: {shape: [6]}
model: {channels: [3]}
hamiltonian: {kind: tfim}
sampler: {n_walkers: 16, move: flip, n_therm_sweeps: 1}
""")
    vmc, params, lattice = build(cfg)
    state = vmc.init_state(jax.random.key(0), 16, params)
    jax.config.update("jax_debug_nans", True)
    try:
        state, m = jax.jit(vmc.step)(state, jax.random.key(1),
                                     jnp.arange(16))
        assert np.isfinite(float(m.energy_re))
    finally:
        jax.config.update("jax_debug_nans", False)


@pytest.mark.slow
def test_measure_cli_roundtrip(tmp_path):
    """train -> checkpoint -> measure: the full user workflow."""
    from qmcnn_tpu.measure import measure
    from qmcnn_tpu.train import train
    from qmcnn_tpu.utils.checkpoint import CheckpointManager

    cfg = cfglib.from_yaml(f"""
name: measure_smoke
lattice: {{shape: [8]}}
model: {{channels: [4]}}
hamiltonian: {{kind: heisenberg}}
sampler: {{n_walkers: 64, move: exchange, n_therm_sweeps: 3}}
optimizer: {{kind: sgd, lr: 0.05}}
run: {{n_steps: 4, log_every: 2, ckpt_every: 2}}
""")
    ck = CheckpointManager(str(tmp_path / "ck"))
    train(cfg, ckpt_manager=ck)
    report = measure(cfg, str(tmp_path / "ck"), n_samples=3,
                     sweeps_between=1, therm_sweeps=2)
    assert report["step"] == 4
    assert np.isfinite(report["energy"])
    assert abs(report["magnetization"]) < 1e-6  # S^z=0 sector exactly
    assert len(report["szsz_corr"]) == 8
    np.testing.assert_allclose(report["szsz_corr"][0], 0.25, rtol=1e-5)
    # lanczos-step path: refined energy must be a finite improvement
    # (strict for this barely-trained state, which is far from an
    # eigenstate) and alpha nonzero
    report_lz = measure(cfg, str(tmp_path / "ck"), n_samples=2,
                        sweeps_between=1, therm_sweeps=2, lanczos=True)
    assert np.isfinite(report_lz["lanczos_energy"])
    assert report_lz["lanczos_energy"] < report_lz["energy"]
    assert report_lz["lanczos_alpha"] != 0.0
    # fidelity CLI path: a state vs its own checkpoint must be ~1
    report2 = measure(cfg, str(tmp_path / "ck"), n_samples=1,
                      sweeps_between=1, therm_sweeps=2,
                      fidelity_ckpt=str(tmp_path / "ck"))
    assert 0.9 < report2["fidelity_vs_ckpt"] < 1.1
    ck.close()


@pytest.mark.slow
def test_exchange_anti_builds():
    """Regression: builder must pass bonds for move='exchange_anti'."""
    cfg = cfglib.from_yaml("""
lattice: {shape: [8]}
hamiltonian: {kind: heisenberg}
sampler: {n_walkers: 16, move: exchange_anti, n_therm_sweeps: 1}
""")
    vmc, params, lattice = build(cfg)
    assert vmc.sampler.bonds is not None
    state = vmc.init_state(jax.random.key(0), 16, params)
    state, m = jax.jit(vmc.step)(state, jax.random.key(1), jnp.arange(16))
    assert np.isfinite(float(m.energy_re))


def test_rbm_model_kind_builds_and_trains():
    cfg = cfglib.from_yaml("""
lattice: {shape: [8]}
model: {kind: rbm, rbm_alpha: 2, rbm_tie_translations: true}
hamiltonian: {kind: tfim}
sampler: {n_walkers: 32, move: flip, n_therm_sweeps: 2}
""")
    vmc, params, lattice = build(cfg)
    state = vmc.init_state(jax.random.key(0), 32, params)
    state, m = jax.jit(vmc.step)(state, jax.random.key(1), jnp.arange(32))
    assert np.isfinite(float(m.energy_re))
    with pytest.raises(ValueError):
        build(cfglib.apply_overrides(cfg, ["model.kind=bogus"]))
    with pytest.raises(ValueError):
        build(cfglib.apply_overrides(cfg, ["lattice.pbc=false"]))


@pytest.mark.slow
def test_warm_start_transfer_across_lattice_sizes(tmp_path):
    """run.init_from transfers conv params from a smaller-lattice
    checkpoint (kernels are lattice-size-agnostic); extra layers of a
    deeper target keep fresh init; wrong-family transfer raises."""
    import jax
    from qmcnn_tpu.train import train
    from qmcnn_tpu.utils.checkpoint import CheckpointManager
    from qmcnn_tpu.utils.transfer import warm_start

    src_yaml = f"""
name: warmsrc
lattice: {{shape: [4, 4]}}
model: {{kind: gcnn, channels: [3, 3], kernel_size: 3, complex_params: true}}
hamiltonian: {{kind: heisenberg, marshall: true}}
sampler: {{n_walkers: 32, move: exchange, n_therm_sweeps: 2}}
optimizer: {{kind: sgd, lr: 0.05}}
run: {{n_steps: 2, log_every: 1, ckpt_every: 2, validate_against_ed: false}}
"""
    cfg = cfglib.from_yaml(src_yaml)
    ck = CheckpointManager(str(tmp_path / "src_ck"), keep=1)
    state_src, _ = train(cfg, ckpt_manager=ck)
    ck.close()

    # same family/width on a LARGER lattice: every leaf must transfer
    cfg_big = cfglib.apply_overrides(
        cfg, ["lattice.shape=[6,6]", f"run.init_from={tmp_path}/src_ck",
              "run.n_steps=1"])
    from qmcnn_tpu.builder import build_sharded
    _, fresh, _ = build_sharded(cfg_big)
    merged = warm_start(fresh, str(tmp_path / "src_ck"))
    src_flat = jax.tree_util.tree_leaves(state_src.params)
    mrg_flat = jax.tree_util.tree_leaves(merged)
    assert len(src_flat) == len(mrg_flat)
    for a, b in zip(src_flat, mrg_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the warm-started train run goes end-to-end
    state_big, _ = train(cfg_big)
    assert int(state_big.step) == 1

    # deeper target: first layers transfer, the extra layer stays fresh
    cfg_deep = cfglib.apply_overrides(
        cfg, ["model.channels=[3,3,3]", "run.n_steps=1"])
    _, fresh_deep, _ = build_sharded(cfg_deep)
    from qmcnn_tpu.utils.transfer import transfer_params, \
        load_checkpoint_params
    src_params = load_checkpoint_params(str(tmp_path / "src_ck"))
    merged_deep, n_copied, n_fresh = transfer_params(fresh_deep, src_params)
    assert n_copied > 0 and n_fresh > 0

    # disjoint family: nothing matches -> loud error
    cfg_rbm = cfglib.apply_overrides(cfg, ["model.kind=rbm"])
    _, fresh_rbm, _ = build_sharded(cfg_rbm)
    with pytest.raises(ValueError, match="matched no parameters"):
        warm_start(fresh_rbm, str(tmp_path / "src_ck"))


@pytest.mark.slow
def test_dispatch_watchdog_warns(tmp_path, capsys):
    """run.dispatch_warn_s surfaces a wedged-dispatch warning (with 0s
    threshold every dispatch trips it); 0 disables the watchdog."""
    from qmcnn_tpu.train import train

    yaml_cfg = """
name: watchdog
lattice: {shape: [8]}
model: {channels: [3]}
hamiltonian: {kind: tfim}
sampler: {n_walkers: 32, move: flip, n_therm_sweeps: 1}
optimizer: {kind: sgd, lr: 0.05}
run: {n_steps: 2, log_every: 1, validate_against_ed: false,
      dispatch_warn_s: 1.0e-6}
"""
    cfg = cfglib.from_yaml(yaml_cfg)
    train(cfg)
    out = capsys.readouterr().out
    assert "may be wedged" in out

    cfg2 = cfglib.apply_overrides(cfg, ["run.dispatch_warn_s=0"])
    train(cfg2)
    out2 = capsys.readouterr().out
    assert "may be wedged" not in out2


def test_momentum_rejected_for_non_cnn_kinds():
    """A finite-momentum request must never be silently ignored (ADVICE
    r1): gcnn/rbm have no momentum projector and must reject it."""
    from qmcnn_tpu.builder import build_lattice, build_model

    for kind in ("gcnn", "rbm"):
        cfg = cfglib.Config(
            name="t",
            lattice=cfglib.LatticeConfig(shape=(4, 4)),
            model=cfglib.ModelConfig(kind=kind, channels=(2, 2),
                                     momentum=(1, 0)),
        )
        with pytest.raises(ValueError, match="momentum"):
            build_model(cfg, build_lattice(cfg))
    # cnn without translation averaging still rejects
    cfg = cfglib.Config(
        name="t",
        lattice=cfglib.LatticeConfig(shape=(4, 4)),
        model=cfglib.ModelConfig(kind="cnn", channels=(2, 2),
                                 momentum=(1, 0),
                                 translation_average=False),
    )
    with pytest.raises(ValueError, match="momentum"):
        build_model(cfg, build_lattice(cfg))


def _max_abs_im(cfg) -> float:
    vmc, params, lattice = build(cfg)
    s = (2.0 * jax.random.bernoulli(jax.random.key(5), 0.5,
                                    (64, lattice.n_sites)) - 1.0
         ).astype(jnp.float32)
    out = vmc.log_psi_fn(params, s)
    return float(jnp.max(jnp.abs(out.im)))


@pytest.mark.parametrize("model_kw,expect_real", [
    (dict(kind="cnn", channels=(3, 3)), True),
    (dict(kind="cnn", channels=(3, 3), complex_params=True), False),
    (dict(kind="cnn", channels=(3, 3), spin_flip_sector=1), True),
    (dict(kind="gcnn", channels=(2, 2)), True),
    (dict(kind="gcnn", channels=(2, 2), gcnn_character="B1"), False),
    (dict(kind="rbm", channels=()), True),
])
@pytest.mark.slow
def test_model_log_psi_is_real_predicate_matches_model(model_kw, expect_real):
    """The builder's real-output predicate (which gates the SR J_im skip)
    must agree with the actual model: predicate True -> im(log psi) == 0
    on random inputs; predicate must never claim real for a model with a
    live imaginary part."""
    from qmcnn_tpu.builder import model_log_psi_is_real

    cfg = cfglib.Config(
        name="t",
        lattice=cfglib.LatticeConfig(shape=(4, 4)),
        model=cfglib.ModelConfig(param_scale=0.3, **model_kw),
        hamiltonian=cfglib.HamiltonianConfig(kind="heisenberg"),
    )
    assert model_log_psi_is_real(cfg) == expect_real
    if expect_real:
        assert _max_abs_im(cfg) == 0.0


def _tiny_penalty_cfg(tmp_path, solver, deflate_c=0.0):
    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(6,)),
        model=cfglib.ModelConfig(channels=(4,), kernel_size=3),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim", h=1.0),
        sampler=cfglib.SamplerConfig(n_walkers=16, move="flip",
                                     n_therm_sweeps=1),
        sr=cfglib.SRConfig(enabled=True, solver=solver),
    )
    # export a matching frozen state to orthogonalize against
    from qmcnn_tpu.utils.transfer import _flatten

    _, params, _ = build(cfg)
    npz = os.path.join(str(tmp_path), "frozen.npz")
    np.savez(npz, **{k: np.asarray(v)
                     for k, v in _flatten(params).items()})
    opt = cfglib.dataclasses.replace(
        cfg.optimizer, orthogonalize_to=[npz], deflate_c=deflate_c)
    return cfglib.dataclasses.replace(cfg, optimizer=opt)


def test_minsr_penalty_guard_warns(tmp_path):
    """penalty + minsr is the documented silent-collapse mode (BASELINE.md
    r3): the builder must warn. With deflation (the metric-compatible
    path) it must NOT."""
    import warnings

    cfg = _tiny_penalty_cfg(tmp_path, solver="minsr")
    with pytest.warns(UserWarning, match="silent-collapse"):
        build(cfg)

    cfg_ok = _tiny_penalty_cfg(tmp_path, solver="minsr", deflate_c=2.0)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        vmc, _, _ = build(cfg_ok)
    assert vmc.deflate_c == 2.0

    cfg_dense = _tiny_penalty_cfg(tmp_path, solver="dense")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        build(cfg_dense)


def test_transfer_expand_embeds_smaller_leaves():
    """expand=True (run.init_expand): a path-matched source leaf whose
    shape is contained in the fresh leaf's is embedded at the leading
    corner; the fresh init supplies the widened channels. Off by default."""
    from qmcnn_tpu.utils.transfer import transfer_params

    src_k = np.arange(3 * 3 * 2 * 3, dtype=np.float32).reshape(3, 3, 2, 3)
    fresh = {"params": {"Conv_0": {
        "kernel": np.full((3, 3, 4, 6), 9.0, np.float32),
        "bias": np.zeros((6,), np.float32)}}}
    source = {"params": {"Conv_0": {
        "kernel": src_k, "bias": np.ones((3,), np.float32)}}}

    merged, n_copied, n_fresh = transfer_params(fresh, source, expand=True)
    k = merged["params"]["Conv_0"]["kernel"]
    np.testing.assert_array_equal(k[:, :, :2, :3], src_k)
    # fresh (widened) entries are scaled to 0.1x their init — near-function-
    # preserving but symmetry-broken (see transfer.py expand comment)
    assert np.allclose(k[:, :, 2:, :], 0.9) and np.allclose(k[:, :, :, 3:], 0.9)
    b = merged["params"]["Conv_0"]["bias"]
    np.testing.assert_allclose(b, [1, 1, 1, 0, 0, 0], atol=1e-7)
    assert n_copied == 2 and n_fresh == 0

    # default (expand=False): mismatched shapes stay fresh
    merged0, n_copied0, n_fresh0 = transfer_params(fresh, source)
    assert n_copied0 == 0 and n_fresh0 == 2
    np.testing.assert_array_equal(
        merged0["params"]["Conv_0"]["kernel"], fresh["params"]["Conv_0"]["kernel"])
