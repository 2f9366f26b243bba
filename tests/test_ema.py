"""optimizer.ema_decay: Polyak/EMA parameter averaging.

The EMA state is a pure observer of the optimization trajectory — it must
never change the trained parameters (non-interference), must follow the
exact recurrence ema <- d*ema + (1-d)*params, and must survive the
checkpoint/resume and measure paths (SURVEY.md section 5 checkpoint/resume;
the averaging trick itself is the standard variational tail-average for
killing O(1/sqrt(M)) MC parameter noise).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.builder import build_sharded
from qmcnn_tpu.train import train
from qmcnn_tpu.utils.checkpoint import CheckpointManager
from qmcnn_tpu.utils.transfer import load_checkpoint_params

BASE = """
name: ema_test
lattice: {shape: [8]}
model: {channels: [4]}
hamiltonian: {kind: tfim, h: 1.0}
sampler: {n_walkers: 32, move: flip, n_therm_sweeps: 2}
optimizer: {kind: sgd, lr: 0.05, schedule: constant}
sr: {enabled: false}
run: {n_steps: 6, steps_per_dispatch: 2, log_every: 100,
      validate_against_ed: false, seed: 5}
"""


def _cfg(*overrides):
    return cfglib.apply_overrides(cfglib.from_yaml(BASE), list(overrides))


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.slow
def test_ema_recurrence_and_noninterference():
    d = 0.75
    key = jax.random.key(0)

    def run(cfg, n=4):
        sharded, params, _ = build_sharded(cfg)
        state = sharded.init_state(jax.random.fold_in(key, 0), 32, params)
        traj = []
        for t in range(n):
            state, _ = sharded.step(state, jax.random.fold_in(key, 100 + t))
            traj.append(_leaves(state.params))
        return state, traj

    state_off, traj_off = run(_cfg())
    state_on, traj_on = run(_cfg(f"optimizer.ema_decay={d}"))
    assert state_off.ema is None

    # non-interference: identical parameter trajectories step for step
    for a, b in zip(traj_off, traj_on):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    # recurrence: manual accumulation from the trajectory, seeded at init
    sharded, params, _ = build_sharded(_cfg(f"optimizer.ema_decay={d}"))
    manual = _leaves(params)
    for step_leaves in traj_on:
        manual = [d * e + (1 - d) * p for e, p in zip(manual, step_leaves)]
    for e, m in zip(_leaves(state_on.ema), manual):
        np.testing.assert_allclose(e, m, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_ema_checkpoint_roundtrip_and_resume(tmp_path):
    cfg = _cfg("optimizer.ema_decay=0.9")
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state, _ = train(cfg, ckpt_manager=mgr)
    assert mgr.latest_step() == 6

    # the ema subtree is readable standalone and lags the last iterate
    ema = load_checkpoint_params(str(tmp_path / "ckpt"), field="ema")
    par = load_checkpoint_params(str(tmp_path / "ckpt"), field="params")
    e, p = _leaves(ema), _leaves(par)
    assert any(not np.allclose(a, b) for a, b in zip(e, p))
    for a, b in zip(e, _leaves(state.ema)):
        np.testing.assert_array_equal(a, b)

    # resume continues the EMA carry (no crash, monotone step count)
    cfg12 = cfglib.apply_overrides(cfg, ["run.n_steps=12"])
    state2, _ = train(cfg12, ckpt_manager=mgr)
    assert int(state2.step) == 12
    assert state2.ema is not None


@pytest.mark.slow
def test_ema_field_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    train(_cfg(), ckpt_manager=mgr)  # ema off
    with pytest.raises(ValueError, match="ema"):
        load_checkpoint_params(str(tmp_path / "ckpt"), field="ema")


@pytest.mark.slow
def test_measure_ema_evaluates_the_average(tmp_path, capsys):
    from qmcnn_tpu.measure import measure

    cfg = _cfg("optimizer.ema_decay=0.8")
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    train(cfg, ckpt_manager=mgr)
    report = measure(cfg, str(tmp_path / "ckpt"), n_samples=2,
                     sweeps_between=1, therm_sweeps=2, use_ema=True)
    out = capsys.readouterr().out
    assert "measuring the EMA" in out
    assert np.isfinite(report["energy"])


def test_measure_ema_without_state_raises(tmp_path):
    from qmcnn_tpu.measure import measure

    cfg = _cfg()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    train(cfg, ckpt_manager=mgr)
    with pytest.raises(ValueError, match="ema_decay"):
        measure(cfg, str(tmp_path / "ckpt"), n_samples=1,
                sweeps_between=1, therm_sweeps=2, use_ema=True)
