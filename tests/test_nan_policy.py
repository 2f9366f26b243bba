"""run.nan_policy: divergence handling in the train loop.

A diverged optimizer NaNs every subsequent step (observed in production:
the r1 depth-8 residual run burned 2350 steps after a step-650 NaN), so
the loop must either stop or roll back — never silently continue unless
asked to ('ignore', the pre-round-2 behavior).
"""
import jax
import numpy as np
import pytest

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.train import train
from qmcnn_tpu.utils.checkpoint import CheckpointManager


def _cfg(**run_over):
    over = [f"run.{k}={v}" for k, v in run_over.items()]
    return cfglib.apply_overrides(cfglib.from_yaml("""
name: nan_policy_test
lattice: {shape: [8]}
model: {channels: [4], param_scale: 0.3}
hamiltonian: {kind: tfim, h: 1.0}
sampler: {n_walkers: 32, move: flip, n_therm_sweeps: 2}
optimizer: {kind: sgd, lr: 1.0e+30, schedule: constant, clip_norm: 0.0}
sr: {enabled: false}
run: {n_steps: 30, steps_per_dispatch: 5, log_every: 100,
      validate_against_ed: false, seed: 3}
"""), over)


def test_nan_halt_raises():
    cfg = _cfg(nan_policy="halt")
    with pytest.raises(RuntimeError, match="non-finite energy"):
        train(cfg)


def test_nan_rollback_without_checkpoint_raises():
    cfg = _cfg()  # default policy is rollback; no ckpt_manager passed
    with pytest.raises(RuntimeError, match="no checkpoint"):
        train(cfg)


def test_nan_ignore_trains_through(capsys):
    cfg = _cfg(nan_policy="ignore")
    state, logger = train(cfg)  # must complete despite NaN
    assert int(state.step) == 30


def test_nan_rollback_restores_and_exhausts(tmp_path, capsys):
    # phase 1: build a sane checkpoint at step 10
    sane = cfglib.apply_overrides(
        _cfg(), ["optimizer.lr=0.01", "run.n_steps=10"])
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    train(sane, ckpt_manager=mgr)
    assert mgr.latest_step() == 10
    # phase 2: resume with a diverging lr — every retry rolls back to 10
    # with a re-folded key, then retries exhaust
    bad = cfglib.apply_overrides(_cfg(), ["run.nan_max_retries=2"])
    with pytest.raises(RuntimeError, match="retries exhausted"):
        train(bad, ckpt_manager=mgr)
    out = capsys.readouterr().out
    assert out.count("rolled back to checkpoint step 10") == 2
    # the checkpoint itself must still hold the finite step-10 state
    assert mgr.latest_step() == 10


def test_unknown_nan_policy_rejected():
    cfg = _cfg(nan_policy="explode")
    with pytest.raises(ValueError, match="nan_policy"):
        train(cfg)
