"""Portable .npz parameter snapshots (qmcnn_tpu/export.py).

The snapshot must round-trip exactly through the warm-start transfer
machinery — same leaves, same values — for both the last iterate and the
EMA subtree, and must be usable as run.init_from in a real train() call.
"""
import jax
import numpy as np
import pytest

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.export import export_params
from qmcnn_tpu.train import train
from qmcnn_tpu.utils.checkpoint import CheckpointManager
from qmcnn_tpu.utils.transfer import (_flatten, load_checkpoint_params,
                                      warm_start)

BASE = """
name: export_test
lattice: {shape: [8]}
model: {channels: [4]}
hamiltonian: {kind: tfim, h: 1.0}
sampler: {n_walkers: 32, move: flip, n_therm_sweeps: 2}
optimizer: {kind: sgd, lr: 0.05, schedule: constant, ema_decay: 0.9}
sr: {enabled: false}
run: {n_steps: 4, steps_per_dispatch: 2, log_every: 100,
      validate_against_ed: false, seed: 7}
"""


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("exp")
    mgr = CheckpointManager(str(d / "ckpt"))
    state, _ = train(cfglib.from_yaml(BASE), ckpt_manager=mgr)
    return str(d / "ckpt"), state


def test_roundtrip_exact(trained_ckpt, tmp_path):
    ckpt_dir, state = trained_ckpt
    out = str(tmp_path / "p.npz")
    flat = export_params(ckpt_dir, out)
    want = _flatten(load_checkpoint_params(ckpt_dir))
    assert set(flat) == set(want)
    loaded = load_checkpoint_params(out)
    for k, v in want.items():
        np.testing.assert_array_equal(loaded[k], np.asarray(v))


def test_ema_field_roundtrip(trained_ckpt, tmp_path):
    ckpt_dir, state = trained_ckpt
    out = str(tmp_path / "ema.npz")
    flat = export_params(ckpt_dir, out, field="ema")
    want = {k: np.asarray(v)
            for k, v in _flatten(jax.tree_util.tree_map(
                np.asarray, state.ema)).items()}
    assert set(flat) == set(want)
    for k in want:
        np.testing.assert_allclose(flat[k], want[k], rtol=1e-6)
    # the snapshot differs from the last iterate (it is the average)
    last = export_params(ckpt_dir, str(tmp_path / "last.npz"))
    assert any(not np.allclose(flat[k], last[k]) for k in flat)


def test_warm_start_from_npz(trained_ckpt, tmp_path):
    ckpt_dir, state = trained_ckpt
    out = str(tmp_path / "p.npz")
    export_params(ckpt_dir, out)
    cfg = cfglib.from_yaml(BASE)
    from qmcnn_tpu.builder import build

    _, fresh, _ = build(cfg)
    merged = warm_start(fresh, out)
    want = _flatten(load_checkpoint_params(ckpt_dir))
    got = _flatten(merged)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-6)


@pytest.mark.slow
def test_train_init_from_npz(trained_ckpt, tmp_path):
    """run.init_from pointed at the snapshot drives a real train()."""
    ckpt_dir, _ = trained_ckpt
    out = str(tmp_path / "p.npz")
    export_params(ckpt_dir, out)
    cfg = cfglib.apply_overrides(
        cfglib.from_yaml(BASE),
        [f"run.init_from={out}", "run.n_steps=2"])
    state, _ = train(cfg)
    assert int(state.step) == 2


def test_bad_out_suffix_rejected(trained_ckpt, tmp_path):
    ckpt_dir, _ = trained_ckpt
    with pytest.raises(ValueError, match="npz"):
        export_params(ckpt_dir, str(tmp_path / "p.pkl"))


def test_auto_snapshot_on_csv_runs(tmp_path):
    """train() with run.csv_path auto-writes '<csv>.params.npz' (and
    '.ema.npz' when ema_decay is on) loadable by the transfer machinery —
    the end-of-run export that makes hero warm-start chains survive VM
    death without a manual qmcnn_tpu.export step."""
    csv = str(tmp_path / "run.csv")
    cfg = cfglib.apply_overrides(cfglib.from_yaml(BASE),
                                 [f"run.csv_path={csv}"])
    state, _ = train(cfg)
    snap = _flatten(load_checkpoint_params(csv + ".params.npz"))
    want = _flatten(jax.tree_util.tree_map(np.asarray, state.params))
    assert set(snap) == set(want)
    for k in want:
        np.testing.assert_array_equal(snap[k], want[k])
    ema = _flatten(load_checkpoint_params(csv + ".ema.npz"))
    assert set(ema) == set(want)
    assert any(not np.allclose(ema[k], snap[k]) for k in snap)
