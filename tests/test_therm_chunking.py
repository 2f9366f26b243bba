"""Chunked thermalization dispatches (run.therm_sweeps_per_dispatch).

One all-sweeps thermalization dispatch exceeds the TPU tunnel's ~80s
dispatch kill on large lattices with deep models (observed: the 16x16
depth-8 GCNN ladder leg died at its first dispatch three times,
runs/r2_pipeline24.out). train() now splits thermalization into bounded
dispatches; these tests pin the schedule math and prove the chunked path
still trains end-to-end to the same quality as the single-dispatch one.
"""
import numpy as np

from qmcnn_tpu import configs as cfglib
from qmcnn_tpu.train import therm_chunks, train


def test_therm_chunks_schedule():
    # tail remainder, exact cover, order
    assert therm_chunks(7, 3) == [(0, 3), (3, 3), (6, 1)]
    assert therm_chunks(100, 10) == [(o, 10) for o in range(0, 100, 10)]
    # degenerate layouts keep one dispatch
    assert therm_chunks(5, 0) == [(0, 5)]
    assert therm_chunks(5, -1) == [(0, 5)]
    assert therm_chunks(5, 5) == [(0, 5)]
    assert therm_chunks(5, 99) == [(0, 5)]
    assert therm_chunks(0, 3) == []
    # at most two distinct compiled sweep counts
    for total, per in ((100, 7), (13, 4), (16, 16), (9, 2)):
        sched = therm_chunks(total, per)
        assert sum(n for _, n in sched) == total
        assert len({n for _, n in sched}) <= 2


BASE = """
name: therm_chunk_test
lattice: {shape: [8]}
model: {channels: [4]}
hamiltonian: {kind: tfim, h: 1.0}
sampler: {n_walkers: 64, move: flip, n_therm_sweeps: 7}
optimizer: {kind: sgd, lr: 0.05, schedule: constant}
sr: {enabled: false}
run: {n_steps: 4, steps_per_dispatch: 2, log_every: 100,
      validate_against_ed: false, seed: 3}
"""


def test_train_runs_with_chunked_thermalization(tmp_path, capsys):
    csv = tmp_path / "m.csv"
    cfg = cfglib.apply_overrides(cfglib.from_yaml(BASE), [
        "run.therm_sweeps_per_dispatch=3",
        f"run.csv_path={csv}",
    ])
    train(cfg)
    rows = csv.read_text().strip().splitlines()
    assert len(rows) >= 2  # header + at least one metric row
    header = rows[0].split(",")
    e = [float(r.split(",")[header.index("energy_re")]) for r in rows[1:]]
    assert np.isfinite(e).all()
