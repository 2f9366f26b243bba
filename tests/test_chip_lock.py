"""Chip-lock mutual exclusion (utils/chip_lock.py).

Two production incidents motivated the lock (pipeline-16/18 overlapping
measure+train wedge; pipeline-17/18 double-launched hero leg): the axon
backend multiplexes concurrent clients instead of refusing the second one,
so overlap must be prevented host-side.
"""
import os

import pytest

from qmcnn_tpu.utils import chip_lock


@pytest.fixture
def lockpath(tmp_path, monkeypatch):
    path = str(tmp_path / "chip.lock")
    monkeypatch.setenv(chip_lock.ENV_PATH, path)
    monkeypatch.delenv(chip_lock.ENV_HELD, raising=False)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    return path


def test_acquire_and_release(lockpath):
    logs = []
    f = chip_lock.acquire_chip_lock(wait_s=1.0, log=lambda *a, **k: logs.append(a))
    assert f is not None
    assert f"pid={os.getpid()}" in open(lockpath).read()
    # a second attempt in the same process is re-entrant: the holder is
    # ourselves (an "ancestor"), so acquire no-ops instead of waiting
    f2 = chip_lock.acquire_chip_lock(wait_s=0.0, poll_s=0.05,
                                     log=lambda *a, **k: logs.append(a))
    assert f2 is None
    assert any("ancestor" in str(a) for a in logs)
    f.close()  # release
    f3 = chip_lock.acquire_chip_lock(wait_s=1.0, log=print)
    assert f3 is not None
    f3.close()


def test_cpu_forced_runs_skip_the_lock(lockpath, monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert chip_lock.acquire_chip_lock(wait_s=1.0) is None
    assert not os.path.exists(lockpath) or open(lockpath).read() == ""


def test_supervised_child_skips_the_lock(lockpath, monkeypatch):
    monkeypatch.setenv(chip_lock.ENV_HELD, "1")
    assert chip_lock.acquire_chip_lock(wait_s=1.0) is None


def test_mark_held_env():
    env = chip_lock.mark_held_env({"A": "b"})
    assert env[chip_lock.ENV_HELD] == "1" and env["A"] == "b"


def test_contention_resolves_when_holder_dies(lockpath):
    """A SIGKILLed holder releases the flock with no stale-lock cleanup."""
    import signal
    import subprocess
    import sys
    import time

    child = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, time; sys.path.insert(0, '.'); "
         "from qmcnn_tpu.utils.chip_lock import acquire_chip_lock; "
         "f = acquire_chip_lock(wait_s=1.0); print('held', flush=True); "
         "time.sleep(60)"],
        stdout=subprocess.PIPE, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, chip_lock.ENV_PATH: lockpath,
             "JAX_PLATFORMS": ""})
    assert child.stdout.readline().strip() == "held"
    logs = []
    got = chip_lock.acquire_chip_lock(wait_s=0.0, poll_s=0.05,
                                      log=lambda *a, **k: logs.append(a))
    assert any("WITHOUT the lock" in str(a) for a in logs)
    got.close()
    child.send_signal(signal.SIGKILL)
    child.wait()
    time.sleep(0.1)
    f = chip_lock.acquire_chip_lock(wait_s=2.0, log=print)
    assert f is not None
    f.close()


def test_ancestor_holder_is_treated_as_reserved(lockpath):
    """A CLI wrapped in a bare `flock <file> cmd` must not deadlock on its
    own wrapper: when the flock holder is an ancestor process, acquire
    treats the chip as already reserved (returns None, like ENV_HELD)."""
    import subprocess
    import sys

    f = chip_lock.acquire_chip_lock(wait_s=1.0)  # we (the ancestor) hold it
    assert f is not None
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "from qmcnn_tpu.utils.chip_lock import acquire_chip_lock; "
             "r = acquire_chip_lock(wait_s=5.0, poll_s=0.05); "
             "print('reserved' if r is None else 'locked')"],
            capture_output=True, text=True, timeout=30,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env={**os.environ, chip_lock.ENV_PATH: lockpath,
                 "JAX_PLATFORMS": ""})
        assert out.stdout.strip().splitlines()[-1] == "reserved", out.stdout
        assert "ancestor" in out.stdout
    finally:
        f.close()
