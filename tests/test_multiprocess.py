"""Multi-host wiring integration test (SURVEY.md P3; VERDICT r1 item 6).

Spawns two real OS processes, each with 2 virtual CPU devices, joined via
``jax.distributed.initialize`` (Gloo collectives). The sharded VMC then
runs over the GLOBAL 4-device mesh. Asserts:
  * both processes report identical (pmean-replicated) energies;
  * those energies equal a single-process 4-device run of the same case —
    the walker-for-walker equivalence guarantee extended across hosts.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from qmcnn_tpu import configs as cfglib
from tests.multiprocess_case import run_case

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_run_matches_single_process():
    port = _free_port()
    # launch concurrently (they must rendezvous)
    popen = [
        subprocess.Popen([sys.executable, WORKER, str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in popen:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT pid="):
                parts = line.split()
                pid = int(parts[1].split("=")[1])
                results[pid] = [float(x) for x in parts[2:]]
    assert set(results) == {0, 1}, outs
    np.testing.assert_array_equal(results[0], results[1])

    # single-process oracle on 4 of this process's virtual devices
    assert jax.device_count() >= 4
    single = run_case(cfglib.RunConfig(n_steps=2, n_devices=4))
    np.testing.assert_allclose(results[0], single, rtol=1e-6, atol=1e-7)
    assert all(np.isfinite(single))
