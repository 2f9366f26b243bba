"""Worker for the 2-process CPU integration test (SURVEY.md P3).

Run as:  python tests/multiprocess_worker.py <process_id> <port>

Each process gets 2 virtual CPU devices (4 global), joins the process
group via qmcnn_tpu's config-driven init_distributed, builds the sharded
VMC over the GLOBAL mesh, runs thermalization + 2 training steps, and
prints the (pmean-replicated) energies — the parent asserts they agree
across processes AND match a single-process 4-device run bit-for-bit.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.parallel.mesh import init_distributed

    run = cfglib.RunConfig(n_steps=2, n_devices=4, distributed=True,
                           coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    init_distributed(run)
    assert jax.process_count() == 2
    assert jax.device_count() == 4

    from tests.multiprocess_case import run_case

    energies = run_case(run)
    print(f"RESULT pid={pid} " + " ".join(f"{e:.9e}" for e in energies),
          flush=True)


if __name__ == "__main__":
    main()
