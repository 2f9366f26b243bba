"""Backend-selection hardening for this environment's axon TPU plugin.

The axon sitecustomize registers the tunneled TPU backend at interpreter
start and (re)exports ``JAX_PLATFORMS=axon``, so a user running a CLI with
``JAX_PLATFORMS=cpu`` in the shell does NOT get a CPU run — worse, when the
TPU worker is crashed/wedged, backend initialization BLOCKS indefinitely
inside the first ``jax.devices()`` (observed 2026-08-17 during the r2
HBM-crash forensics; even ``python -c "import jax; jax.devices()"`` hung).
The in-process escape hatch that always works is
``jax.config.update('jax_platforms', ...)`` before first device use —
exactly what tests/conftest.py does for the hermetic suite.

Every CLI entry point calls :func:`honor_platform_request` first, so
``JAX_PLATFORMS=cpu python -m qmcnn_tpu.train ...`` behaves as asked — CPU
smoke runs stay possible while the chip is down.
"""
from __future__ import annotations

import os


def honor_platform_request(env: str = "JAX_PLATFORMS") -> None:
    """Pin jax's platform list to the ``JAX_PLATFORMS`` env request.

    No-op when the variable is unset/empty or names the axon TPU plugin
    (the default flow). Must run before any jax device use; safe to call
    multiple times.
    """
    req = os.environ.get(env, "").strip().lower()
    if not req or req == "axon":
        return
    import jax

    jax.config.update("jax_platforms", req)
