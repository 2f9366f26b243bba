"""Tracing / profiling helpers (SURVEY.md section 5, 'Tracing/profiling').

The reference had timing prints; the TPU-native equivalents:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    Perfetto/XProf trace of device execution (open in xprof / tensorboard).
  * ``annotate(name)`` — ``jax.named_scope`` for labeling sampler / local-
    energy / CG regions inside jitted code so they are identifiable in the
    trace timeline.
  * ``timed(fn)`` — wall-clock timing with ``block_until_ready``; on the
    tunneled axon backend prefer :func:`scan_rate` (the per-dispatch
    overhead is ~30 ms and host transfers are slow, so naive timing lies).
  * ``scan_rate`` — throughput via scan-length differencing: run a body N1
    and N2 times inside single dispatches and difference the wall-clocks,
    cancelling fixed dispatch cost. This is how bench.py measures.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Callable

import jax

annotate = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/prof'): run()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, reps: int = 10, warmup: int = 1):
    """(mean seconds, last result) with block_until_ready."""
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        result = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, result


def scan_rate(make_scan: Callable[[int], Callable], n_short: int,
              n_long: int, reps: int = 3) -> float:
    """Iterations/sec of a scanned body, fixed dispatch cost cancelled.

    ``make_scan(n)`` must return a zero-arg jitted callable executing the
    body n times on device and returning something cheap to synchronize on.
    """

    def timeit(f):
        jax.block_until_ready(f())  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(f())
        return (time.perf_counter() - t0) / reps

    t_short = timeit(make_scan(n_short))
    t_long = timeit(make_scan(n_long))
    dt = max((t_long - t_short) / (n_long - n_short), 1e-12)
    return 1.0 / dt

def enable_compilation_cache():
    """Persistent XLA compilation cache: compiles on this tunneled backend
    cost minutes, so cache executables across processes/runs."""
    import jax

    cache_dir = os.environ.get("QMCNN_COMPILE_CACHE",
                               os.path.expanduser("~/.qmcnn_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
