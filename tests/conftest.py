"""Test configuration: run everything on a virtual 8-device CPU backend.

Must set the env/config BEFORE jax initializes its backends. The machine
profile exports JAX_PLATFORMS=axon (the TPU plugin); tests override it so CI
is hermetic and the distributed tests get 8 fake devices (SURVEY.md section 4,
"Distributed" tier). Perf benchmarks run separately on the real chip via
bench.py.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_debug_nans", False)  # enabled per-test where useful

# Persistent compilation cache for the suite: the host has ONE core
# (measured r4 — nproc=1), so the fast tier's 15-16 min is dominated by
# XLA compiles, not by the oracles themselves (flattest --durations
# profile: top test 18 s, top-40 all 7-18 s). Warm-cache reruns skip the
# compiles — that is the pre-commit-cheap tier. The cache key includes
# the HLO, so code changes re-compile exactly what they touch.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("QMCNN_TEST_COMPILE_CACHE",
                   os.path.expanduser("~/.qmcnn_test_jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs[:8]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
