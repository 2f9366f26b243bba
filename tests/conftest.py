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
