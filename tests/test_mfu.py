"""MFU utility (utils/mfu.py; VERDICT r2 item 4).

Oracles: XLA cost-analysis FLOPs of a known matmul (2 m n k), the
peak-table lookup contract (None on CPU -> mfu None, fmt 'n/a'), and
the arithmetic of the fraction at a pinned fake peak.
"""
import jax
import jax.numpy as jnp

from qmcnn_tpu.utils import mfu as mfu_mod
from qmcnn_tpu.utils.mfu import compiled_flops, device_peak_flops, fmt_mfu, mfu


def test_compiled_flops_counts_matmul():
    a = jnp.ones((64, 32))
    b = jnp.ones((32, 16))
    fl = compiled_flops(lambda x, y: x @ y, a, b)
    assert fl == 2.0 * 64 * 32 * 16


def test_peak_and_mfu_contract_on_cpu():
    assert device_peak_flops("float32") is None  # CPU backend in tests
    assert mfu(1e9, 1e-3, "float32") is None
    assert fmt_mfu(None) == "n/a"
    assert fmt_mfu(0.625) == "62.5%"


def test_mfu_fraction_at_pinned_peak(monkeypatch):
    monkeypatch.setitem(mfu_mod._PEAKS, "cpu",
                        {"float32": 1e12, "bfloat16": 2e12})
    kind = jax.devices()[0].device_kind.lower()
    # the monkeypatched key must actually match the test device
    assert "cpu" in kind
    assert abs(mfu(5e8, 1e-3, "float32") - 0.5) < 1e-12
    assert abs(mfu(5e8, 1e-3, "bfloat16") - 0.25) < 1e-12


def test_compiled_flops_accepts_prejitted():
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    fl = compiled_flops(f, jnp.ones((8,)))
    assert fl and fl > 0
