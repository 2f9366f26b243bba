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


def test_true_step_flops_trip_correction():
    """The r4 artifact fix: XLA counts scan bodies once, so the naive
    full-step lowering under-reports FLOPs by the inner-loop trip counts
    (sweep scan x n_props, E_loc chunk scan x M/chunk). true_step_flops
    composes trips explicitly — it must dominate the naive count and at
    least carry the full E_loc trip sum."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import build
    from qmcnn_tpu.ops.local_energy import local_energy
    from qmcnn_tpu.utils.mfu import true_step_flops

    m, chunk = 8, 2
    cfg = cfglib.Config(
        lattice=cfglib.LatticeConfig(shape=(6,)),
        model=cfglib.ModelConfig(channels=(4,), kernel_size=3),
        hamiltonian=cfglib.HamiltonianConfig(kind="tfim", h=1.0),
        sampler=cfglib.SamplerConfig(n_walkers=m, move="flip",
                                     n_therm_sweeps=1),
        sr=cfglib.SRConfig(enabled=True, solver="minsr"),
        run=cfglib.RunConfig(chunk_size=chunk),
    )
    vmc, params, lattice = build(cfg)
    assert vmc.chunk_size == chunk
    key = jax.random.key(0)
    state = vmc.init_state(key, m, params)
    ids = jnp.arange(m)

    total = true_step_flops(vmc, state, ids)
    assert total is not None and total > 0

    # naive lowering of the full step (scan bodies counted once)
    naive = compiled_flops(lambda st, k: vmc.step(st, k, ids),
                           state, jax.random.fold_in(key, 1))
    assert naive is not None
    assert total > naive, (total, naive)

    # the E_loc trip sum alone must be a lower bound on the composition
    s_c = state.walkers.s[:chunk]
    lp_c = jax.tree_util.tree_map(lambda x: x[:chunk],
                                  state.walkers.log_psi)
    fl_chunk = compiled_flops(
        lambda p, s, lp: local_energy(vmc.log_psi_fn, p, vmc.ham, s, lp,
                                      chunk_size=None).re,
        params, s_c, lp_c)
    assert total >= (m // chunk) * fl_chunk
