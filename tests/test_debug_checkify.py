"""Sanitizer tests (SURVEY.md section 5, 'Race detection / sanitizers'):
``utils.debug.checked`` must surface OOB indexing and non-finite floats that
XLA would otherwise clamp silently, and must compose with the full sharded
train step (run.checkify=true path)."""
import jax
import jax.numpy as jnp
import pytest

from qmcnn_tpu.utils.debug import checked


def test_checked_catches_oob_index():
    def f(x, i):
        return x[i]  # jit clamps OOB silently; checked must raise

    g = checked(jax.jit(f))
    assert float(g(jnp.arange(4.0), 2)) == 2.0
    with pytest.raises(Exception, match="out-of-bounds|index"):
        g(jnp.arange(4.0), 17)


def test_checked_catches_nan():
    def f(x):
        return jnp.log(x).sum()

    g = checked(jax.jit(f))
    with pytest.raises(Exception, match="nan|inf"):
        g(jnp.array([1.0, -1.0]))


@pytest.mark.slow
def test_train_cli_checkify_path():
    """train() end-to-end with run.checkify=true on a tiny config: the
    instrumented sharded step must run clean (no false positives from the
    masked connected-state enumeration) and produce finite energies."""
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.train import train

    cfg = cfglib.Config(
        name="checkify_smoke",
        lattice=cfglib.LatticeConfig(shape=(4, 4)),
        model=cfglib.ModelConfig(channels=(4,), kernel_size=3),
        hamiltonian=cfglib.HamiltonianConfig(kind="heisenberg"),
        sampler=cfglib.SamplerConfig(n_walkers=32, move="exchange",
                                     n_sweeps_per_step=1, n_therm_sweeps=2),
        sr=cfglib.SRConfig(enabled=False),
        run=cfglib.RunConfig(n_steps=2, steps_per_dispatch=2, log_every=1,
                             validate_against_ed=False, checkify=True,
                             n_devices=1),
    )
    state, logger = train(cfg)
    assert int(state.step) == 2
