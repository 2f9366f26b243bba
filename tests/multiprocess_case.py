"""The shared workload of the multi-process integration test: identical
code runs (a) inside each of 2 processes over the global 4-device mesh and
(b) single-process over a local 4-device mesh — the energies must match
(same global walker ids, same per-walker streams, same pmean semantics).
"""
import jax
import jax.numpy as jnp


def make_config(cfglib, run):
    return cfglib.Config(
        name="mp_case",
        lattice=cfglib.LatticeConfig(shape=(4, 4)),
        model=cfglib.ModelConfig(kind="cnn", channels=(3, 3),
                                 param_scale=0.1),
        hamiltonian=cfglib.HamiltonianConfig(kind="heisenberg"),
        sampler=cfglib.SamplerConfig(n_walkers=16, move="exchange",
                                     n_sweeps_per_step=1, n_therm_sweeps=4),
        sr=cfglib.SRConfig(enabled=True, solver="pcg", cg_maxiter=30),
        run=run,
    )


def run_case(run) -> list:
    from qmcnn_tpu import configs as cfglib
    from qmcnn_tpu.builder import build_sharded

    cfg = make_config(cfglib, run)
    sharded, params, _ = build_sharded(cfg)
    key = jax.random.key(7)
    state = sharded.init_state(jax.random.fold_in(key, 0),
                               cfg.sampler.n_walkers, params)
    state = sharded.thermalize(state, jax.random.fold_in(key, 1), n_sweeps=4)
    energies = []
    for i in range(2):
        state, metrics = sharded.step(state, jax.random.fold_in(key, 10 + i))
        energies.append(float(metrics.energy_re))
    return energies
