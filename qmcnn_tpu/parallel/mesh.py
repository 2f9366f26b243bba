"""Walker data-parallelism over a device mesh (SURVEY.md P1-P3).

The framework's (only) parallelism, matching the physics: MCMC walkers are
i.i.d., so they shard across chips on a 1D mesh axis ``'dp'`` while
parameters and optimizer state replicate. Estimator means and every SR-CG
matvec reduce with ``jax.lax.pmean`` over the axis — XLA lowers these to
psum-over-ICI; mesh + collectives ARE the communication backend (no
NCCL/MPI analogue needed; multi-host pods would call
``jax.distributed.initialize()`` first and build the mesh over all
processes' devices).

Design properties:
  * the per-shard step function is the SAME ``VMC.step`` code that runs
    single-device — ``axis_name`` switches the pmean hooks on;
  * per-walker PRNG streams are keyed by *global* walker id (computed from
    ``axis_index``), so an n-device run is walker-for-walker identical to a
    single-device run (tested in tests/test_distributed.py);
  * only P-sized pytrees and scalars cross chips; walkers never migrate.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qmcnn_tpu.ops.cplx import C
from qmcnn_tpu.sampler.metropolis import WalkerState
from qmcnn_tpu.vmc import StepMetrics, TrainState, VMC

AXIS = "dp"


def init_distributed(run_cfg) -> None:
    """Multi-host entry (SURVEY.md P3): ``jax.distributed.initialize()``
    before first device use. With all address fields null this
    auto-detects TPU-pod metadata; manual process groups (CPU integration
    tests, bring-your-own clusters) pass coordinator_address +
    num_processes + process_id explicitly. After this, ``jax.devices()``
    spans every process and :func:`walker_mesh` / the pmean hooks are
    global with no further changes."""
    kwargs = {}
    if run_cfg.coordinator_address is not None:
        kwargs = dict(
            coordinator_address=run_cfg.coordinator_address,
            num_processes=run_cfg.num_processes,
            process_id=run_cfg.process_id,
        )
    jax.distributed.initialize(**kwargs)


def walker_mesh(n_devices: Optional[int] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the walker axis; defaults to all visible devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} visible"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (AXIS,))


def _walker_specs() -> WalkerState:
    return WalkerState(
        s=P(AXIS), log_psi=C(P(AXIS), P(AXIS)),
        n_accept=P(AXIS), n_prop=P(AXIS),
    )


def _state_specs(state: TrainState) -> TrainState:
    rep = lambda tree: jax.tree_util.tree_map(lambda _: P(), tree)
    return TrainState(
        params=rep(state.params),
        opt_state=rep(state.opt_state),
        walkers=_walker_specs(),
        step=P(),
        sr_aux=rep(state.sr_aux),  # replicated [P] (None when no SPRING)
        ema=rep(state.ema),        # replicated params copy (None = off)
    )


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a host-built TrainState onto the mesh (walkers sharded on
    'dp', everything else replicated). Total walkers must divide the mesh.

    Multi-process (SURVEY.md P3): every process builds the same full host
    state (deterministic from the seed), and each contributes its
    addressable shards — global arrays are assembled per-shard with
    ``make_array_from_callback``, so no process ever needs to address
    another host's devices.
    """
    n_dev = mesh.shape[AXIS]
    m = state.walkers.s.shape[0]
    if m % n_dev:
        raise ValueError(f"n_walkers={m} not divisible by mesh size {n_dev}")
    specs = _state_specs(state)

    def put(x, spec):
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(put, state, specs)


@dataclasses.dataclass(frozen=True, eq=False)
class ShardedVMC:
    """VMC train step wrapped in shard_map over the walker mesh.

    Build with :func:`make_sharded_vmc`; ``step(state, key)`` and
    ``thermalize(state, key, n_sweeps)`` are jitted and run one host
    dispatch per call, with psum-over-ICI inside (SURVEY.md section 3.1).
    """

    vmc: VMC
    mesh: Mesh
    _step_fn: callable
    _make_therm_fn: callable
    _make_run_fn: callable

    def init_state(self, key, n_walkers: int, params) -> TrainState:
        state = self.vmc.init_state(key, n_walkers, params)
        return shard_train_state(state, self.mesh)

    def step(self, state: TrainState, key):
        return self._step_fn(state, key)

    def thermalize(self, state: TrainState, key, n_sweeps: int):
        return self._make_therm_fn(n_sweeps)(state, key)

    def run_steps(self, state: TrainState, base_key, n_steps: int):
        """n_steps sharded training steps in one dispatch (see
        VMC.run_steps); returns (state, metrics stacked [n_steps])."""
        return self._make_run_fn(n_steps)(state, base_key)


def make_sharded_vmc(vmc: VMC, mesh: Mesh, state_template: TrainState
                     ) -> ShardedVMC:
    """Wrap a VMC (built with axis_name=AXIS) in shard_map + jit.

    ``state_template`` supplies the pytree structure (an unsharded state from
    ``vmc.init_state`` is fine) for partition-spec construction.
    """
    if vmc.axis_name != AXIS:
        raise ValueError(
            f"VMC must be built with axis_name={AXIS!r} to run sharded; "
            f"got {vmc.axis_name!r}"
        )
    specs = _state_specs(state_template)
    metric_specs = StepMetrics(*([P()] * len(StepMetrics._fields)))

    # walker_ids are PHYSICAL walker ids: with parallel tempering the
    # walker arrays hold n_replicas rows per walker (replica-fastest), and
    # the sampler derives per-row streams from id * R + r itself
    n_rep = getattr(vmc.sampler, "n_replicas", 1)

    def local_ids(m_local: int):
        dev = jax.lax.axis_index(AXIS)
        return dev * m_local + jnp.arange(m_local)

    def step_local(state: TrainState, key):
        m_local = state.walkers.s.shape[0] // n_rep
        return vmc.step(state, key, local_ids(m_local))

    key_spec = P()  # replicated scalar PRNG key
    step_sharded = jax.jit(shard_map(
        step_local, mesh=mesh,
        in_specs=(specs, key_spec),
        out_specs=(specs, metric_specs),
        check_vma=False,
    ))

    import functools

    @functools.lru_cache(maxsize=None)
    def make_therm(n_sweeps: int):
        def therm_local(state: TrainState, key):
            m_local = state.walkers.s.shape[0] // n_rep
            return vmc.thermalize(state, key, local_ids(m_local), n_sweeps)

        return jax.jit(shard_map(
            therm_local, mesh=mesh,
            in_specs=(specs, key_spec),
            out_specs=specs,
            check_vma=False,
        ))

    @functools.lru_cache(maxsize=None)
    def make_run(n_steps: int):
        def run_local(state: TrainState, base_key):
            m_local = state.walkers.s.shape[0] // n_rep
            return vmc.run_steps(state, base_key, local_ids(m_local),
                                 n_steps)

        stacked_metric_specs = StepMetrics(
            *([P()] * len(StepMetrics._fields)))
        return jax.jit(shard_map(
            run_local, mesh=mesh,
            in_specs=(specs, key_spec),
            out_specs=(specs, stacked_metric_specs),
            check_vma=False,
        ))

    return ShardedVMC(vmc=vmc, mesh=mesh, _step_fn=step_sharded,
                      _make_therm_fn=make_therm, _make_run_fn=make_run)
