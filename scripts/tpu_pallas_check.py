"""Compile + parity-check + time the fused Pallas sweep on real TPU.

  python scripts/tpu_pallas_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply  # noqa: E402
from qmcnn_tpu.sampler.metropolis import MetropolisSampler  # noqa: E402
from qmcnn_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    print(jax.devices(), flush=True)
    shape = (10, 10)
    n = 100
    m = 1024
    model = LogPsiCNN(lattice_shape=shape, channels=(16, 16, 16),
                      param_scale=0.05, conv_impl="circulant")
    v = model.init(jax.random.key(7), jnp.ones((1, n), jnp.float32))

    def log_psi_fn(p, s):
        return log_psi_apply(model, p, s)

    common = dict(n_sites=n, move="flip", lattice_shape=shape,
                  pallas_block=256)
    xla = MetropolisSampler(log_psi_fn, backend="xla", **common)
    pls = MetropolisSampler(log_psi_fn, backend="pallas", **common)
    state = xla.init_state(v, jax.random.key(1), m)
    ids = jnp.arange(m)
    key = jax.random.key(4)

    t0 = time.time()
    out_p = pls.sample(v, state, key, ids, n_sweeps=1)
    jax.block_until_ready(out_p.s)
    print(f"pallas sweep compiled+ran in {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    out_x = xla.sample(v, state, key, ids, n_sweeps=1)
    jax.block_until_ready(out_x.s)
    print(f"xla sweep compiled+ran in {time.time() - t0:.1f}s", flush=True)

    same = np.array_equal(np.asarray(out_p.s), np.asarray(out_x.s))
    acc_same = np.array_equal(np.asarray(out_p.n_accept),
                              np.asarray(out_x.n_accept))
    print(f"parity on real TPU: configs equal={same} accepts equal={acc_same}",
          flush=True)
    if not same:
        diff = (np.asarray(out_p.s) != np.asarray(out_x.s)).any(axis=1).sum()
        print(f"  differing walkers: {diff}/{m} (fp-boundary decisions)",
              flush=True)

    # steady-state rate comparison: K sweeps in one dispatch each
    def timed(sampler, n_sweeps, reps=3):
        f = jax.jit(lambda st: sampler.sample(v, st, key, ids,
                                              n_sweeps=n_sweeps))
        jax.block_until_ready(f(state).s)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(f(state).s)
        return (time.perf_counter() - t0) / reps

    for name, sampler in [("xla", xla), ("pallas", pls)]:
        t1, t9 = timed(sampler, 1), timed(sampler, 9)
        per_sweep = max((t9 - t1) / 8, 1e-9)
        print(f"{name:7s}: {per_sweep * 1e3:7.2f} ms/sweep -> "
              f"{m / per_sweep:9.0f} walker-sweeps/s", flush=True)


if __name__ == "__main__":
    main()
