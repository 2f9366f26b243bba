"""Measure marginal per-forward cost of the conv implementations on TPU.

Run:  python scripts/tpu_conv_bench.py
Uses scan-length differencing (fixed ~30ms dispatch cost cancelled).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from qmcnn_tpu.models.cnn import LogPsiCNN, log_psi_apply  # noqa: E402
from qmcnn_tpu.utils.profiling import scan_rate  # noqa: E402


def bench(shape, channels, impl, batch=1024, complex_params=False,
          n_short=1, n_long=41):
    n = int(np.prod(shape))
    model = LogPsiCNN(lattice_shape=shape, channels=channels,
                      complex_params=complex_params, conv_impl=impl)
    s = (2.0 * jax.random.bernoulli(jax.random.key(0), 0.5, (batch, n))
         - 1.0).astype(jnp.float32)
    v = model.init(jax.random.key(1), s)

    def make_scan(k):
        @jax.jit
        def g():
            def body(h, _):
                out = log_psi_apply(model, v, h)
                return h * jnp.sign(out.re[:1]), jnp.sum(out.re)

            _, outs = jax.lax.scan(body, s, None, length=k)
            return jnp.sum(outs)

        return g

    t0 = time.perf_counter()
    rate = scan_rate(make_scan, n_short, n_long, reps=3)
    wall = time.perf_counter() - t0
    print(f"{impl:10s} {shape} ch={channels} complex={complex_params} "
          f"batch={batch}: {1e6 / rate:8.1f} us/fwd "
          f"({rate:.0f} fwd/s)  [measured in {wall:.0f}s]", flush=True)
    return rate


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    shape, ch = (10, 10), (16, 16, 16)
    for impl in ["circulant", "roll"]:
        bench(shape, ch, impl)
    for impl in ["circulant", "roll"]:
        bench(shape, ch, impl, complex_params=True)
    # direct conv last (slow compile; small scan)
    bench(shape, ch, "direct", n_long=11)
