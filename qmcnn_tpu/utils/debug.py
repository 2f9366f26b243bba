"""Functional sanitizers (SURVEY.md section 5, 'Race detection /
sanitizers').

The reference is single-threaded Python with nothing to sanitize; the
TPU-native analogue is guarding the *pure-function* failure modes that XLA
silently clamps at runtime: out-of-bounds indices from masked connected-state
enumeration (hamiltonians build s' with static-K index tables), NaN/Inf from
log-amplitude ratios, and division blowups in estimators. ``checked`` wraps
any jittable function with ``jax.experimental.checkify`` so those become
reported errors instead of silent clamps — used in tests and available to
users debugging a new Hamiltonian or ansatz.

Not on the hot path by design: checkify instruments every indexing op, so
wrap-and-run only when debugging (the train CLI exposes it via
``run.checkify=true``).
"""
from __future__ import annotations

import functools
from typing import Callable

from jax.experimental import checkify

#: index OOB + NaN/Inf + explicit checkify.check calls.
DEFAULT_CHECKS = checkify.index_checks | checkify.float_checks | \
    checkify.user_checks


def checked(fn: Callable, errors=DEFAULT_CHECKS) -> Callable:
    """Wrap ``fn`` so it raises on OOB indexing / non-finite floats.

    The wrapper is still jittable; the error is checked on the host after
    the dispatch (``err.throw()``), which costs one extra device->host
    scalar per call — acceptable for debugging, not for production sweeps.
    """
    cfn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper
