"""ctypes bindings for the native ED matvec kernels (native/ed_kernels.cpp).

Compiled on first use with g++ (-O3 -march=native -fopenmp) into
``native/build/libed_kernels.so``; falls back transparently to the scipy
sparse path in :mod:`qmcnn_tpu.ops.exact` if no compiler is available.

The matvec applies H on the fly (no matrix storage), so Lanczos ground
energies reach N ~ 24 where the sparse build would need tens of GB.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np
import scipy.sparse.linalg as spla

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "ed_kernels.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libed_kernels.so")

_lib = None
_load_error: Optional[str] = None


def _compile() -> None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # retry without OpenMP before giving up
        cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _compile()
        lib = ctypes.CDLL(_SO)
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.tfim_matvec.argtypes = [
            ctypes.c_int, i32p, ctypes.c_int, ctypes.c_double,
            ctypes.c_double, f64p, f64p,
        ]
        lib.heisenberg_matvec.argtypes = [
            ctypes.c_int, i32p, f64p, ctypes.c_int, f64p, f64p,
        ]
        lib.ed_num_threads.restype = ctypes.c_int
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        lib.fill_sector_states.argtypes = [
            ctypes.c_int, ctypes.c_int, u64p, ctypes.c_int64,
        ]
        lib.heisenberg_sector_matvec.argtypes = [
            i32p, f64p, ctypes.c_int, u64p, ctypes.c_int64, f64p, f64p,
        ]
        _lib = lib
    except Exception as e:  # no compiler / load failure -> scipy fallback
        _load_error = str(e)
    return _lib


def available() -> bool:
    return _load() is not None


def tfim_operator(n: int, bonds: np.ndarray, j: float = 1.0,
                  h: float = 1.0) -> spla.LinearOperator:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native ED unavailable: {_load_error}")
    bonds = np.ascontiguousarray(bonds, np.int32)
    dim = 1 << n

    def mv(v):
        v = np.ascontiguousarray(v.reshape(dim), np.float64)
        out = np.empty(dim, np.float64)
        lib.tfim_matvec(n, bonds, len(bonds), j, h, v, out)
        return out

    return spla.LinearOperator((dim, dim), matvec=mv, dtype=np.float64)


def heisenberg_operator(n: int, bonds: np.ndarray,
                        couplings: Optional[np.ndarray] = None,
                        j: float = 1.0) -> spla.LinearOperator:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native ED unavailable: {_load_error}")
    bonds = np.ascontiguousarray(bonds, np.int32)
    if couplings is None:
        couplings = np.full(len(bonds), j, np.float64)
    couplings = np.ascontiguousarray(couplings, np.float64)
    dim = 1 << n

    def mv(v):
        v = np.ascontiguousarray(v.reshape(dim), np.float64)
        out = np.empty(dim, np.float64)
        lib.heisenberg_matvec(n, bonds, couplings, len(bonds), v, out)
        return out

    return spla.LinearOperator((dim, dim), matvec=mv, dtype=np.float64)


def heisenberg_sector_operator(n: int, bonds: np.ndarray,
                               couplings: Optional[np.ndarray] = None,
                               j: float = 1.0,
                               n_up: Optional[int] = None
                               ) -> spla.LinearOperator:
    """Heisenberg/J1-J2 restricted to the S^z sector with ``n_up`` up
    spins (default N/2, where the AFM ground state lives).

    The sector dimension C(N, N/2) is ~2^N / sqrt(N) states smaller than
    the full Hilbert space — memory AND per-matvec work shrink by that
    factor (N=28: 40M vs 268M states), pushing single-host Lanczos to
    28-30 sites. Column indices are recovered by combinadic ranking in
    the C++ kernel; the enumerated basis array ([dim] uint64) is the only
    auxiliary storage.
    """
    from math import comb

    lib = _load()
    if lib is None:
        raise RuntimeError(f"native ED unavailable: {_load_error}")
    if n_up is None:
        if n % 2:
            raise ValueError("default n_up = N/2 needs an even N")
        n_up = n // 2
    bonds = np.ascontiguousarray(bonds, np.int32)
    if couplings is None:
        couplings = np.full(len(bonds), j, np.float64)
    couplings = np.ascontiguousarray(couplings, np.float64)
    dim = comb(n, n_up)
    states = np.empty(dim, np.uint64)
    lib.fill_sector_states(n, n_up, states, dim)

    def mv(v):
        v = np.ascontiguousarray(v.reshape(dim), np.float64)
        out = np.empty(dim, np.float64)
        lib.heisenberg_sector_matvec(bonds, couplings, len(bonds), states,
                                     dim, v, out)
        return out

    return spla.LinearOperator((dim, dim), matvec=mv, dtype=np.float64)


def ground_energy(op: spla.LinearOperator) -> float:
    return float(spla.eigsh(op, k=1, which="SA",
                            return_eigenvectors=False)[0])
