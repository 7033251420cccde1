"""ctypes bridge to the native C++ runtime (build-on-first-use).

The Julia reference's only native components are the OSQP and NLopt C
libraries (SURVEY.md §2). The TPU compute path replaces them with on-device
kernels; this module supplies the *host-runtime* native equivalent — a dense
ADMM+polish QP engine (``native/qp_admm.cpp``) — used as a verification
oracle for the on-device solver and as the subproblem engine outside jit.

The shared library is compiled once with g++ -O3 into ``native/build/`` and
loaded with ctypes (no pybind11 dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "qp_admm.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libmorbit_native.so")

_lib = None


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.qp_solve.restype = ctypes.c_int
    lib.qp_solve.argtypes = [ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp,
                             ctypes.c_int, ctypes.c_double, ctypes.c_double,
                             ctypes.c_double, ctypes.c_int, dp, dp, dp]
    lib.qp_solve_batch.restype = ctypes.c_int
    lib.qp_solve_batch.argtypes = [ctypes.c_int] + lib.qp_solve.argtypes
    _lib = lib
    return lib


def _as_c(arr):
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.float64))
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def qp_solve(P, q, A, l, u, iters: int = 400, rho: float = 0.1,
             sigma: float = 1e-6, alpha: float = 1.6, polish: bool = True):
    """Solve one dense QP natively; mirrors :func:`morbit_tpu.ops.qp.solve_qp`.

    Returns (z, y, obj, prim_res, dual_res, status_ok)."""
    lib = load()
    P, Pp = _as_c(P)
    q, qp_ = _as_c(q)
    A, Ap = _as_c(A)
    l, lp = _as_c(l)
    u, up = _as_c(u)
    n = q.shape[0]
    m = l.shape[0]
    z = np.zeros(n)
    y = np.zeros(m)
    info = np.zeros(3)
    _, zp = _as_c(z)
    z = z  # keep refs
    zp = z.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    yp = y.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    ip = info.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.qp_solve(n, m, Pp, qp_, Ap, lp, up, int(iters), rho, sigma,
                      alpha, int(polish), zp, yp, ip)
    return z, y, info[0], info[1], info[2], rc == 0


def qp_solve_batch(P, q, A, l, u, iters: int = 400, rho: float = 0.1,
                   sigma: float = 1e-6, alpha: float = 1.6,
                   polish: bool = True):
    """Batched native solve over leading axis B."""
    lib = load()
    P, Pp = _as_c(P)
    q, qp_ = _as_c(q)
    A, Ap = _as_c(A)
    l, lp = _as_c(l)
    u, up = _as_c(u)
    B, n = q.shape
    m = l.shape[1]
    z = np.zeros((B, n))
    y = np.zeros((B, m))
    info = np.zeros((B, 3))
    zp = z.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    yp = y.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    ip = info.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.qp_solve_batch(B, n, m, Pp, qp_, Ap, lp, up, int(iters), rho, sigma,
                       alpha, int(polish), zp, yp, ip)
    return z, y, info
