"""Benchmark problem generators: ZDT suite, DTLZ, two-parabolas, Halton starts.

The reference benchmark grid (``examples/large_scale_benchmarks.jl:69-118``)
uses ZDT1-3, DTLZ1, DTLZ6 from ``MultiObjectiveProblems.jl`` with
Halton-sequence starting points; we provide the standard definitions as pure
JAX functions plus MOP builders.

ZDT5 is intentionally excluded: it is binary-coded (30+5(m-1) bit strings,
Deb et al. 2000 §5.5), so it has no continuous box domain for a trust-region
solver — the reference's benchmark grid omits it for the same reason.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import ExactConfig, RbfConfig


# --------------------------------------------------------------------- ZDT
def zdt_bounds(name: str, n: int):
    if name == "zdt4":
        lb = np.concatenate([[0.0], -5.0 * np.ones(n - 1)])
        ub = np.concatenate([[1.0], 5.0 * np.ones(n - 1)])
        return lb, ub
    return np.zeros(n), np.ones(n)


def zdt_objectives(name: str, n: int):
    """Return (f1, f2) as pure functions of x (n,) -> scalar."""

    def g_sum(x):
        return 1.0 + 9.0 / (n - 1) * jnp.sum(x[1:])

    if name == "zdt1":
        f1 = lambda x: x[0]
        f2 = lambda x: g_sum(x) * (1.0 - jnp.sqrt(jnp.maximum(x[0] / g_sum(x), 0.0)))
    elif name == "zdt2":
        f1 = lambda x: x[0]
        f2 = lambda x: g_sum(x) * (1.0 - (x[0] / g_sum(x)) ** 2)
    elif name == "zdt3":
        f1 = lambda x: x[0]

        def f2(x):
            g = g_sum(x)
            r = x[0] / g
            return g * (1.0 - jnp.sqrt(jnp.maximum(r, 0.0))
                        - r * jnp.sin(10.0 * jnp.pi * x[0]))
    elif name == "zdt4":
        f1 = lambda x: x[0]

        def f2(x):
            g = 1.0 + 10.0 * (n - 1) + jnp.sum(
                x[1:] ** 2 - 10.0 * jnp.cos(4.0 * jnp.pi * x[1:]))
            return g * (1.0 - jnp.sqrt(jnp.maximum(x[0] / g, 0.0)))
    elif name == "zdt6":
        def f1(x):
            return 1.0 - jnp.exp(-4.0 * x[0]) * jnp.sin(6.0 * jnp.pi * x[0]) ** 6

        def f2(x):
            g = 1.0 + 9.0 * (jnp.sum(x[1:]) / (n - 1)) ** 0.25
            return g * (1.0 - (f1(x) / g) ** 2)
    else:
        raise ValueError(f"unknown ZDT problem {name!r}")
    return f1, f2


def make_zdt(name: str, n: int, model_cfg=None) -> MOP:
    lb, ub = zdt_bounds(name, n)
    mop = MOP(lb, ub)
    f1, f2 = zdt_objectives(name, n)
    if model_cfg is None:
        mop.add_exact_objective(f1)
        mop.add_exact_objective(f2)
    else:
        mop.add_objective(f1, model_cfg=model_cfg)
        mop.add_objective(f2, model_cfg=model_cfg)
    return mop


# --------------------------------------------------------------------- DTLZ
def make_dtlz(which: int, n: int, M: int = 2, model_cfg=None) -> MOP:
    """DTLZ1/DTLZ6 (the reference grid) + the common DTLZ2 for testing."""
    k = n - M + 1
    assert k >= 1

    def g1(x):
        xm = x[M - 1:]
        return 100.0 * (k + jnp.sum((xm - 0.5) ** 2
                                    - jnp.cos(20.0 * jnp.pi * (xm - 0.5))))

    def g2(x):
        xm = x[M - 1:]
        return jnp.sum((xm - 0.5) ** 2)

    def g6(x):
        xm = x[M - 1:]
        return jnp.sum(jnp.maximum(xm, 0.0) ** 0.1)

    objs = []
    if which == 1:
        for i in range(M):
            def f(x, i=i):
                val = 0.5 * (1.0 + g1(x))
                val = val * jnp.prod(x[: M - 1 - i])
                if i > 0:
                    val = val * (1.0 - x[M - 1 - i])
                return val
            objs.append(f)
    elif which == 2:
        for i in range(M):
            def f(x, i=i):
                val = 1.0 + g2(x)
                val = val * jnp.prod(jnp.cos(0.5 * jnp.pi * x[: M - 1 - i]))
                if i > 0:
                    val = val * jnp.sin(0.5 * jnp.pi * x[M - 1 - i])
                return val
            objs.append(f)
    elif which == 6:
        # DTLZ6 (Deb et al.): theta-mapped DTLZ2-like front with g6
        for i in range(M):
            def f(x, i=i):
                g = g6(x)
                theta = jnp.pi / (4.0 * (1.0 + g)) * (1.0 + 2.0 * g * x)
                theta = theta.at[0].set(0.5 * jnp.pi * x[0])
                val = 1.0 + g
                val = val * jnp.prod(jnp.cos(theta[: M - 1 - i]))
                if i > 0:
                    val = val * jnp.sin(theta[M - 1 - i])
                return val
            objs.append(f)
    else:
        raise ValueError("supported: DTLZ1, DTLZ2, DTLZ6")

    mop = MOP(np.zeros(n), np.ones(n))
    for f in objs:
        if model_cfg is None:
            mop.add_exact_objective(f)
        else:
            mop.add_objective(f, model_cfg=model_cfg)
    return mop


# ------------------------------------------------------------ two parabolas
def make_two_parabolas(model_cfg=None, lb=None, ub=None) -> MOP:
    """``examples/example_two_parabolas.jl``."""
    mop = MOP(2) if lb is None else MOP(lb, ub)
    f1 = lambda x: jnp.sum((x - 1.0) ** 2)
    f2 = lambda x: jnp.sum((x + 1.0) ** 2)
    if model_cfg is None:
        mop.add_exact_objective(f1, jac=lambda x: 2.0 * (x - 1.0))
        mop.add_exact_objective(f2, jac=lambda x: 2.0 * (x + 1.0))
    else:
        mop.add_objective(f1, model_cfg=model_cfg)
        mop.add_objective(f2, model_cfg=model_cfg)
    return mop


# ----------------------------------------------------------------- Halton
_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59,
           61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127,
           131, 137, 139, 149, 151, 157, 163, 167, 173]  # covers n <= 40
           # (BASELINE config 3 names ZDT at n=10-30)


def halton(count: int, dim: int, start_index: int = 1) -> np.ndarray:
    """Halton low-discrepancy sequence (the reference uses
    ``HaltonSequences.jl`` for benchmark starts,
    ``examples/large_scale_benchmarks.jl``)."""
    assert dim <= len(_PRIMES)
    out = np.empty((count, dim))
    for j in range(dim):
        b = _PRIMES[j]
        for i in range(count):
            f, r, idx = 1.0, 0.0, start_index + i
            while idx > 0:
                f /= b
                r += f * (idx % b)
                idx //= b
            out[i, j] = r
    return out


def halton_starts(count: int, lb, ub, start_index: int = 1) -> np.ndarray:
    lb = np.asarray(lb)
    ub = np.asarray(ub)
    u = halton(count, lb.shape[0], start_index)
    return lb + (ub - lb) * u


def zdt_front(name: str, count: int = 256) -> np.ndarray:
    """Dense sampling of the analytic Pareto front, shape (count, 2).

    The ZDT fronts live on the ``g = 1`` surface with ``f1 = x0 in [0, 1]``
    (Zitzler et al. 2000); ZDT3's curve is additionally filtered to its
    nondominated (disconnected) subset. Used by the benchmark/quality
    observables (the reference harness records per-run criticality/evals,
    ``examples/large_scale_benchmarks.jl:124,239-241`` — front distance is
    the rebuild's additional quality metric, tests/test_zdt_quality.py)."""
    f1 = np.linspace(0.0, 1.0, count)
    if name == "zdt1":
        f2 = 1.0 - np.sqrt(f1)
    elif name == "zdt2":
        f2 = 1.0 - f1 ** 2
    elif name == "zdt3":
        f2 = 1.0 - np.sqrt(f1) - f1 * np.sin(10.0 * np.pi * f1)
    elif name == "zdt4":
        f2 = 1.0 - np.sqrt(f1)
    elif name == "zdt6":
        f1 = 1.0 - np.exp(-4.0 * f1) * np.sin(6.0 * np.pi * f1) ** 6
        f2 = 1.0 - f1 ** 2
    else:
        raise ValueError(f"unknown ZDT problem {name!r}")
    pts = np.stack([f1, f2], axis=1)
    # keep the nondominated subset (ZDT3/6 curves contain dominated arcs)
    keep = np.ones(len(pts), bool)
    for i in range(len(pts)):
        keep[i] = not np.any(
            (pts[:, 0] <= pts[i, 0]) & (pts[:, 1] <= pts[i, 1])
            & ((pts[:, 0] < pts[i, 0]) | (pts[:, 1] < pts[i, 1])))
    return pts[keep]
