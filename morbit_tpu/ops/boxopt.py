"""Derivative-free-style box optimization on device (NLopt replacement).

The reference calls NLopt (C) for several auxiliary subproblems: Lagrange
polynomial maximization (``LagrangeModel.jl:270-288``), the
Pascoletti-Serafini scalarization (``descent.jl:478-510``, :GN_ISRES), local
ideal points (``descent.jl:404-412``) and restoration (COBYLA,
``algorithm.jl:363``). On TPU the objective in every one of these cases is a
*cheap differentiable on-device function* (a polynomial, a surrogate, or a
violation measure), so the idiomatic substitute is dense sampling + monotone
projected gradient ascent (SURVEY.md §7 hard part 4):

* evaluate a static low-discrepancy grid in one batched call (MXU-friendly);
* refine the best point with fixed-iteration projected gradient steps with
  multiplicative step adaptation (monotone: never accepts a worse point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.ops.geometry import project_into_box


def halton_grid(n_points: int, n_vars: int) -> np.ndarray:
    """Deterministic unit-cube sample grid (trace-time constant)."""
    from morbit_tpu.problems.synthetic import halton

    return halton(n_points, n_vars)


def maximize_in_box(f, lb, ub, grid_unit: np.ndarray, iters: int = 30,
                    step0: float = 0.1, extra_starts=None, n_starts: int = 1):
    """Maximize ``f`` over [lb, ub]: batched grid sweep + PGA refinement.

    ``grid_unit``: (K, n) unit-cube points (static constants). Optional
    ``extra_starts``: (S, n) traced points also swept (e.g. current iterate).
    ``n_starts > 1`` refines the top-k sweep candidates concurrently
    (vmapped multistart) and returns the overall best.
    Returns (x_best, f_best)."""
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    pts = lb[None, :] + (ub - lb)[None, :] * jnp.asarray(grid_unit, lb.dtype)
    if extra_starts is not None:
        pts = jnp.concatenate([extra_starts, pts], axis=0)
    vals = jax.vmap(f)(pts)

    g = jax.grad(f)
    width = jnp.max(ub - lb)
    k = min(max(int(n_starts), 1), pts.shape[0])
    if k == 1:
        best = jnp.argmax(vals)
        X0, F0 = pts[best][None, :], vals[best][None]
    else:
        F0, top = jax.lax.top_k(vals, k)
        X0 = pts[top]

    def body(i, carry):
        X, FX, eta = carry
        X_try = jax.vmap(
            lambda x, e: project_into_box(x + e * g(x), lb, ub))(X, eta)
        F_try = jax.vmap(f)(X_try)
        better = F_try > FX
        X = jnp.where(better[:, None], X_try, X)
        FX = jnp.where(better, F_try, FX)
        eta = jnp.where(better, eta * 1.5, eta * 0.5)
        return X, FX, eta

    eta0 = jnp.full((k,), step0, lb.dtype) * width
    X, FX, _ = jax.lax.fori_loop(0, iters, body, (X0, F0, eta0))
    best = jnp.argmax(FX)
    return X[best], FX[best]


def minimize_in_box(f, lb, ub, grid_unit, iters: int = 30, step0: float = 0.1,
                    extra_starts=None, n_starts: int = 1):
    x, fneg = maximize_in_box(lambda x: -f(x), lb, ub, grid_unit, iters, step0,
                              extra_starts, n_starts)
    return x, -fneg
