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
                    step0: float = 0.1, extra_starts=None):
    """Maximize ``f`` over [lb, ub]: batched grid sweep + PGA refinement.

    ``grid_unit``: (K, n) unit-cube points (static constants). Optional
    ``extra_starts``: (S, n) traced points also swept (e.g. current iterate).
    Returns (x_best, f_best)."""
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    pts = lb[None, :] + (ub - lb)[None, :] * jnp.asarray(grid_unit, lb.dtype)
    if extra_starts is not None:
        pts = jnp.concatenate([extra_starts, pts], axis=0)
    vals = jax.vmap(f)(pts)
    best = jnp.argmax(vals)
    x0 = pts[best]
    f0 = vals[best]

    g = jax.grad(f)
    width = jnp.max(ub - lb)

    def body(i, carry):
        x, fx, eta = carry
        x_try = project_into_box(x + eta * g(x), lb, ub)
        f_try = f(x_try)
        better = f_try > fx
        x = jnp.where(better, x_try, x)
        fx = jnp.where(better, f_try, fx)
        eta = jnp.where(better, eta * 1.5, eta * 0.5)
        return x, fx, eta

    x, fx, _ = jax.lax.fori_loop(0, iters, body, (x0, f0, step0 * width))
    return x, fx


def minimize_in_box(f, lb, ub, grid_unit, iters: int = 30, step0: float = 0.1,
                    extra_starts=None):
    x, fneg = maximize_in_box(lambda x: -f(x), lb, ub, grid_unit, iters, step0,
                              extra_starts)
    return x, -fneg
