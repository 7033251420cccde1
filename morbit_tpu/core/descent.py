"""Trust-region subproblem solvers: criticality, descent step, normal step.

Reference: ``src/descent.jl``. The multiobjective steepest-descent direction
is the min-max LP (``descent.jl:74-135``)

    min_{beta, d}  beta   s.t.  Df d <= beta * ||rows||,  -1 <= d <= 1,
                               lb <= x + d <= ub,  A_eq d = b_eq,  A_ineq d <= b_ineq

solved with the batched ADMM+polish QP kernel (:mod:`morbit_tpu.ops.qp`)
instead of JuMP+OSQP; the criticality measure is ``omega = -beta``.
Backtracking (``descent.jl:137-185``) is a ``lax.while_loop`` over surrogate
evaluations. The min-inf-norm normal step (``descent.jl:691-758``) is the
same LP reformulated with an epigraph variable; LP infeasibility is signalled
by NaN (triggering restoration) exactly like the reference (``:750-751``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from morbit_tpu.ops.geometry import intersect_bounds, local_bounds
from morbit_tpu.ops.qp import solve_qp

_EPS64 = 2.0 ** -52


@dataclasses.dataclass(frozen=True)
class SteepestDescentConfig:
    """``SteepestDescentConfig`` (``descent.jl:53-72``) with reference defaults."""

    strict_backtracking: bool = True
    armijo_const_rhs: float = 1e-6
    armijo_const_shrink: float = 0.75
    min_stepsize: float = 10 * _EPS64
    max_loops: int = int(math.floor(math.log(10 * _EPS64) / math.log(0.75)))
    normalize: bool = True


@dataclasses.dataclass(frozen=True)
class PascolettiSerafiniConfig:
    """``PascolettiSerafiniConfig`` (``descent.jl:323-349``).

    The NLopt :GN_ISRES global stage is replaced by a deterministic Halton
    sweep over the local box; the optional local polish
    (``ps_polish_algo``) by projected-gradient refinement on the smooth
    surrogate scalarization (SURVEY.md §7 step 10). ``ps_polish`` is the
    ``ps_polish_algo`` analogue: the polish stage is OFF by default, like
    the reference's ``ps_polish_algo = nothing``. ``n_samples`` /
    ``polish_iters`` are repo-native overrides of the resolved grid/polish
    budgets (negative = use the reference mapping)."""

    reference_point: tuple = ()
    reference_direction: tuple = ()
    trust_region_factor: float = 1.0
    max_ps_problem_evals: int = -1
    max_ps_polish_evals: int = -1
    max_ideal_point_problem_evals: int = -1
    ps_polish: bool = False
    n_samples: int = -1
    polish_iters: int = -1


def ps_subsolver_budgets(cfg: PascolettiSerafiniConfig, n_vars: int):
    """Resolve the PS subsolver sample/polish budgets.

    Mirrors ``_ps_max_evals`` (``descent.jl:414-432``) and the ideal-point
    budget (``descent.jl:527``) with the REFERENCE defaults: total budget
    ``500 * (n_vars + 1)`` (or an explicit ``max_ps_problem_evals``), all of
    it on the global stage unless polish is opted into (``ps_polish`` — the
    ``ps_polish_algo`` analogue; setting ``max_ps_polish_evals`` or
    ``polish_iters`` implies it). With polish on, the split is 3/4 global /
    1/4 polish unless ``max_ps_polish_evals`` keeps the full total for the
    sweep and caps the polish separately. The per-objective ideal-point
    solves run their own ``500 * (n_vars + 1)`` (or
    ``max_ideal_point_problem_evals``) global-only budget (``:527-536``).
    ``n_samples``/``polish_iters`` override the resolved grid/polish sizes
    directly. Returns ``(ps_grid, ps_polish, ideal_grid, ideal_polish)``."""
    ref_total = 500 * (n_vars + 1)
    polish_on = (cfg.ps_polish or cfg.max_ps_polish_evals >= 0
                 or cfg.polish_iters >= 0)
    explicit_polish = (cfg.max_ps_polish_evals if cfg.max_ps_polish_evals >= 0
                       else cfg.polish_iters)

    total = (cfg.max_ps_problem_evals if cfg.max_ps_problem_evals >= 0
             else (cfg.n_samples if cfg.n_samples >= 0 else ref_total))
    if not polish_on:
        ps_grid, ps_polish = total, 0
    elif explicit_polish >= 0:
        ps_grid, ps_polish = total, explicit_polish
    else:
        ps_grid = max(total * 3 // 4, 1)
        ps_polish = total - ps_grid

    if cfg.max_ideal_point_problem_evals >= 0:
        # reference ideal-point solves are single-stage global
        # (``reference_algo``, no polish)
        ideal_grid, ideal_polish = cfg.max_ideal_point_problem_evals, 0
    else:
        ideal_grid = cfg.n_samples if cfg.n_samples >= 0 else ref_total
        ideal_polish = cfg.polish_iters if cfg.polish_iters >= 0 else 0
    return max(ps_grid, 1), ps_polish, max(ideal_grid, 1), ideal_polish


def resolve_descent_config(spec):
    if isinstance(spec, (SteepestDescentConfig, PascolettiSerafiniConfig)):
        return spec
    if spec in ("steepest_descent", "steepest", "sd"):
        return SteepestDescentConfig()
    if spec in ("ps", "pascoletti_serafini"):
        return PascolettiSerafiniConfig()
    raise ValueError(f"unknown descent method {spec!r}")


class LinearizedConstraints(NamedTuple):
    """Linear(ized) constraint rows for the subproblems, all in scaled space.

    ``A_eq d - b_eq == 0`` and ``A_ineq d - b_ineq <= 0`` for a step ``d``
    from the expansion point; includes both the true linear constraints and
    the surrogate linearizations of the nonlinear ones
    (``descent.jl:199-236``). Zero-row arrays when absent (static shapes)."""

    A_eq: jax.Array
    b_eq: jax.Array
    A_ineq: jax.Array
    b_ineq: jax.Array


def steepest_descent_direction(
    x_n: jax.Array,
    Dm: jax.Array,
    lb: jax.Array,
    ub: jax.Array,
    lin: LinearizedConstraints,
    normalize: bool = True,
    qp_iters: int = 400,
    qp_exit_eps: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Solve the min-max LP; returns (d, omega). ``descent.jl:91-135``.

    On solver failure the reference returns a zero step with ``omega = -Inf``
    (``:130-134``); we mirror that from the residual status."""
    n = x_n.shape[0]
    m = Dm.shape[0]
    dtype = x_n.dtype
    if normalize:
        c = jnp.linalg.norm(Dm, axis=1)
        c = jnp.where(c > 0, c, 1.0)
    else:
        c = jnp.ones((m,), dtype)

    p, q = lin.A_eq.shape[0], lin.A_ineq.shape[0]
    nv = n + 1
    inf = jnp.inf

    A = jnp.concatenate([
        jnp.concatenate([Dm, -c[:, None]], axis=1),                    # descent rows
        jnp.concatenate([jnp.eye(n, dtype=dtype), jnp.zeros((n, 1), dtype)], axis=1),  # |d| <= 1
        jnp.concatenate([jnp.eye(n, dtype=dtype), jnp.zeros((n, 1), dtype)], axis=1),  # box
        jnp.concatenate([lin.A_eq, jnp.zeros((p, 1), dtype)], axis=1),
        jnp.concatenate([lin.A_ineq, jnp.zeros((q, 1), dtype)], axis=1),
    ], axis=0)
    l = jnp.concatenate([
        jnp.full((m,), -inf, dtype),
        jnp.full((n,), -1.0, dtype),
        lb - x_n,
        lin.b_eq,
        jnp.full((q,), -inf, dtype),
    ])
    u = jnp.concatenate([
        jnp.zeros((m,), dtype),
        jnp.full((n,), 1.0, dtype),
        ub - x_n,
        lin.b_eq,
        lin.b_ineq,
    ])
    qv = jnp.zeros((nv,), dtype).at[n].set(1.0)
    P = jnp.zeros((nv, nv), dtype)
    sol = solve_qp(P, qv, A, l, u, iters=qp_iters, exit_eps=qp_exit_eps)

    d = sol.z[:n]
    omega = -sol.z[n]
    ok = sol.status_ok & jnp.all(jnp.isfinite(d))
    d = jnp.where(ok, d, 0.0)
    omega = jnp.where(ok, omega, -jnp.inf)
    return d, omega


def armijo_ok(mx, mx_t, step_size, omega, c, strict: bool):
    """``_armijo_condition`` (``descent.jl:137-143``)."""
    if strict:
        return jnp.all((mx - mx_t) >= step_size * c * omega)
    return (jnp.max(mx) - jnp.max(mx_t)) >= step_size * c * omega


def backtrack(x_n, d, sigma0, omega, eval_mx, states, cfg: SteepestDescentConfig,
              eval_mx_batch=None):
    """Armijo backtracking on the surrogates (``descent.jl:150-185``).

    TPU-first restructuring of the sequential shrink loop: the candidate
    stepsizes are the fixed geometric ladder ``sigma0 * alpha^k`` and the
    Armijo test at step k depends only on ``m(x_n + sigma_k d)``, so all
    ``max_loops+1`` trial points are evaluated in ONE batched call and the
    accepted index is the first k with (armijo_k or sigma_k <= min_step) —
    bit-identical to the reference's loop, without the sequential chain.

    ``eval_mx(states, x) -> (mx, states)`` counts one exact-model eval;
    ``eval_mx_batch(states, X (K,n), k_used) -> (MX, states)`` evaluates the
    ladder and charges ``k_used`` evals (the number the sequential loop
    would have performed). Returns (x_plus, mx_plus, step, states)."""
    dtype = x_n.dtype
    alpha = jnp.asarray(cfg.armijo_const_shrink, dtype)
    c = jnp.asarray(cfg.armijo_const_rhs, dtype)
    min_step = jnp.asarray(cfg.min_stepsize, dtype)
    K = cfg.max_loops + 1

    mx, states = eval_mx(states, x_n)

    sigmas = sigma0 * alpha ** jnp.arange(K, dtype=dtype)      # (K,)
    X = x_n[None, :] + sigmas[:, None] * d[None, :]            # (K, n)

    if eval_mx_batch is None:
        MX, states = jax.vmap(lambda xq: eval_mx(states, xq)[0])(X), states
    else:
        MX = None  # filled below after k_used is known

    def tests(MXv):
        if cfg.strict_backtracking:
            ok = jnp.all(mx[None, :] - MXv >= (sigmas * c * omega)[:, None], axis=1)
        else:
            ok = (jnp.max(mx) - jnp.max(MXv, axis=1)) >= sigmas * c * omega
        return ok

    if eval_mx_batch is not None:
        # evaluate uncounted first to find k*, then charge k*+1 evals
        MX, states = eval_mx_batch(states, X, None)

    ok = tests(MX) | (sigmas <= min_step)
    k_star = jnp.where(jnp.any(ok), jnp.argmax(ok), K - 1).astype(jnp.int32)

    if eval_mx_batch is not None:
        _, states = eval_mx_batch(states, None, k_star + 1)

    sigma = sigmas[k_star]
    x_t = X[k_star]
    mx_t = MX[k_star]
    step = sigma * d
    return x_t, mx_t, step, states


def initial_stepsize(x, x_n, d, delta, lb, ub, dtype,
                     con_vals=None, con_dirs=None, con_rhs=None):
    """Initial backtracking stepsize sigma (``descent.jl:253-310``).

    For ``Delta > 1`` with ``||d|| ~ 1`` the reference intersects the
    doubled linearized system (``descent.jl:276-292``): the local box plus
    every (true linear and surrogate-linearized) constraint row along the
    ray ``x_n + sigma*d``. Callers pass those rows in crossing form
    ``con_vals + sigma * con_dirs <= con_rhs`` (equality rows appear twice
    with flipped sign); ``None`` for box-only problems."""
    from morbit_tpu.ops.geometry import _crossing_sigmas

    lb_eff, ub_eff = local_bounds(x, delta, lb, ub)
    took_normal = ~jnp.all(jnp.isclose(x, x_n))
    delta_eff = jnp.where(
        took_normal,
        intersect_bounds(x_n, d, lb_eff, ub_eff, ret_mode="pos"),
        delta,
    )
    norm_d = jnp.max(jnp.abs(d))
    norm_d_safe = jnp.where(norm_d > 0, norm_d, 1.0)
    sigma_small = jnp.minimum(delta_eff / norm_d_safe, 1.0)
    # Delta > 1 branch: step until the local box — or a linearized
    # constraint — is hit, when ||d||_inf ~ 1
    sigma_box = intersect_bounds(x_n, d, lb_eff, ub_eff, ret_mode="pos")
    if con_vals is not None and con_vals.shape[0] > 0:
        s = _crossing_sigmas(con_vals, con_rhs, con_dirs, sense_lb=False)
        nonneg = s >= 0
        # rows never crossed along the ray (all sigmas negative: the
        # direction moves AWAY from every constraint) impose no cap — the
        # reference folds box and constraint rows into one positive-minimum
        # (``_intersect_bounds``, ``utilities.jl:156-281``), so the
        # constraint-subset fallback is +inf, not 0
        sigma_con = jnp.where(jnp.any(nonneg),
                              jnp.min(jnp.where(nonneg, s, jnp.inf)), jnp.inf)
        sigma_box = jnp.minimum(sigma_box, sigma_con)
    sigma_big = jnp.where(
        jnp.isclose(norm_d, 1.0), sigma_box, jnp.asarray(1.0, dtype))
    return jnp.where(delta_eff <= 1.0, sigma_small, sigma_big)


def normal_step(
    x: jax.Array,
    lb: jax.Array,
    ub: jax.Array,
    lin: LinearizedConstraints,
    kappa_delta: float,
    delta_max: float,
    delta: jax.Array,
    variable_radius,
    qp_iters: int = 400,
    qp_exit_eps: float = 0.0,
):
    """Min-inf-norm step onto the linearized feasible set
    (``compute_normal_step``, ``descent.jl:691-758``).

    ``lin`` carries rows with RHS measured at ``x``: ``A_eq n = b_eq``,
    ``A_ineq n <= b_ineq``. ``variable_radius`` is traced (the reference picks
    it from ``last_it_stat == RESTORATION``): both QP variants are solved and
    selected. Returns (n, Delta, feasible)."""
    n = x.shape[0]
    dtype = x.dtype
    p, q = lin.A_eq.shape[0], lin.A_ineq.shape[0]
    inf = jnp.inf
    nv = n + 2  # (n_step, alpha, del)

    eye = jnp.eye(n, dtype=dtype)
    zn = jnp.zeros((n, 1), dtype)
    rows = [
        jnp.concatenate([eye, -jnp.ones((n, 1), dtype), zn], axis=1),   # n_i - a <= 0
        jnp.concatenate([-eye, -jnp.ones((n, 1), dtype), zn], axis=1),  # -n_i - a <= 0
        jnp.concatenate([jnp.zeros((1, n), dtype),
                         jnp.ones((1, 1), dtype), jnp.zeros((1, 1), dtype)], axis=1),  # a >= 0
        jnp.concatenate([eye, zn, zn], axis=1),                         # box
        jnp.concatenate([lin.A_eq, jnp.zeros((p, 2), dtype)], axis=1),
        jnp.concatenate([lin.A_ineq, jnp.zeros((q, 2), dtype)], axis=1),
        # a - kappa_delta * del <= 0 (only active in variable_radius mode)
        jnp.concatenate([jnp.zeros((1, n), dtype), jnp.ones((1, 1), dtype),
                         jnp.full((1, 1), -kappa_delta, dtype)], axis=1),
        # del box
        jnp.concatenate([jnp.zeros((1, n + 1), dtype), jnp.ones((1, 1), dtype)], axis=1),
    ]
    A = jnp.concatenate(rows, axis=0)

    def bounds(var_rad):
        l = jnp.concatenate([
            jnp.full((2 * n,), -inf, dtype),
            jnp.zeros((1,), dtype),
            lb - x,
            lin.b_eq,
            jnp.full((q,), -inf, dtype),
            jnp.full((1,), -inf, dtype),
            jnp.zeros((1,), dtype),
        ])
        u = jnp.concatenate([
            jnp.zeros((2 * n,), dtype),
            jnp.full((1,), inf, dtype),
            ub - x,
            lin.b_eq,
            lin.b_ineq,
            jnp.where(var_rad, 0.0, inf)[None].astype(dtype),
            jnp.full((1,), delta_max, dtype),
        ])
        qv = jnp.zeros((nv,), dtype)
        qv = qv.at[n].set(jnp.where(var_rad, 0.0, 1.0))
        qv = qv.at[n + 1].set(jnp.where(var_rad, 1.0, 0.0))
        return qv, l, u

    P = jnp.zeros((nv, nv), dtype)
    qv, l, u = bounds(variable_radius)
    sol = solve_qp(P, qv, A, l, u, iters=qp_iters, exit_eps=qp_exit_eps)

    n_step = sol.z[:n]
    # clip tiny box violations (``descent.jl:756``)
    n_step = jnp.clip(x + n_step, lb, ub) - x
    # explicit post-clip feasibility test against the constraint rows — the
    # stand-in for OSQP's primal-infeasibility certificate (Stellato et al.
    # 2020 §3.4; JuMP surfaces it as LOCALLY_INFEASIBLE, ``descent.jl:750``).
    # solve_qp's own status threshold is deliberately loose (ADMM noise) and
    # an infeasible LP lets ADMM spread the violation across the box rows
    # below it; the clip concentrates the true geometric violation in the
    # (row-equilibrated, unit-norm) constraint rows where a much tighter
    # threshold is safe (polished feasible solves sit at ~1e-9).
    # Two DOCUMENTED deviations from the reference (advisor round 3):
    # (a) the threshold is calibrated for the polished default budget
    #     (``qp_iters >= ~100`` with ``qp_polish``): a user-lowered budget
    #     can leave a feasible-but-unconverged solve above it and report
    #     INFEASIBLE where OSQP's certificate would not — keep the default
    #     budget on constrained problems;
    # (b) the test runs on the POST-clip step: the reference checks solver
    #     status before its box projection (``descent.jl:750-757``); testing
    #     pre-clip would let ADMM hide an infeasible LP's violation in the
    #     box rows, so post-clip is the load-bearing choice (oracle-locked:
    #     tests/test_oracle_parity.py "lin-infeasible-exit").
    feas_tol = 10.0 * jnp.sqrt(jnp.asarray(
        1e-6 if jnp.finfo(dtype).bits <= 32 else 1e-8, dtype))
    viol = jnp.asarray(0.0, dtype)
    if p:
        viol = jnp.maximum(viol, jnp.max(jnp.abs(lin.A_eq @ n_step - lin.b_eq)))
    if q:
        viol = jnp.maximum(viol, jnp.max(lin.A_ineq @ n_step - lin.b_ineq))
    feasible = sol.status_ok & (viol <= feas_tol)
    n_step = jnp.where(feasible, n_step, jnp.nan)
    delta_out = jnp.where(variable_radius, sol.z[n + 1], delta)
    return n_step, delta_out, feasible
