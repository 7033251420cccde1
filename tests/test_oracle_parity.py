"""Cross-validation against the independent sequential SciPy oracle.

``oracle_sequential.py`` re-implements the reference trust-region semantics
(``src/algorithm.jl``, ``src/descent.jl``) with plain Python loops, NumPy
float64 and ``scipy.optimize.linprog`` — sharing NO machinery with the
jitted solver.  Agreement here validates the solver's TPU-first
restructurings (masked while_loop, criticality micro-steps, one-shot
batched Armijo ladder, ADMM+polish LP, fixed-capacity stamps) against a
transparent implementation of the same math: unlike the golden-trajectory
locks (which pin the solver against itself), a systematic semantic
deviation would surface here.

Float tolerances: the ADMM+polish LP and HiGHS agree to ~1e-13 on
non-degenerate instances; near-critical min-max LPs can have non-unique
optimal directions (measured: *raising* qp_iters to 2000 flips the
3var-crit run onto a different — equally valid — vertex path), so the
near-critical configs assert exact STRUCTURE (it_stat sequence, stop code,
iteration/eval counts) with looser float bounds.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.mop import MOP
from morbit_tpu.utils.logging import trajectory_arrays
from tests.oracle_sequential import solve_oracle


def _two_parabolas():
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    F = lambda x: np.array([np.sum((x - 1.0) ** 2), np.sum((x + 1.0) ** 2)])
    J = lambda x: np.stack([2.0 * (x - 1.0), 2.0 * (x + 1.0)])
    return mop, F, J, np.full(2, -4.0), np.full(2, 4.0), np.array([-3.0, 2.5])


def _three_var():
    mop = MOP([-2.0] * 3, [3.0] * 3)
    mop.add_exact_objective(
        lambda x: (x[0] - 1.0) ** 2 + 2.0 * x[1] ** 2 + 0.5 * x[2] ** 2)
    mop.add_exact_objective(
        lambda x: (x[0] + 1.0) ** 2 + (x[1] - 0.5) ** 2 + x[2] ** 2
        + 0.1 * x[0] * x[1])
    F = lambda x: np.array([
        (x[0] - 1.0) ** 2 + 2.0 * x[1] ** 2 + 0.5 * x[2] ** 2,
        (x[0] + 1.0) ** 2 + (x[1] - 0.5) ** 2 + x[2] ** 2
        + 0.1 * x[0] * x[1]])
    J = lambda x: np.array([
        [2.0 * (x[0] - 1.0), 4.0 * x[1], 1.0 * x[2]],
        [2.0 * (x[0] + 1.0) + 0.1 * x[1],
         2.0 * (x[1] - 0.5) + 0.1 * x[0], 2.0 * x[2]]])
    return (mop, F, J, np.full(3, -2.0), np.full(3, 3.0),
            np.array([2.0, -1.5, 2.5]))


_LIN1 = dict(A_ineq=[[1.0, 1.0]], b_ineq=[1.0])
_LIN2 = dict(A_ineq=[[1.0, 1.0], [1.0, -2.0]], b_ineq=[1.0, 2.0])

CASES = {
    # label: (problem, x0 override, solver/oracle kwargs incl. A_ineq,
    #         float tolerance on stamps)
    "2var-default": (_two_parabolas, None, dict(max_iter=10), 1e-12),
    "2var-budget": (_two_parabolas, None,
                    dict(max_iter=40, max_evals=25), 1e-12),
    # tolerances off -> the run is driven into the criticality routine and
    # a CRITICAL stop; exercises the micro-step restructure + beta-clamp
    # (round 4: solve_qp row equilibration tightened this 1e-9 -> measured
    # 5.9e-13; bound ratcheted with ~20x headroom)
    "2var-critical": (_two_parabolas, None,
                      dict(max_iter=40, f_tol_rel=0.0, x_tol_rel=0.0), 1e-11),
    "3var-default": (_three_var, None, dict(max_iter=12), 1e-12),
    # near-critical LP directions are weakly non-unique here: structure must
    # still be EXACT, floats only to the vertex-degeneracy scale (round 4:
    # equilibration tightened the measured error 5e-3-scale -> 2.2e-4;
    # bound ratcheted accordingly)
    "3var-critical": (_three_var, None,
                      dict(max_iter=60, f_tol_rel=0.0, x_tol_rel=0.0), 1e-3),
    # ---- linear inequality constraints: normal step + compatibility +
    # linear restoration (``algorithm.jl:406-521``). The feasible-start case
    # ends on the active constraint — it also locks the descent-LP row
    # equilibration (without it the ADMM omega overshoots the LP optimum).
    "lin-active": (_two_parabolas, None, dict(max_iter=12, **_LIN1), 1e-12),
    "lin-infeasible-start": (_two_parabolas, [3.0, 3.5],
                             dict(max_iter=12, **_LIN1), 1e-12),
    "lin-two-rows": (_two_parabolas, [3.0, 3.5],
                     dict(max_iter=15, **_LIN2), 1e-12),
    # tiny delta_0 makes the normal step incompatible -> linear restoration
    # (RESTORATION stamp) + variable-radius normal step on the follow-up
    "lin-restoration": (_two_parabolas, [3.0, 3.5],
                        dict(max_iter=12, delta_0=0.01, **_LIN1), 1e-12),
    # constraint row infeasible inside the box -> INFEASIBLE exit
    "lin-infeasible-exit": (_two_parabolas, [3.0, 3.5],
                            dict(max_iter=12, A_ineq=[[1.0, 1.0]],
                                 b_ineq=[-9.0]), 1e-12),
}


@pytest.mark.parametrize("label", CASES)
def test_oracle_parity(label):
    make, x0_override, kw, tol = CASES[label]
    mop, F, J, lb, ub, x0 = make()
    if x0_override is not None:
        x0 = np.asarray(x0_override, float)
    kw = dict(kw)
    A_ineq, b_ineq = kw.pop("A_ineq", None), kw.pop("b_ineq", None)
    if A_ineq is not None:
        mop.add_ineq_constraint(np.asarray(A_ineq, float),
                                np.asarray(b_ineq, float))
    res = optimize(mop, jnp.asarray(x0), dtype=jnp.float64, **kw)
    tr = trajectory_arrays(res)
    orc = solve_oracle(F, J, lb, ub, x0, A_ineq=A_ineq, b_ineq=b_ineq, **kw)

    # ---- exact structural parity
    assert int(res.stop_code) == orc.stop_code
    assert int(res.n_iterations) == orc.n_iterations
    # one combined-eval site set per group: each group's counter equals the
    # oracle's sequential count (``CountedFunc`` rules, globals.jl:74-112)
    for st in res.state.groups:
        assert int(st.n_evals) == orc.n_evals
    assert tr["it_stat"].astype(int).tolist() == orc.traj_it_stat
    assert len(tr["x"]) == len(orc.traj_x)
    # per-group db row of each stamped iterate
    for col in tr["x_indices"].astype(int).T:
        assert col.tolist() == orc.traj_x_index

    # ---- float parity on every stamped quantity
    for name in ("x", "fx", "delta", "rho", "omega", "steplength"):
        a = np.asarray(tr[name], float)
        b = np.asarray(getattr(orc, "traj_" + name), float)
        assert a.shape == b.shape
        fin_a, fin_b = np.isfinite(a), np.isfinite(b)
        assert np.array_equal(fin_a, fin_b), name
        # same +-inf stamps (equal_nan: a NaN stamped on both sides matches)
        assert np.array_equal(a[~fin_a], b[~fin_b], equal_nan=True), name
        err = float(np.max(np.abs(a[fin_a] - b[fin_b]), initial=0.0))
        assert err <= tol, (name, err)
