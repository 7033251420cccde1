"""End-to-end solver tests on the two-parabolas problem.

The reference's example (``examples/example_two_parabolas.jl``): objectives
``(x1-1)^2 + (x2-1)^2`` and ``(x1+1)^2 + (x2+1)^2``; the Pareto set is the
diagonal ``x1 == x2 in [-1, 1]``. Mirrors the example's convergence check
(``x[1] ≈ x[2] atol .1``) plus budget/round-trip behaviors from
``test/rbf_models.jl`` and ``test/test_scaling.jl``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.enums import ITER_TYPE, STOP_CODE
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import RbfConfig, TaylorConfig

X0 = jnp.array([-3.141592653589793, 2.71828])


def two_parabolas(model_cfg=None, bounds=None, **add_kw):
    mop = MOP(2) if bounds is None else MOP(*bounds)
    if model_cfg is None:
        mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2), **add_kw)
        mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2), **add_kw)
    else:
        mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=model_cfg)
        mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=model_cfg)
    return mop


def test_exact_unconstrained():
    res = optimize(two_parabolas(), X0, max_iter=20)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.1          # Pareto-critical: on the diagonal
    assert -1.1 <= x[0] <= 1.1
    assert int(res.stop_code) in (STOP_CODE.TOLERANCE, STOP_CODE.CRITICAL,
                                  STOP_CODE.MAX_ITER)
    # trajectory stamped each iteration incl. INITIALIZATION
    assert int(res.state.traj.count) == int(res.n_iterations) + 1
    assert int(res.state.traj.it_stat[0]) == ITER_TYPE.INITIALIZATION


def test_exact_with_gradient_callbacks():
    mop = MOP(2)
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2),
                            jac=lambda x: 2.0 * (x - 1.0))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2),
                            jac=lambda x: 2.0 * (x + 1.0))
    res = optimize(mop, X0, max_iter=20)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.1


def test_rbf_box_constrained():
    cfg = RbfConfig(kernel="multiquadric")
    res = optimize(two_parabolas(cfg, bounds=([-4.0, -4.0], [4.0, 4.0])),
                   X0, max_iter=30)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.15
    assert -1.1 <= x[0] <= 1.1
    # evaluation budget sanity: init + ~2/iteration, never exploding
    assert int(res.n_evals) <= 3 * int(res.n_iterations) + 5


def test_taylor_callback_model():
    cfg = TaylorConfig(degree=2, mode="callback")
    res = optimize(two_parabolas(cfg, bounds=([-4.0, -4.0], [4.0, 4.0])),
                   X0, max_iter=25)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.15


def test_taylor_fd_model():
    cfg = TaylorConfig(degree=2, mode="fd")
    res = optimize(two_parabolas(cfg, bounds=([-4.0, -4.0], [4.0, 4.0])),
                   X0, max_iter=25)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.15


def test_max_iter_zero_roundtrips_x0():
    """``optimize(max_iter=0)`` returns x0 (``test/test_scaling.jl``)."""
    res = optimize(two_parabolas(), X0, max_iter=0)
    assert np.allclose(np.asarray(res.x), np.asarray(X0))
    assert int(res.stop_code) == STOP_CODE.MAX_ITER
    assert int(res.n_iterations) == 0


def test_eval_budget_respected():
    """``max_evals`` bounds true evaluations (``test/rbf_models.jl:43-44``)."""
    cfg = RbfConfig()
    res = optimize(two_parabolas(cfg, bounds=([-4.0, -4.0], [4.0, 4.0])),
                   X0, max_iter=30, max_evals=8)
    assert int(res.n_evals) <= 2 * 8  # per-group cap; 1 combined group here
    assert int(res.stop_code) in (STOP_CODE.BUDGET_EXHAUSTED, STOP_CODE.TOLERANCE,
                                  STOP_CODE.CRITICAL)


def test_x0_projected_into_box():
    mop = two_parabolas(bounds=([0.25, 0.25], [0.75, 0.75]))
    res = optimize(mop, jnp.array([5.0, -5.0]), max_iter=5)
    x = np.asarray(res.x)
    assert np.all(x >= 0.25 - 1e-12) and np.all(x <= 0.75 + 1e-12)


def test_scaled_iterate_in_unit_cube():
    """Finitely-boxed problems run in [0,1]^n internally
    (``VarScaler.jl:205-213``)."""
    mop = two_parabolas(bounds=([-4.0, -4.0], [4.0, 4.0]))
    res = optimize(mop, X0, max_iter=10)
    xs = np.asarray(res.state.x_s)
    assert np.all(xs >= -1e-9) and np.all(xs <= 1 + 1e-9)
    assert np.allclose(np.asarray(res.x), -4.0 + 8.0 * xs)
