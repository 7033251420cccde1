"""Constrained solver tests: linear constraints, normal step, filter, NL
constraints, restoration.

Covers the reference machinery of ``find_normal_step``/``restoration``
(``algorithm.jl:325-521``), ``compute_normal_step`` (``descent.jl:691-758``)
and the filter acceptance flow (``algorithm.jl:779-877``).
"""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.enums import ITER_TYPE, STOP_CODE
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import ExactConfig, RbfConfig


def _base(lb=(-4.0, -4.0), ub=(4.0, 4.0)):
    mop = MOP(list(lb), list(ub))
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    return mop


def test_linear_ineq_feasible_start():
    mop = _base()
    mop.add_ineq_constraint([[1.0, 1.0]], [0.5])
    res = optimize(mop, jnp.array([-3.0, 2.0]), max_iter=25)
    x = np.asarray(res.x)
    assert x.sum() <= 0.5 + 1e-8
    assert abs(x[0] - x[1]) < 0.1


def test_linear_ineq_infeasible_start_normal_step():
    """Infeasible start triggers the min-inf-norm normal step used as a
    linear restoration (``algorithm.jl:447-452``)."""
    mop = _base()
    mop.add_ineq_constraint([[1.0, 1.0]], [0.5])
    res = optimize(mop, jnp.array([2.0, 2.0]), max_iter=25)
    x = np.asarray(res.x)
    assert x.sum() <= 0.5 + 1e-6
    traj = res.state.traj
    stats = np.asarray(traj.it_stat)[: int(traj.count)]
    assert ITER_TYPE.RESTORATION in stats
    # min-inf-norm restoration from (2,2): both coords move by -1.75
    assert np.allclose(np.asarray(traj.x[1]), [0.25, 0.25], atol=1e-5)


def test_linear_eq_constraint():
    mop = _base()
    mop.add_eq_constraint([[1.0, -1.0]], [0.5])  # x1 - x2 = 0.5
    res = optimize(mop, jnp.array([1.0, 0.5]), max_iter=25)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1] - 0.5) < 1e-6


def test_nl_ineq_exact_model():
    mop = _base()
    mop.add_nl_ineq_constraint(lambda x: jnp.sum(x ** 2) - 1.69,
                               model_cfg=ExactConfig())
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=30)
    x = np.asarray(res.x)
    assert float(np.sum(x ** 2)) <= 1.69 + 1e-6
    assert abs(x[0] - x[1]) < 0.1


def test_nl_eq_exact_model_converges_to_manifold():
    mop = _base()
    mop.add_nl_eq_constraint(lambda x: x[0] + x[1] ** 2 - 1.0,
                             model_cfg=ExactConfig())
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=40)
    x = np.asarray(res.x)
    assert abs(x[0] + x[1] ** 2 - 1.0) < 1e-4


def test_nl_ineq_rbf_model_infeasible_start():
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="cubic")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    mop.add_nl_ineq_constraint(lambda x: jnp.sum(x ** 2) - 1.0, model_cfg=cfg)
    res = optimize(mop, jnp.array([2.0, 2.0]), max_iter=30)
    x = np.asarray(res.x)
    assert float(np.sum(x ** 2)) <= 1.0 + 1e-3
    assert int(res.stop_code) in (STOP_CODE.CRITICAL, STOP_CODE.TOLERANCE,
                                  STOP_CODE.MAX_ITER)
