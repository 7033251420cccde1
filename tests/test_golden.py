"""Golden-trajectory regression lock (cross-round determinism).

Locks the float64 trajectory of the BASELINE.json config-2 run (two-parabolas
with multiquadric RBF surrogates) against a committed file. If an
*intentional* algorithm change shifts the trajectory, regenerate with::

    python - <<'EOF'
    import jax
    jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from morbit_tpu.core.mop import MOP
    from morbit_tpu.core.algorithm import optimize
    from morbit_tpu.models.configs import RbfConfig
    from morbit_tpu.utils.parity import export_trajectory
    mop = MOP([-4.,-4.],[4.,4.]); cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    res = optimize(mop, jnp.array([-3.141592653589793, 2.71828]), max_iter=15)
    export_trajectory(res, "tests/golden/two_parabolas_rbf_mq_f64.json")
    EOF
"""

import json
import os

import jax.numpy as jnp

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.utils.parity import compare_trajectories, export_trajectory

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "two_parabolas_rbf_mq_f64.json")


def test_trajectory_matches_golden():
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    res = optimize(mop, jnp.array([-3.141592653589793, 2.71828]), max_iter=15)
    doc = export_trajectory(res)
    with open(GOLDEN) as f:
        golden = json.load(f)
    rep = compare_trajectories(doc, golden, x_tol=1e-10)
    assert rep["parity"], rep


def test_zdt1_rbf_trajectory_matches_golden():
    """BASELINE config 3 lock: ZDT1 n=10, cubic RBF objectives, f64."""
    import numpy as np
    from morbit_tpu.problems.synthetic import make_zdt

    mop = make_zdt("zdt1", 10, model_cfg=RbfConfig(kernel="cubic"))
    x0 = jnp.asarray(np.linspace(0.15, 0.85, 10))
    res = optimize(mop, x0, max_iter=20, f_tol_rel=1e-6, x_tol_rel=1e-6)
    doc = export_trajectory(res)
    with open(os.path.join(os.path.dirname(__file__), "golden",
                           "zdt1_n10_rbf_cubic_f64.json")) as f:
        golden = json.load(f)
    rep = compare_trajectories(doc, golden, x_tol=1e-10)
    assert rep["parity"], rep


def test_lagrange2_trajectory_matches_golden():
    """Lagrange degree-2 lock (poised-set construction + static stamp path,
    ``src/models/LagrangeModel.jl``); regenerate like the module docstring
    with ``LagrangeConfig(degree=2)``."""
    from morbit_tpu.models.configs import LagrangeConfig

    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = LagrangeConfig(degree=2)
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    res = optimize(mop, jnp.array([-3.141592653589793, 2.71828]), max_iter=15)
    doc = export_trajectory(res)
    with open(os.path.join(os.path.dirname(__file__), "golden",
                           "two_parabolas_lagrange2_f64.json")) as f:
        golden = json.load(f)
    rep = compare_trajectories(doc, golden, x_tol=1e-10)
    assert rep["parity"], rep


def test_taylor_fd2_trajectory_matches_golden():
    """Taylor degree-2 finite-difference lock (2-phase FD stamps through the
    database, ``src/models/TaylorModel.jl:70-93``)."""
    from morbit_tpu.models.configs import TaylorConfig

    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = TaylorConfig(degree=2, mode="fd")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    res = optimize(mop, jnp.array([-3.141592653589793, 2.71828]), max_iter=15)
    doc = export_trajectory(res)
    with open(os.path.join(os.path.dirname(__file__), "golden",
                           "two_parabolas_taylor_fd2_f64.json")) as f:
        golden = json.load(f)
    rep = compare_trajectories(doc, golden, x_tol=1e-10)
    assert rep["parity"], rep


def test_ps_descent_trajectory_matches_golden():
    """Pascoletti-Serafini descent lock (Halton sweep + PGA subsolver,
    ``src/descent.jl:404-510``)."""
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    res = optimize(mop, jnp.array([-3.141592653589793, 2.71828]), max_iter=15,
                   descent_method="ps")
    doc = export_trajectory(res)
    with open(os.path.join(os.path.dirname(__file__), "golden",
                           "two_parabolas_rbf_ps_f64.json")) as f:
        golden = json.load(f)
    rep = compare_trajectories(doc, golden, x_tol=1e-10)
    assert rep["parity"], rep


def test_constrained_filter_trajectory_matches_golden():
    """BASELINE config 4 lock: linear + NL inequality constraints with the
    filter/restoration machinery, f64."""
    from morbit_tpu.models.configs import ExactConfig

    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    mop.add_ineq_constraint([[1.0, 1.0]], [1.0])
    mop.add_nl_ineq_constraint(lambda x: jnp.sum(x ** 2) - 2.25,
                               model_cfg=ExactConfig())
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=25)
    doc = export_trajectory(res)
    with open(os.path.join(os.path.dirname(__file__), "golden",
                           "constrained_filter_f64.json")) as f:
        golden = json.load(f)
    rep = compare_trajectories(doc, golden, x_tol=1e-10)
    assert rep["parity"], rep
    assert "RESTORATION" in doc["it_stat"]
