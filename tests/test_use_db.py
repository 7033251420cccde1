"""``use_db = false`` / MockDB analogue (``Databases.jl:11-32``,
``AbstractConfigInterface.jl:22``): run without storing evaluation history."""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import ExactConfig, RbfConfig


def _exact_mop():
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    return mop


def test_use_db_false_identical_iterates_exact_models():
    """History never feeds exact models, so disabling storage must not
    change the iterates (the MockDB-vs-ArrayDB equivalence on runs whose
    models ignore the database)."""
    x0 = jnp.array([-3.0, 2.5])
    r1 = optimize(_exact_mop(), x0, max_iter=15)
    r2 = optimize(_exact_mop(), x0, max_iter=15, use_db=False)
    c1, c2 = int(r1.state.traj.count), int(r2.state.traj.count)
    assert c1 == c2
    assert np.allclose(np.asarray(r1.state.traj.x[:c1]),
                       np.asarray(r2.state.traj.x[:c2]), atol=1e-12)
    assert int(r1.stop_code) == int(r2.stop_code)


def test_use_db_false_rbf_tiny_capacity_still_solves():
    """RBF models lose cross-iteration point reuse (like MockDB) but the
    solver still converges; the database stays at working-set size."""
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=15, use_db=False)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.2  # near the Pareto set x1 == x2
    ac = AlgorithmConfig(use_db=False)
    cap = ac.resolved_db_capacity(2, cfg.resolved_max_points(2))
    assert res.state.groups[0].db.X.shape[0] == cap
    # capacity is O(model points), independent of max_iter
    assert cap < AlgorithmConfig().resolved_db_capacity(
        2, cfg.resolved_max_points(2))
