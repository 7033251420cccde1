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


def test_use_db_false_taylor_stencil_capacity():
    """Round-2 review regression: the auto db capacity must fit a Taylor
    degree-2 FD stencil (2n^2+2n+1 sites/rebuild) — with the RBF-shaped
    heuristic the n=5 stencil silently overflowed under ``use_db=False``
    (add_site -> -1 -> zero-valued fits) and the trajectory diverged."""
    import jax.numpy as jnp
    import numpy as np

    from morbit_tpu import optimize
    from morbit_tpu.core.mop import MOP
    from morbit_tpu.models.configs import TaylorConfig

    n = 5

    def build():
        mop = MOP([-2.0] * n, [2.0] * n)
        cfg = TaylorConfig(degree=2)
        mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2)[None], model_cfg=cfg)
        mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2)[None], model_cfg=cfg)
        return mop

    x0 = [0.5, -0.5, 0.25, -0.25, 0.1]
    res_db = optimize(build(), x0, max_iter=6)
    res_nodb = optimize(build(), x0, max_iter=6, use_db=True and False)
    # no silent truncation: identical iterates with and without history
    np.testing.assert_allclose(np.asarray(res_nodb.x), np.asarray(res_db.x),
                               rtol=0, atol=1e-12)
    # the training indices never went out of range
    st = res_nodb.state
    assert all(int(g.db.count) <= g.db.X.shape[0] for g in st.groups)
    for g in st.groups:
        assert int(jnp.min(g.model.site_idx)) >= 0
