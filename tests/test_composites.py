"""Composite function tests: phi(x, g(x)) with modelled inner function.

Reference: ``CompositeVecFun`` (``src/VecFun.jl``) + ``CompositeSurrogate``
chain rule (``AbstractSurrogateInterface.jl:193-229``); also covers the
``RefVecFun`` sharing pattern (several objectives referencing one inner
function, evaluated once per site).
"""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import Solver, optimize
from morbit_tpu.core.mop import MOP, compile_mop
from morbit_tpu.models.configs import ExactConfig, RbfConfig


def test_composite_objectives_share_inner_function():
    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    gidx = mop.add_function(lambda x: jnp.stack([x[0] - 1.0, x[1] + 1.0]),
                            n_out=2, model_cfg=RbfConfig(kernel="cubic"))
    mop.add_composite_objective(lambda x, g: jnp.sum(g ** 2) + 0.1 * x[0], gidx)
    mop.add_composite_objective(lambda x, g: (g[0] - 2.0) ** 2 + g[1] ** 2, gidx)

    cmop = compile_mop(mop)
    assert cmop.m_obj == 2
    assert len(cmop.composites) == 2
    # one shared group for the inner function
    assert cmop.composites[0].group_index == cmop.composites[1].group_index

    res = optimize(cmop, jnp.array([1.5, -1.5]), max_iter=15)
    x = np.asarray(res.x)
    assert np.all(np.isfinite(x))
    # Pareto trade-off between minima (1,-1) and (3,-1): x2 -> -1
    assert abs(x[1] + 1.0) < 0.2
    assert int(res.n_evals) <= 30


def test_composite_surrogate_values_and_jacobian():
    """Container evals/jacs of composites match truth when the inner model is
    exact (the composed chain rule through autodiff)."""
    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    gidx = mop.add_function(lambda x: jnp.stack([x[0] * x[1], x[0] + x[1]]),
                            n_out=2, model_cfg=ExactConfig())
    mop.add_composite_objective(lambda x, g: g[0] ** 2 + 2.0 * g[1] + x[1], gidx)
    cmop = compile_mop(mop)
    solver = Solver(cmop)
    st = solver.initialize(jnp.array([0.5, -0.3]))

    xq = st.x_s
    mx, _ = solver.container.eval_objectives(st.groups, xq, st.scal)

    def truth(xu):
        g = jnp.stack([xu[0] * xu[1], xu[0] + xu[1]])
        return g[0] ** 2 + 2.0 * g[1] + xu[1]

    import jax
    from morbit_tpu.core import scaling
    xu = scaling.untransform(st.scal, xq)
    assert np.isclose(float(mx[0]), float(truth(xu)), atol=1e-10)

    J = solver.container.jac_objectives(st.groups, xq, st.scal)
    J_true = jax.grad(lambda xs: truth(scaling.untransform(st.scal, xs)))(xq)
    assert np.allclose(np.asarray(J[0]), np.asarray(J_true), atol=1e-8)


def test_composite_nl_constraint():
    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    gidx = mop.add_function(lambda x: jnp.sum(x ** 2)[None],
                            n_out=1, model_cfg=ExactConfig())
    mop.add_composite_nl_ineq_constraint(lambda x, g: g[0] - 1.0, gidx)
    res = optimize(mop, jnp.array([1.5, 1.5]), max_iter=20)
    x = np.asarray(res.x)
    assert float(np.sum(x ** 2)) <= 1.0 + 1e-4
