"""RefVecFun value sharing: the same callable registered several times is one
function, evaluated once per site.

Reference: ``src/VecFun.jl:13-98`` (``RefVecFun``) and
``_optimized_evaluate_at_unscaled_site`` (``src/MOP.jl:302-350``): an inner
function referenced by several objectives/constraints is evaluated once per
site via a per-site temp dict. The TPU-native analogue dedupes identical
callables at compile time (``compile_mop``): duplicates collapse onto one
group slot whose output slice every registration reads, and the shared group
eval counter mirrors the shared ``CountedFunc``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.core.mop import MOP, compile_mop
from morbit_tpu.models.configs import ExactConfig, RbfConfig


def parab(x):
    return jnp.sum((x - 1.0) ** 2)[None]


def other(x):
    return jnp.sum((x + 1.0) ** 2)[None]


def test_same_callable_two_objectives_one_group():
    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    cfg = RbfConfig(kernel="cubic")
    mop.add_objective(parab, model_cfg=cfg)
    mop.add_objective(parab, model_cfg=cfg)
    mop.add_objective(other, model_cfg=cfg)
    cm = compile_mop(mop, combine_models=True)

    # parab occupies ONE slot; the group evaluates parab once + other once
    assert cm.m_obj == 3
    g = cm.groups[0]
    assert g.m == 2  # not 3: the duplicate shares a slot
    x = jnp.asarray([0.3, -0.7])
    vals = g.eval_unscaled(x)
    assert vals.shape == (2,)

    fx, _, _ = cm.scatter_role_vectors([vals], jnp.float64, x)
    assert fx[0] == fx[1] == pytest.approx(float(parab(x)[0]))
    assert fx[2] == pytest.approx(float(other(x)[0]))


def test_shared_objective_and_constraint_count_once():
    """One callable as objective AND nl-inequality constraint: a single true
    evaluation per site feeds both roles (the RefVecFun share across roles)."""
    from morbit_tpu.core.config import AlgorithmConfig
    from morbit_tpu.models.container import SurrogateContainer
    from morbit_tpu.core import scaling

    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    cfg = RbfConfig(kernel="cubic")
    mop.add_objective(parab, model_cfg=cfg)
    mop.add_nl_ineq_constraint(parab, model_cfg=cfg)
    cm = compile_mop(mop, combine_models=True)
    assert len(cm.groups) == 1 and cm.groups[0].m == 1
    assert cm.m_obj == 1 and cm.m_ci == 1

    ac = AlgorithmConfig(max_iter=3)
    scal = scaling.get_var_scaler(jnp.asarray(cm.lb), jnp.asarray(cm.ub),
                                  ac.var_scaler)
    ct = SurrogateContainer(cm, jnp.float64, ac, scal, db_capacity=16)
    states = ct.init_group_states()
    x_s = scaling.transform(scal, jnp.asarray([0.5, 0.5]))
    fx, c_e, c_i, states, _ = ct.evaluate_true(states, x_s, scal)
    assert int(states[0].n_evals) == 1  # once, not twice
    assert fx[0] == pytest.approx(float(c_i[0]))


def test_shared_budget_takes_min():
    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    cfg = RbfConfig(kernel="cubic")
    mop.add_objective(parab, model_cfg=cfg, max_evals=100)
    mop.add_objective(parab, model_cfg=cfg, max_evals=7)
    cm = compile_mop(mop)
    assert cm.groups[0].max_evals == 7


def test_distinct_callables_not_merged():
    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    mop.add_objective(parab, model_cfg=ExactConfig())
    mop.add_objective(other, model_cfg=ExactConfig())
    cm = compile_mop(mop)
    assert len(cm.groups) == 2


def test_shared_solve_matches_single():
    """Optimizing [f, f] follows the same trajectory as optimizing [f] twice
    over: identical model, identical criticality, identical iterates."""
    from morbit_tpu import optimize

    mop2 = MOP([-2.0, -2.0], [2.0, 2.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop2.add_objective(parab, model_cfg=cfg)
    mop2.add_objective(parab, model_cfg=cfg)
    res2 = optimize(mop2, [0.5, -0.5], max_iter=6)

    np.testing.assert_allclose(np.asarray(res2.fx)[0], np.asarray(res2.fx)[1],
                               rtol=0, atol=0)
    # the shared function was evaluated like a single-objective run
    mop1 = MOP([-2.0, -2.0], [2.0, 2.0])
    mop1.add_objective(parab, model_cfg=cfg)
    res1 = optimize(mop1, [0.5, -0.5], max_iter=6)
    assert int(res2.n_evals) == int(res1.n_evals)
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(res1.x),
                               rtol=1e-10)


def test_composite_over_duplicate_inner():
    """A composite may reference a duplicate registration; it resolves to the
    canonical slot."""
    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    cfg = RbfConfig(kernel="cubic")
    i1 = mop.add_function(parab, model_cfg=cfg)
    i2 = mop.add_function(parab, model_cfg=cfg)  # duplicate
    mop.add_objective(other, model_cfg=cfg)
    mop.add_composite_objective(lambda x, g: g[0] + 1.0, i2)
    cm = compile_mop(mop)
    cs = cm.composites[0]
    # canonical slot of parab
    assert (cs.group_index, cs.group_offset) == (0, 0)
    x = jnp.asarray([0.1, 0.2])
    vals = cm.groups[0].eval_unscaled(x)
    fx, _, _ = cm.scatter_role_vectors([vals], jnp.float64, x)
    assert fx[1] == pytest.approx(float(parab(x)[0]) + 1.0)
