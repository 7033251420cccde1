"""Variable-scaler tests: per-iteration :model rescaling + db retransform.

Reference: ``test/test_scaling.jl`` — unconstrained -> NoVarScaling, box ->
unit AffineScaling, ``var_scaler_update = :model`` changes the scaler after
one ``iterate!``.
"""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.mop import MOP
from morbit_tpu.core.scaling import get_var_scaler
from morbit_tpu.models.configs import RbfConfig


def _mop():
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    return mop


def test_default_scalers():
    s = get_var_scaler(jnp.array([-4.0, -4.0]), jnp.array([4.0, 4.0]))
    assert np.allclose(np.asarray(s.scale), 0.125)
    assert np.allclose(np.asarray(s.lb_scaled), 0.0)
    assert np.allclose(np.asarray(s.ub_scaled), 1.0)
    s2 = get_var_scaler(jnp.array([-jnp.inf, 0.0]), jnp.array([jnp.inf, 1.0]))
    assert np.allclose(np.asarray(s2.scale), 1.0)  # NoVarScaling


def test_model_scaler_update_changes_scaler_and_converges():
    res = optimize(_mop(), jnp.array([-3.0, 2.5]), max_iter=15,
                   var_scaler_update="model")
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.2
    # the :model estimator uses zero offset (``_estimate_linear_scaling``)
    # vs the initial unit-cube scaler's nonzero offset
    assert np.allclose(np.asarray(res.state.scal.offset), 0.0)
    assert np.allclose(np.asarray(res.state.scal.scale), 0.125, atol=1e-8)
    # database rows were retransformed consistently: untransforming the
    # iterate's stored row gives the unscaled iterate
    g0 = res.state.groups[0]
    row = np.asarray(g0.db.X)[int(res.state.x_indices[0])]
    x_unscaled = row / np.asarray(res.state.scal.scale)
    assert np.allclose(x_unscaled, x, atol=1e-8)
