"""Database capacity sizing: normal runs never hit the fixed-capacity limit
(overflowing adds are silent no-ops by design, so sizing must be sufficient)."""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import LagrangeConfig, RbfConfig, TaylorConfig


def _mop(cfg):
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    return mop


def test_capacity_never_exhausted():
    for cfg in (RbfConfig(kernel="multiquadric"),
                RbfConfig(kernel="cubic", use_max_points=True),
                TaylorConfig(degree=2, mode="fd"),
                LagrangeConfig(degree=2)):
        res = optimize(_mop(cfg), jnp.array([-3.0, 2.5]), max_iter=12)
        for st in res.state.groups:
            cap = st.db.X.shape[0]
            count = int(st.db.count)
            assert count < cap, (type(cfg).__name__, count, cap)
            # every valid row was evaluated (no dangling lazy sites)
            ev = np.asarray(st.db.evaluated)[:count]
            assert ev.all(), type(cfg).__name__
