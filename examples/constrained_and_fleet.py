"""Constrained solving + Pareto-front mapping with a multistart fleet.

Run: python examples/constrained_and_fleet.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from morbit_tpu import AlgorithmConfig, ExactConfig, MOP, RbfConfig, optimize
from morbit_tpu.parallel.multistart import multistart_optimize
from morbit_tpu.problems.synthetic import halton_starts, make_zdt

# --- constrained: two parabolas restricted to a disk -----------------------
mop = MOP([-4.0, -4.0], [4.0, 4.0])
mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
mop.add_ineq_constraint([[1.0, 1.0]], [0.5])                     # x1+x2 <= 0.5
mop.add_nl_ineq_constraint(lambda x: jnp.sum(x ** 2) - 1.69,     # disk r=1.3
                           model_cfg=ExactConfig())

res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=30, verbosity=1)
x = np.asarray(res.x)
print("constrained solution:", x, "theta:",
      max(0.0, float(x.sum() - 0.5), float((x ** 2).sum() - 1.69)))

# --- fleet: map the ZDT1 front with a 64-way multistart ---------------------
zdt = make_zdt("zdt1", 5, model_cfg=RbfConfig(kernel="cubic"))
starts = halton_starts(64, zdt.lb, zdt.ub)
fleet = multistart_optimize(zdt, starts, AlgorithmConfig(max_iter=25),
                            dtype=jnp.float64)
fx = np.asarray(fleet.fx)
order = np.argsort(fx[:, 0])
print("ZDT1 front sample (f1, f2):")
for i in order[:: max(1, len(order) // 10)]:
    print(f"  {fx[i, 0]:.3f}  {fx[i, 1]:.3f}")
