"""Two-parabolas example — the reference's introductory example
(``examples/example_two_parabolas.jl``) on the TPU-native stack.

Run: python examples/example_two_parabolas.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from morbit_tpu import AlgorithmConfig, MOP, RbfConfig, optimize
from morbit_tpu.utils.logging import trajectory_arrays

# exact objectives with gradient callbacks
mop = MOP(2)
mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2),
                        jac=lambda x: 2.0 * (x - 1.0))
mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2),
                        jac=lambda x: 2.0 * (x + 1.0))

x0 = jnp.array([-3.141592653589793, 2.71828])
res = optimize(mop, x0, max_iter=20, verbosity=1)
x = np.asarray(res.x)
assert abs(x[0] - x[1]) < 0.1, "x should be Pareto-critical (on the diagonal)"

# same problem with RBF surrogates (box-constrained to enable unit scaling)
mop_rbf = MOP([-4.0, -4.0], [4.0, 4.0])
cfg = RbfConfig(kernel="multiquadric")
mop_rbf.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
mop_rbf.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
res_rbf = optimize(mop_rbf, x0, max_iter=25, verbosity=1)

# database recycling: restart from a new point reusing all evaluations
res_recycled = optimize(mop_rbf, jnp.array([2.0, -2.0]), max_iter=25,
                        populated_db=res_rbf.state.groups, verbosity=1)
print("evals fresh vs recycled:", int(res_rbf.n_evals), int(res_recycled.n_evals))

# iteration sites for plotting (the reference plots db.iter_data)
traj = trajectory_arrays(res_rbf)
print("iteration sites:\n", traj["x"].round(4))
