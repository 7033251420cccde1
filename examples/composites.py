"""Composite & re-used functions — one surrogate per expensive inner function.

Mirrors the intent of the reference walkthrough
``examples/composites.jl`` / ``docs/src/composites.md``: an expensive inner
function ``g: R^n -> R^m`` is registered ONCE and re-used by several cheap
outer functions ``f_l(x) = phi_l(x, g(x))``; only ``g`` gets a surrogate,
and the outer Jacobians combine by the chain rule
(``D f = [D_x phi  D_y phi] [I; Dg]``, see ``VecFun.jl:13-98`` /
``SurrogateContainer.jl:193-229`` analogues in
``morbit_tpu/models/container.py``).

Run: python examples/composites.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from morbit_tpu import MOP, RbfConfig, optimize

# ---------------------------------------------------------------------------
# An "expensive" vector-valued inner function g(x) = (||x - a||^2, ||x + a||^2).
# Pretend each call is costly: we want ONE model of g shared by everything
# below, and every true evaluation counted once.
a = jnp.array([1.0, 1.0])


def g(x):
    return jnp.stack([jnp.sum((x - a) ** 2), jnp.sum((x + a) ** 2)])


mop = MOP([-4.0, -4.0], [4.0, 4.0])
gidx = mop.add_function(g, n_out=2, model_cfg=RbfConfig(kernel="cubic"))

# Objective 1: phi_1(x, y) = y_0            (g's first output, re-used as-is)
mop.add_composite_objective(lambda x, y: y[0], gidx)
# Objective 2: phi_2(x, y) = y_1 + 0.1 x_0  (cheap outer with known AD path)
mop.add_composite_objective(lambda x, y: y[1] + 0.1 * x[0], gidx)
# Constraint built on the SAME inner function: stay inside ||x-a||^2 <= 9
# (the objective "doubles as a constraint" case from the reference docs)
mop.add_composite_nl_ineq_constraint(lambda x, y: y[0] - 9.0, gidx)

# Outer functions can also be expression strings (the reference's
# ``GeneralizedGenerated`` path, ``VecFun.jl`` `outer_fn_from_expr`):
mop2 = MOP([-4.0, -4.0], [4.0, 4.0])
g2 = mop2.add_function(g, n_out=2, model_cfg=RbfConfig(kernel="cubic"))
mop2.add_composite_objective("g[0]", g2)
mop2.add_composite_objective("g[1] + 0.1 * x[0]", g2)

x0 = jnp.array([2.0, -1.5])
res = optimize(mop, x0, max_iter=30, verbosity=1)
print("x* =", np.asarray(res.x).round(4), " f* =", np.asarray(res.fx).round(4))

# Only ONE surrogate group exists (the inner g); its evaluation counter is
# the total number of true g-calls — the two objectives and the constraint
# did not triple the cost.
assert len(res.state.groups) == 1, "inner function must be modelled once"
print("true evaluations of g:", int(res.n_evals))

res2 = optimize(mop2, x0, max_iter=30)
print("expr-outer variant lands at", np.asarray(res2.x).round(4))
