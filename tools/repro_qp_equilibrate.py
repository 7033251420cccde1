"""Repro: fixed-budget ADMM stalls on mixed-scale LP rows (round-4 fix).

The steepest-descent LP (``descent.jl:91-135``) pairs model-Jacobian rows
``[Dm_i, -||Dm_i||]`` of inf-norm ~50 with unit box rows. Without row
equilibration the splitting loop stalls (pr ~ 5e-2 even at 4000 iters) and
the polish reads noisy duals -> over-determined active set -> box-violating
"solution" with omega overestimated (1.063 vs the true 1.028; caught by the
round-4 full oracle on the FIRST RBF iteration of two-parabolas). With each
row divided by its inf-norm the identical loop converges to ~1e-15.
solve_qp now performs this equilibration internally (ops/qp.py).

Run: python tools/repro_qp_equilibrate.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from morbit_tpu.ops.qp import solve_qp

Dm = np.array([[-51.2, 11.2], [-19.2, 43.2]])   # iteration-2 RBF model jac
cn = np.linalg.norm(Dm, axis=1)
x = np.array([0.125, 0.8125])
inf = np.inf
A = np.concatenate([
    np.concatenate([Dm, -cn[:, None]], axis=1),
    np.concatenate([np.eye(2), np.zeros((2, 1))], axis=1),
    np.concatenate([np.eye(2), np.zeros((2, 1))], axis=1)], axis=0)
l = np.concatenate([[-inf, -inf], [-1, -1], -x])
u = np.concatenate([[0.0, 0.0], [1, 1], 1.0 - x])
P = np.zeros((3, 3))
qv = np.array([0.0, 0.0, 1.0])

with jax.default_matmul_precision("highest"):
    s = solve_qp(jnp.asarray(P), jnp.asarray(qv), jnp.asarray(A),
                 jnp.asarray(l), jnp.asarray(u), iters=400)
z = np.asarray(s.z)
print("z =", z.round(12), " pr =", float(s.prim_res),
      " dr =", float(s.dual_res))
# HiGHS optimum: d = [0.875, -0.8125], beta = -1.0284162292511427
assert abs(z[0] - 0.875) < 1e-9 and abs(z[1] + 0.8125) < 1e-9, z
assert abs(z[2] + 1.0284162292511427) < 1e-9, z
print("equilibrated solve matches the HiGHS optimum")
