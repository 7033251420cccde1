"""The initial-steplength problem — closed-form feasible-ray intersection.

Mirrors the intent of the reference notebook
``examples/notebook_steplength.jl``: given an iterate ``x`` and a descent
direction ``d``, the backtracking line search needs the LARGEST step
``sigma* = max { sigma >= 0 : x + sigma*d feasible and inside B(x; Delta) }``.
Taking the safe fallback ``sigma* = min(||d||, Delta)`` can make steps far
too short once ``Delta > 1`` or linear constraints cut the ray — that is
the notebook's whole point.

The reference solves this with the closed-form ``_intersect_bounds``
(``src/utilities.jl:156-281``); the rebuild's traced equivalent is
``morbit_tpu.ops.geometry.intersect_bounds`` — per-constraint crossing
sigmas as one masked reduction, no LP, vmappable. This example walks the
same three cases as the notebook and shows the solver consuming it.

Run: python examples/steplength.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from morbit_tpu import MOP, optimize
from morbit_tpu.ops.geometry import intersect_bounds, local_bounds

x = jnp.array([0.2, 0.5])
d = jnp.array([1.0, 0.25])
d = d / jnp.linalg.norm(d)

# --- case 1: box only -------------------------------------------------------
lb, ub = jnp.zeros(2), jnp.ones(2)
s_box = float(intersect_bounds(x, d, lb, ub))
print(f"box only:                sigma* = {s_box:.4f}  "
      f"(x + s*d = {np.asarray(x + s_box * d).round(4)})")
assert np.all(np.asarray(x + s_box * d) <= 1.0 + 1e-12)

# --- case 2: box + trust region --------------------------------------------
# the trust region B_inf(x; Delta) is itself a box: intersect the two
# (``local_bounds``, the reference's ``_local_bounds``/``utilities.jl:290-300``)
delta = 0.3
tlb, tub = local_bounds(x, delta, lb, ub)
s_tr = float(intersect_bounds(x, d, tlb, tub))
print(f"box + trust region:      sigma* = {s_tr:.4f}  (Delta = {delta})")
assert s_tr <= s_box + 1e-12

# --- case 3: + linear inequality constraints --------------------------------
# A x <= b with the ray crossing one of the constraint planes first
A = jnp.array([[1.0, 1.0]])
b = jnp.array([1.0])
s_lin = float(intersect_bounds(x, d, tlb, tub, A_ineq=A, b_ineq=b))
xe = np.asarray(x + s_lin * d)
print(f"+ linear constraint:     sigma* = {s_lin:.4f}  "
      f"(A(x+s*d) = {float((A @ (x + s_lin * d))[0]):.4f} <= 1)")
assert float((A @ (x + s_lin * d))[0]) <= 1.0 + 1e-12

# the naive fallback fails both ways: at Delta=0.3 it truncates to 0.3000
# (the inf-norm trust box allows 0.3092 along this diagonal), and at
# Delta=2 it returns min(||d||, 2) = 1.0 — an INFEASIBLE step, since the
# box already stops the ray at 0.8246.
s2 = float(intersect_bounds(x, d, *local_bounds(x, 2.0, lb, ub)))
print(f"naive min(||d||, Delta): sigma = {min(1.0, delta):.4f} (short: exact "
      f"{s_tr:.4f}); at Delta=2 sigma = 1.0000 (infeasible: exact {s2:.4f})")

# --- inside the solver -------------------------------------------------------
# compute_descent_step seeds Armijo backtracking with exactly this sigma*
# (``descent.jl:253-310`` analogue in morbit_tpu/core/descent.py), so the
# first trial point always sits on the trust-region/feasible-set boundary.
mop = MOP([0.0, 0.0], [1.0, 1.0])
mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2)[None])
mop.add_exact_objective(lambda x: jnp.sum(x ** 2)[None])
mop.add_ineq_constraint([[1.0, 1.0]], [1.0])
res = optimize(mop, jnp.array([0.2, 0.5]), max_iter=20)
xf = np.asarray(res.x)
print(f"constrained solve from the notebook geometry: x* = {xf.round(4)}, "
      f"A x* = {xf.sum():.4f} <= 1")
assert xf.sum() <= 1.0 + 1e-8
