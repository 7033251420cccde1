"""Lagrange polynomial interpolation — poised sets and Λ-poisedness.

Mirrors the intent of the reference notebook
``docs/src/notebooks/notebook_polynomial_interpolation.md`` /
``examples/notebook_polynomial_interpolation.jl``: how ``LagrangeConfig``
surrogates pick their interpolation points. A set of p = dim Π_n^d points
is *poised* when the Lagrange basis l_1..l_p (l_i(p_j) = δ_ij) exists
(Conn et al. Algorithm 6.2, ``LagrangeModel.jl:217-288``) and
*Λ-poised* when max_i max_u |l_i(u)| ≤ Λ over the box — the constant that
bounds the interpolation error (Algorithm 6.3 point swaps,
``LagrangeModel.jl:310-382``).

The TPU-native twist (``morbit_tpu/models/lagrange.py``): the basis lives
as one (p, p) coefficient matrix over the monomials, orthogonalization is
rank-1 GEMM sweeps, and the reference's NLopt |l_i| maximization is a
grid + multistart projected-gradient ascent — all traced, static shapes.

Run: python examples/polynomial_interpolation.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

# exactness demo: run in float64 on CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from morbit_tpu import LagrangeConfig, MOP, optimize
from morbit_tpu.core import scaling
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.mop import compile_mop
from morbit_tpu.models.lagrange import LagrangeOps, monomial_exponents

N, DEGREE = 2, 2
P = len(monomial_exponents(N, DEGREE))  # dim Π_2^2 = 6

# ---------------------------------------------------------------------------
# 1. Build a Λ-poised set in [0,1]^n with the solver's own machinery
#    (the static stamp used by ``optimized_sampling=False``).
cfg = LagrangeConfig(degree=DEGREE, lambda_poise=1.5,
                     optimized_sampling=False)
mop = MOP([0.0, 0.0], [1.0, 1.0])
mop.add_objective(lambda x: jnp.sum(x ** 2)[None], model_cfg=cfg)
cm = compile_mop(mop)
ac = AlgorithmConfig()
scal = scaling.get_var_scaler(jnp.asarray(cm.lb), jnp.asarray(cm.ub),
                              ac.var_scaler)
ops = LagrangeOps(cm.groups[0], cm.n_vars, jnp.float64, ac, scal)
pts, B = ops._static_stamp()   # (p, n) poised points, (p, p) basis coeffs
pts, B = np.asarray(pts), np.asarray(B)
print(f"poised set ({P} points in [0,1]^{N}):")
print(pts.round(3))

# Lagrange property: l_i(p_j) = delta_ij (B rows are basis coefficients
# over the monomials phi)
vals = np.array([[float(B[i] @ ops._phi(jnp.asarray(p))) for p in pts]
                 for i in range(P)])
assert np.allclose(vals, np.eye(P), atol=1e-8), "l_i(p_j) must be delta_ij"
print("basis check: l_i(p_j) = delta_ij  ✓")

# Λ-poisedness: max |l_i| over the box stays below the configured bound
lams = [float(ops._maximize_abs(jnp.asarray(B[i]))[1]) for i in range(P)]
print(f"Λ = max_i max_u |l_i(u)| = {max(lams):.3f}  "
      f"(configured bound {cfg.lambda_poise})")
assert max(lams) <= cfg.lambda_poise + 1e-6

# ---------------------------------------------------------------------------
# 2. Interpolation: a degree-2 Lagrange model reproduces any quadratic
#    EXACTLY — not just at the points.
A = np.array([[2.0, 0.5], [0.5, 1.0]])


def q(x):
    return x @ A @ x - x[0] + 0.25


coef = np.array([float(q(p)) for p in pts]) @ B  # f(p_i) l_i -> monomials
u = np.random.default_rng(0).uniform(size=(100, N))
model_vals = np.array([float(coef @ ops._phi(jnp.asarray(ui))) for ui in u])
true_vals = np.array([q(ui) for ui in u])
print(f"quadratic reproduction error: "
      f"{np.max(np.abs(model_vals - true_vals)):.2e}")
assert np.max(np.abs(model_vals - true_vals)) < 1e-8

# ---------------------------------------------------------------------------
# 3. Inside optimize(): per-iteration poised sets (optimized_sampling=True)
#    re-select points from the database in the current trust region; the
#    ``save_path`` option persists the static stamp across processes.
mop2 = MOP([-4.0, -4.0], [4.0, 4.0])
lcfg = LagrangeConfig(degree=2)
mop2.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=lcfg)
mop2.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=lcfg)
res = optimize(mop2, jnp.array([-3.0, 2.5]), max_iter=15)
x = np.asarray(res.x)
print(f"Lagrange-2 solve: x*={x.round(4)}  evals={int(res.n_evals)}")
assert abs(x[0] - x[1]) < 0.2
