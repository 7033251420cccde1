"""Finite differences for Taylor models — flat stencils instead of trees.

Mirrors the intent of the reference notebook
``docs/src/notebooks/notebook_finite_differences.md`` /
``examples/notebook_finite_differences.jl``: how the FD stamps
(CFD/FFD/BFD coefficient tables, ``RecursiveFiniteDifferences.jl:55-182``)
turn database evaluations into gradients and Hessians for
``TaylorConfig`` surrogates, and how accurate each scheme is.

The TPU-native twist (``morbit_tpu/models/taylor.py``): the reference
builds a symbolic recursion tree whose leaves are evaluation sites; here
the same stamp semantics are compiled ONCE into flat static coefficient
tensors, so a model fit is two dense contractions

    g = G @ Y / h        H = einsum('ijs,sm->mij', H, Y) / h^2

over the deduplicated site grid — MXU-friendly, no trees, no symbols.

Run: python examples/finite_differences.py
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

from morbit_tpu import MOP, TaylorConfig, optimize
from morbit_tpu.models.taylor import STAMPS, _build_stencil

N = 3


def f(x):  # a smooth test function with a dense Hessian
    return jnp.sin(x[0]) * jnp.cos(x[1]) + jnp.exp(0.3 * x[2]) * x[0]


x0 = np.array([0.4, -0.7, 0.2])
g_true = np.asarray(jax.grad(f)(jnp.asarray(x0)))
H_true = np.asarray(jax.hessian(f)(jnp.asarray(x0)))

# ---------------------------------------------------------------------------
# 1. Stamp accuracy: apply each first-order scheme's flat stencil directly.
#    O (S, n) are integer offsets, G (n, S) the gradient coefficients; the
#    S deduplicated sites are exactly the reference tree's leaves.
print(f"{'stamp':8s} {'sites':>5s}   grad error at h=1e-3   order (h: 1e-1 -> 1e-2)")
for stamp in ["ffd1", "bfd1", "cfd1", "cfd1_4", "cfd1_6"]:
    O, G, _ = _build_stencil(N, 1, stamp)
    errs = []
    for h in (1e-1, 1e-2, 1e-3):
        Y = np.array([f(jnp.asarray(x0 + h * o)) for o in O])
        errs.append(np.max(np.abs(G @ Y / h - g_true)))
    # order from the large-h pair — at small h the high-accuracy stamps
    # are already at the f64 roundoff floor
    order = np.log10(errs[0] / max(errs[1], 1e-17))
    print(f"{stamp:8s} {len(O):5d}   {errs[2]:.3e}              ~{order:.1f}")

# first-order forward/backward lose one order; the wide central stamps gain
# them back at the price of more sites per coordinate.

# ---------------------------------------------------------------------------
# 2. Hessians: FD-of-FD composition (the reference's recursion,
#    ``RecursiveFiniteDifferences.jl:345-433``) vs the direct
#    second-derivative diagonal stamp (an extension — tighter stencil).
for hess in ["compose", "cfd2"]:
    O, G, H = _build_stencil(N, 2, "cfd1", hess)
    Y = np.array([f(jnp.asarray(x0 + 1e-2 * o)) for o in O])
    H_fd = np.einsum("ijs,s->ij", H, Y) / 1e-2 ** 2
    print(f"hess_stamp={hess:8s} sites={len(O):3d}  "
          f"max Hessian error: {np.max(np.abs(H_fd - H_true)):.2e}")

# site dedup in action: naively the degree-2 composition touches
# n^2 * 9 = 81 sites; shared leaves collapse them to far fewer.

# ---------------------------------------------------------------------------
# 3. End-to-end: the same stencils drive TaylorConfig surrogates inside
#    optimize(); every stencil site becomes ONE counted database evaluation
#    (2-phase: enqueue sites -> one batched eval_missing -> fit).
mop = MOP([-4.0, -4.0], [4.0, 4.0])
cfg = TaylorConfig(degree=2, fd_stamp="cfd1")
mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=15)
x = np.asarray(res.x)
print(f"Taylor-2 solve: x*={x.round(4)}  evals={int(res.n_evals)}")
assert abs(x[0] - x[1]) < 0.2, "should reach the Pareto-critical diagonal"
