"""Mapping a Pareto front: ZDT3 with Pascoletti-Serafini multistart.

Mirrors the intent of the reference walkthrough ``examples/example_zdt.jl``:
solve a ZDT problem from many starting points with the Pascoletti-Serafini
scalarization toward a reference (ideal) point, and inspect how the final
iterates cover the (disconnected) front. The reference plots with
CairoMakie; here we print coverage statistics so the example stays
dependency-free — the returned arrays plug straight into matplotlib.

The TPU-native twist: the whole multistart fleet is ONE batched solve
(``multistart_optimize``), or a staged straggler-free one
(``compacted_multistart``) for large fleets.

Run: python examples/zdt_front.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from morbit_tpu import AlgorithmConfig, optimize
from morbit_tpu.core.descent import PascolettiSerafiniConfig
from morbit_tpu.parallel.multistart import multistart_optimize
from morbit_tpu.problems.synthetic import halton_starts, make_zdt, zdt_front

N_VARS = 5
N_STARTS = 16

mop = make_zdt("zdt3", N_VARS)  # exact objectives (cheap analytic problem)

# Pascoletti-Serafini toward the ideal point (the reference example passes
# ``reference_point = get_ideal_point(...)``; ZDT3's ideal is ~(0, -0.773)).
# n_samples keeps this walkthrough snappy; dropping it uses the
# reference-default 500*(n+1)-point global sweep (docs/guide.md)
ps = PascolettiSerafiniConfig(reference_point=(0.0, -0.8), n_samples=256)
ac = AlgorithmConfig(descent_method=ps, max_iter=20, qp_iters=100)

x0 = halton_starts(N_STARTS, mop.lb, mop.ub)
res = multistart_optimize(mop, x0, ac, dtype=jnp.float64)

fx = np.asarray(res.fx)
front = zdt_front("zdt3", 512)  # dense sampling of the analytic front
# distance of each final value to the analytic front
d = np.min(np.linalg.norm(fx[:, None, :] - front[None, :, :], axis=-1),
           axis=1)
print("front distances per start:", d.round(3))
print(f"median front distance: {np.median(d):.3f}  "
      f"(converged: {(d < 0.05).sum()}/{N_STARTS})")
print("f1 spread across the front:",
      f"[{fx[:, 0].min():.3f}, {fx[:, 0].max():.3f}]")

# single-run variant with live logging, as in the reference walkthrough
res1 = optimize(mop, x0[0], algo_config=ac, dtype=jnp.float64, verbosity=1)
print("single run lands at f =", np.asarray(res1.fx).round(4))
