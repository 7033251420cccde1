"""Multistart convergence-quality check at the bench config.

Two-parabolas 2D: the Pareto set is the segment x1 = x2 in [-1, 1]
(minima at (1,1) and (-1,-1), ``examples/example_two_parabolas.jl``).
Prints the fraction of the 1024 multistart runs whose final iterate is
within ``TOL`` of the Pareto set — the f32 TPU quality gauge from CLAUDE.md.

Usage:  python tools/check_convergence.py [max_iter] [qp_iters]
Env:    MORBIT_PLATFORM=cpu   run on host CPU instead of the TPU tunnel
        MORBIT_DTYPE=f64      run float64 (CPU only)
        MORBIT_QP_LANE=0 / MORBIT_DISABLE_FUSED=1 / MORBIT_R4_FUSED=0
                              disable individual fused TPU kernels (A/B
                              bisect of the TPU-vs-CPU f32 quality gap,
                              round-3 VERDICT weak item 4)
"""

import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

TOL = 1e-2
BATCH = 1024


def main():
    import jax

    if os.environ.get("MORBIT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MORBIT_PLATFORM"])
    if os.environ.get("MORBIT_DTYPE") == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from morbit_tpu.core.config import AlgorithmConfig
    from morbit_tpu.models.configs import RbfConfig
    from morbit_tpu.parallel.multistart import build_solver
    from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas

    dtype = (jnp.float64 if os.environ.get("MORBIT_DTYPE") == "f64"
             else jnp.float32)
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    max_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    qp_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=qp_iters)
    solver = build_solver(mop, ac, dtype)
    x0 = jnp.asarray(halton_starts(BATCH, mop.lb, mop.ub), dtype)

    run = jax.jit(jax.vmap(lambda r: solver.solve(r).x))
    x = np.asarray(jax.block_until_ready(run(x0)))

    # distance to the segment {(t, t) : t in [-1, 1]}
    t = np.clip((x[:, 0] + x[:, 1]) / 2.0, -1.0, 1.0)
    d = np.linalg.norm(x - t[:, None], axis=1)
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "max_iter": max_iter,
        "qp_iters": qp_iters,
        "tol": TOL,
        "convergence": round(float(np.mean(d < TOL)), 4),
        "median_dist": round(float(np.median(d)), 6),
    }))


if __name__ == "__main__":
    main()
