"""Measure whether lane compaction pays at the reference-default budget.

The reference-default point (max_iter=100, qp_iters=400) is straggler-bound:
in a vmapped solve the while-loop batching rule keeps executing the body for
ALL lanes until the slowest lane stops.  Compaction (gathering the still
active lanes into a smaller batch between stages) only pays if

  (a) most lanes converge early (iteration distribution is front-loaded), and
  (b) per-iteration device time actually shrinks with batch size (the body is
      throughput-bound, not launch-latency-bound).

This script measures both:
  1. the n_iterations histogram at B=1024,
  2. steady-state full-solve time at B in {1024, 512, 256, 128, 64}.

Run on the TPU tunnel:  python tools/profile_compaction.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas

MAX_ITER = 100
QP_ITERS = 400


def build(B):
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=MAX_ITER, qp_iters=QP_ITERS)
    solver = build_solver(mop, ac, dtype)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)

    def slim(row):
        res = solver.solve(row)
        traj_alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
        return (res.x, res.fx, res.stop_code, res.n_iterations, res.n_evals,
                traj_alive)

    return jax.jit(jax.vmap(slim)), x0


def steady(run, x0, n_rep=3):
    out = run(x0)
    jax.block_until_ready(out[0])
    xs = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), x0.dtype))
          for i in range(n_rep)]
    jax.block_until_ready(xs)
    t0 = time.perf_counter()
    outs = [run(xi) for xi in xs]
    jax.block_until_ready(outs[-1][0])
    dt = (time.perf_counter() - t0) / n_rep
    return dt, outs[-1]


def main():
    print("platform:", jax.devices()[0].platform)

    run, x0 = build(1024)
    dt, out = steady(run, x0)
    iters = np.asarray(out[3])
    print(f"B=1024 steady {dt * 1e3:8.1f} ms/batch  "
          f"{1024 / dt:8.1f} runs/s")
    qs = np.percentile(iters, [10, 25, 50, 75, 90, 95, 99, 100])
    print("n_iterations percentiles [10,25,50,75,90,95,99,100]:",
          np.round(qs, 1).tolist())
    print("mean iters:", round(float(iters.mean()), 1))
    # active lanes after k iterations
    for k in [5, 10, 15, 20, 30, 40, 60, 80, 99]:
        print(f"  active after {k:3d} iters: {(iters > k).sum():5d}")

    for B in [512, 256, 128, 64]:
        run, x0 = build(B)
        dt, _ = steady(run, x0)
        print(f"B={B:5d} steady {dt * 1e3:8.1f} ms/batch  "
              f"{B / dt:8.1f} runs/s  ({dt * 1e3 / MAX_ITER:6.2f} ms/iter "
              f"upper bound)")


if __name__ == "__main__":
    main()
