"""Does returning the full SolverState through the tunnel cost real time?

Compares the bench's jit(vmap(solve)) returning the full OptimizeResult vs
a slim payload (x, fx, codes + summed trajectory to keep the stamping work
alive against DCE).

Run:  python tools/profile_outputs.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas


def timed(f, x0, reps=5):
    out = f(x0)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x0)
    for leaf in jax.tree_util.tree_leaves(out):
        jax.block_until_ready(leaf)
    return (time.perf_counter() - t0) / reps


def main():
    B = 1024
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=10, qp_iters=100)
    solver = build_solver(mop, ac, dtype)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)
    print("platform:", jax.devices()[0].platform)

    full = jax.jit(jax.vmap(solver.solve))
    t_full = timed(full, x0)
    print(f"full OptimizeResult:  {t_full*1e3:8.1f} ms -> {B/t_full:7.1f} runs/s")

    def slim_solve(x0_row):
        res = solver.solve(x0_row)
        traj_alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
        return (res.x, res.fx, res.stop_code, res.n_iterations, res.n_evals,
                traj_alive)

    slim = jax.jit(jax.vmap(slim_solve))
    t_slim = timed(slim, x0)
    print(f"slim payload:         {t_slim*1e3:8.1f} ms -> {B/t_slim:7.1f} runs/s")


if __name__ == "__main__":
    main()
