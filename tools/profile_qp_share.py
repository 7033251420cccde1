"""How much of the reference-default-budget solve is QP splitting steps?

Times the full sustained solve at max_iter=100 with qp_iters in
{100, 200, 400} (kernel on). The slope vs qp_iters is the pure splitting
cost; the intercept is everything else (model rebuilds, glue, copies).

NOTE: qp_iters is algorithmic — fewer iterations can change trajectories
and therefore trip counts; this is a bounding measurement, not a proposal
to lower the budget.

Run on the TPU tunnel:  python tools/profile_qp_share.py
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

B = 1024


def run_config(qp_iters, n_rep=6):
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=100, qp_iters=qp_iters)
    solver = build_solver(mop, ac, dtype)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)

    def slim(x0_row):
        res = solver.solve(x0_row)
        traj_alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
        return (res.x, res.fx, res.stop_code, res.n_iterations, res.n_evals,
                traj_alive)

    run = jax.jit(jax.vmap(slim))
    out = run(x0)
    jax.block_until_ready(out[0])
    import numpy as np
    iters = np.asarray(out[3])
    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), dtype))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)
    t0 = time.perf_counter()
    outs = [run(xi) for xi in x0s]
    jax.block_until_ready(outs[-1][0])
    dt = (time.perf_counter() - t0) / n_rep
    print(f"qp_iters={qp_iters:4d}: {dt*1e3:8.1f} ms/batch sustained  "
          f"(max lane iters {iters.max()}, mean {iters.mean():.1f})")
    return dt


def main():
    print("platform:", jax.devices()[0].platform, " B =", B,
          " max_iter=100")
    t100 = run_config(100)
    t200 = run_config(200)
    t400 = run_config(400)
    slope = (t400 - t100) / 300.0
    print(f"splitting-step slope: {slope*1e6:8.2f} us/step/batch; "
          f"400-iter QP share ~= {slope*400/t400*100:5.1f}% of the solve "
          f"(mid point 200: {t200*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
