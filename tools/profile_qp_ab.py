"""A/B the lane-batched fused ADMM kernel inside the full solver.

Measures sustained ms/batch for the reference-default budget
(max_iter=100, qp_iters=400) and the bench config (max_iter=10,
qp_iters=100) at B=1024, with the fused QP kernel ON (default) vs OFF
(MORBIT_QP_LANE=0 analogue via module flag). The standalone QP microbench
is misleading in both directions: the in-solver XLA splitting loop costs
several times its standalone cost (surrounding while_loop/cond context
breaks fusion), while the kernel's cost is context-immune.

Run on the TPU tunnel:  python tools/profile_qp_ab.py [reps]
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


def run_config(tag, max_iter, qp_iters, n_rep):
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=qp_iters)
    solver = build_solver(mop, ac, dtype)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)

    def slim(x0_row):
        res = solver.solve(x0_row)
        traj_alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
        return (res.x, res.fx, res.stop_code, res.n_iterations, res.n_evals,
                traj_alive)

    run = jax.jit(jax.vmap(slim))
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out[0])
    compile_s = time.perf_counter() - t0

    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), dtype))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)
    t0 = time.perf_counter()
    outs = [run(xi) for xi in x0s]
    jax.block_until_ready(outs[-1][0])
    dt = (time.perf_counter() - t0) / n_rep
    print(f"{tag}: compile+1st {compile_s:.1f}s  sustained "
          f"{dt*1e3:.1f} ms/batch  {B/dt:.0f} runs/s", flush=True)
    return dt


def main():
    n_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import morbit_tpu.ops.qp_lane as qpl

    print("platform:", jax.devices()[0].platform, flush=True)
    for on in (True, False):
        qpl.QP_LANE = on
        state = "fusedQP" if on else "plainQP"
        run_config(f"bench-config  {state}", 10, 100, max(n_rep, 8))
        run_config(f"ref-default   {state}", 100, 400, n_rep)


if __name__ == "__main__":
    main()
