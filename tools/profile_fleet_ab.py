"""A/B the staged runner's fleet mode in ONE session (same device state).

bench_points_r3.json showed staged ref-budget throughput 19.0k (pre-fleet
session) vs 18.4k (fleet session) — inside or outside single-session noise?
This tool compiles BOTH variants and interleaves sustained measurements so
session-to-session tunnel variance cancels.

Run on the TPU tunnel:  python tools/profile_fleet_ab.py [max_iter qp_iters B]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import StagedMultistart
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas


def main():
    max_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    qp_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=qp_iters)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)
    print(f"platform: {jax.devices()[0].platform}  "
          f"max_iter={max_iter} qp_iters={qp_iters} B={B}", flush=True)

    runners = {}
    for fleet in (False, True):
        runner = StagedMultistart(mop, ac, dtype, fleet=fleet)

        def slim(x0b, _runner=runner):
            res = _runner._run_impl(x0b)
            alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
            return res.x, res.fx, res.n_evals, alive

        f = jax.jit(slim)
        t0 = time.perf_counter()
        out = f(x0)
        jax.block_until_ready(out[0])
        print(f"  fleet={fleet}: compile+first {time.perf_counter()-t0:6.1f}s",
              flush=True)
        runners[fleet] = f

    n_rep, rounds = 8, 3
    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), dtype))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)
    for r in range(rounds):
        for fleet in (False, True):
            f = runners[fleet]
            t0 = time.perf_counter()
            outs = [f(xi) for xi in x0s]
            jax.block_until_ready(outs[-1][0])
            dt = (time.perf_counter() - t0) / n_rep
            print(f"  round {r} fleet={fleet}: {dt*1e3:8.2f} ms/batch  "
                  f"{B/dt:10.1f} runs/s", flush=True)


if __name__ == "__main__":
    main()
