"""Batch-size scaling of multistart throughput on one TPU chip.

The bench config is latency-bound at B=1024 (launch latency of the
sequential model-rebuild chain, not FLOPs), so sustained throughput should
keep scaling with the batch until the vector lanes saturate — this
artifact measures it. Same sustained protocol as bench.py (back-to-back
batches on distinct pre-staged inputs, one final block).

Writes ``bench_scaling_r3.json``.

Run on the TPU tunnel:  python tools/bench_scaling.py
"""

import json
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

BATCHES = (256, 1024, 4096, 16384)
N_REP = 4


def measure(B: int) -> dict:
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=10, qp_iters=100)
    solver = build_solver(mop, ac, dtype)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)

    def slim(row):
        res = solver.solve(row)
        alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
        return (res.x, res.fx, res.stop_code, res.n_iterations, res.n_evals,
                alive)

    run = jax.jit(jax.vmap(slim))
    out = run(x0)
    jax.block_until_ready(out[0])

    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), dtype))
           for i in range(N_REP)]
    jax.block_until_ready(x0s)
    t0 = time.perf_counter()
    outs = [run(xi) for xi in x0s]
    jax.block_until_ready(outs[-1][0])
    dt = (time.perf_counter() - t0) / N_REP
    return {"batch": B, "s_per_batch": round(dt, 5),
            "runs_per_sec": round(B / dt, 1)}


def main():
    rows = [measure(B) for B in BATCHES]
    out = {
        "metric": "sustained multistart throughput vs batch size "
                  "(bench config, one v5e chip)",
        "protocol": f"{N_REP} back-to-back batches, distinct pre-staged "
                    "inputs, one final block",
        "rows": rows,
    }
    (pathlib.Path(__file__).resolve().parent.parent
     / "bench_scaling_r3.json").write_text(json.dumps(out, indent=2) + "\n")
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
