"""Constrained-fleet throughput: BASELINE config-4-style problem on TPU.

Measures multistart throughput with the full constrained machinery active
(normal step QP + NL linearizations + filter + restoration paths) —
evidence for the round-2 masked-normal-step restructure. Writes
``bench_constrained_r4.json``.

Run:  python tools/bench_constrained.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import ExactConfig, RbfConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import halton_starts


def make_constrained():
    """Two-parabolas + linear ineq + NL ball constraint (config 4 shape)."""
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2)[None], model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2)[None], model_cfg=cfg)
    mop.add_ineq_constraint([[1.0, 1.0]], [1.0])
    mop.add_nl_ineq_constraint(lambda x: (jnp.sum(x ** 2) - 2.25)[None],
                               model_cfg=ExactConfig())
    return mop


def main():
    B = 256
    dtype = jnp.float32
    mop = make_constrained()
    ac = AlgorithmConfig(max_iter=10, qp_iters=100)
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
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(x0)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / 3

    rec = {
        "metric": "constrained multistart throughput (linear + NL ineq, "
                  "filter/normal-step/restoration active; "
                  f"B={B}, max_iter=10, {jax.devices()[0].platform})",
        "runs_per_sec": round(B / dt, 2),
        "sec_per_batch": round(dt, 4),
    }
    pathlib.Path(__file__).resolve().parent.parent.joinpath(
        "bench_constrained_r4.json").write_text(json.dumps(rec, indent=2) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
