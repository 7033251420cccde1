"""Same-session A/B of two repo tips at both bench points (round-4 VERDICT
item #1: disaggregate the r3->r4 regression with a trustworthy baseline).

Usage:  python tools/ab_tips.py <tree_path> <label> [out_jsonl]

Runs the STAGED bench-config point (max_iter=10, qp_iters=100, default
schedule) and the STAGED+WIDTHS ref-budget point (max_iter=100,
qp_iters=400) with a FIXED schedule/widths (the round-3 measured winner
(5,10,15,20,26) / (1024,896,448,64,64)) so no probe noise enters the A/B.
Appends one JSON line per point to ``out_jsonl`` (default /tmp/ab_r5.jsonl).

Interleave invocations against the two trees in one shell session; the
tunnel session noise band comes from the repeats (CLAUDE.md: compare A/Bs
within one session only).
"""

import json
import pathlib
import sys
import time

TREE = pathlib.Path(sys.argv[1]).resolve()
LABEL = sys.argv[2]
OUT = pathlib.Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/ab_r5.jsonl")
sys.path.insert(0, str(TREE))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import StagedMultistart
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas

BATCH = 1024


def measure(max_iter, qp_iters, schedule=None, widths=None,
            n_rep=8, n_sustained=3):
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=qp_iters)
    x0 = jnp.asarray(halton_starts(BATCH, mop.lb, mop.ub), dtype)
    runner = StagedMultistart(mop, ac, dtype, schedule=schedule,
                              widths=widths)

    def slim_batch(x0b):
        res = runner._run_impl(x0b)
        traj_alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
        return (res.x, res.fx, res.stop_code, res.n_iterations,
                res.n_evals, traj_alive)

    run = jax.jit(slim_batch)

    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out[0])
    compile_s = time.perf_counter() - t0

    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), dtype))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)
    sus = []
    for _ in range(n_sustained):
        t0 = time.perf_counter()
        outs = [run(xi) for xi in x0s]
        jax.block_until_ready(outs[-1][0])
        sus.append((time.perf_counter() - t0) / n_rep)
    return {
        "label": LABEL, "max_iter": max_iter, "qp_iters": qp_iters,
        "schedule": schedule, "widths": widths,
        "compile_s": round(compile_s, 2),
        "sustained_s_per_batch": [round(s, 5) for s in sus],
        "runs_per_sec": [round(BATCH / s, 1) for s in sus],
        "ts": time.time(),
    }


def main():
    rows = [
        measure(10, 100),  # bench config, staged, default schedule
        measure(100, 400, schedule=(5, 10, 15, 20, 26),
                widths=(1024, 896, 448, 64, 64)),  # ref budget, fixed winner
    ]
    with OUT.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
