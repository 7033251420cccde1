"""Measure compacted-multistart throughput at the reference-default budget.

The reference-default point (max_iter=100, qp_iters=400) is straggler-bound
in a plain vmapped solve (tools/profile_compaction.py: mean 12.3 iterations,
longest lane 46 — the while-loop batching rule keeps the whole 1024-lane
batch running until the last lane stops). ``compacted_multistart`` retires
converged lanes into smaller stage buckets between stages.

This tool measures wall-clock (including the per-stage stop-code syncs) for
a few (stage_iters, ladder) settings and prints the best, for the committed
artifact. Compile time is excluded by warmup runs that traverse the same
bucket sequence.

Run on the TPU tunnel:  python tools/bench_compacted.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import CompactedMultistart
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas

BATCH = 1024
MAX_ITER = 100
QP_ITERS = 400


def measure(stage_iters, ladder, n_rep=3, schedule=None):
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=MAX_ITER, qp_iters=QP_ITERS)
    x0 = jnp.asarray(halton_starts(BATCH, mop.lb, mop.ub), jnp.float32)

    # the runner holds the compiled bucket programs — repeated batches
    # reuse them (a fresh compacted_multistart call would recompile)
    run = CompactedMultistart(mop, ac, dtype=jnp.float32,
                              stage_iters=stage_iters, bucket_ladder=ladder,
                              stage_schedule=schedule)

    # warmup twice (compiles every bucket program the schedule touches)
    t0 = time.perf_counter()
    res = run(x0)
    jax.block_until_ready(res.x)
    compile_s = time.perf_counter() - t0
    res = run(x0 + jnp.float32(1e-5))
    jax.block_until_ready(res.x)

    times = []
    for i in range(n_rep):
        xi = jax.device_put(x0 + jnp.float32(1e-5 * (i + 2)))
        jax.block_until_ready(xi)
        t0 = time.perf_counter()
        res = run(xi)
        jax.block_until_ready(res.x)
        times.append(time.perf_counter() - t0)
    dt = float(np.mean(times))
    tag = (f"schedule={schedule}" if schedule is not None
           else f"stage_iters={stage_iters:3d}")
    print(f"{tag} ladder={ladder}  "
          f"{dt * 1e3:8.1f} ms/batch  {BATCH / dt:8.1f} runs/s  "
          f"(compile+first {compile_s:.1f}s)")
    return {"stage_iters": stage_iters, "ladder": list(ladder),
            "schedule": list(schedule) if schedule is not None else None,
            "wall_ms_per_batch": round(dt * 1e3, 1),
            "runs_per_sec": round(BATCH / dt, 1),
            "compile_plus_first_run_s": round(compile_s, 1)}


def main():
    print("platform:", jax.devices()[0].platform)
    results = []
    # fixed-length settings (round-3 baseline measurements)
    for stage_iters, ladder in [
        (10, (1024, 512, 256, 128, 64)),
    ]:
        results.append(measure(stage_iters, ladder))
    # schedule settings from the offline optimizer over the measured
    # retirement CDF + per-bucket iteration costs (profile_compaction.py):
    # retirement is front-loaded, so one long first stage to ~t=12 (active
    # first drops below 512 there), then short stages down the ladder
    for schedule in [(12, 8), (12, 8, 12), (12, 8, 12, 16)]:
        results.append(measure(None, (1024, 512, 256, 128, 64),
                               schedule=schedule))
    best = max(results, key=lambda r: r["runs_per_sec"])
    print("best:", json.dumps(best))
    out = pathlib.Path(__file__).resolve().parent.parent / \
        "bench_compacted_r3.json"
    out.write_text(json.dumps({
        "config": {"max_iter": MAX_ITER, "qp_iters": QP_ITERS,
                   "batch": BATCH, "dtype": "float32",
                   "problem": "two_parabolas 2D, RbfConfig(multiquadric)"},
        "protocol": "compacted_multistart; wall time per full batch incl. "
                    "per-stage stop-code syncs; compile excluded via "
                    "2 warmup runs",
        "settings": results,
        "best": best,
    }, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    main()
