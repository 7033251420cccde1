"""Measure the single-core sequential baseline for ``bench.py``.

The Julia reference publishes no throughput numbers (BASELINE.md,
``/root/reference/README.md``), and no Julia runtime is available in this
environment, so the baseline denominator for the north-star ratio
("`>=100x` throughput on 1024-way vmapped multistart RBF runs vs
single-core Julia", BASELINE.json) is *measured* as:

    this solver, single instance, **unvmapped**, float64, one CPU core,
    at the exact bench.py problem/config (2D two-parabolas, multiquadric
    RBF, ``max_iter=10, qp_iters=100``), timed sequentially over distinct
    pre-staged Halton starts (distinct inputs defeat result caches —
    CLAUDE.md "Performance findings").

This is a conservative (i.e. generous-to-the-reference) stand-in for
single-core Julia: it is the same trust-region algorithm doing the same
dense RBF rebuilds and QP solves per run, JIT-compiled by XLA to native
CPU code, sequential like the reference's inner loop.  For context the
script also measures the reference-default budget (``max_iter=100,
qp_iters=400``) — the config the reference would actually run.

Writes ``baseline_measurement.json`` at the repo root (committed); bench.py
reads the ``runs_per_sec`` field as its denominator.  Methodology is
documented in BASELINE.md.

Run:  python tools/measure_baseline.py
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

# sitecustomize pre-imports jax on the axon TPU tunnel; env vars are too
# late here (CLAUDE.md "Environment quirks") — force the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from morbit_tpu.core.config import AlgorithmConfig  # noqa: E402
from morbit_tpu.models.configs import RbfConfig  # noqa: E402
from morbit_tpu.parallel.multistart import build_solver  # noqa: E402
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas  # noqa: E402


def measure(max_iter: int, qp_iters: int, n_runs: int,
            dtype=jnp.float64) -> dict:
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=qp_iters)
    solver = build_solver(mop, ac, dtype)
    run = jax.jit(solver.solve)

    starts = jnp.asarray(halton_starts(n_runs + 1, mop.lb, mop.ub), dtype)
    # warmup / compile on a start not used in the timed loop
    jax.block_until_ready(run(starts[-1]).x)

    t0 = time.perf_counter()
    for i in range(n_runs):
        jax.block_until_ready(run(starts[i]).x)
    dt = time.perf_counter() - t0
    return {
        "config": {"max_iter": max_iter, "qp_iters": qp_iters,
                   "dtype": jnp.dtype(dtype).name, "n_runs": n_runs,
                   "problem": "two_parabolas 2D, RbfConfig(multiquadric)"},
        "runs_per_sec": round(n_runs / dt, 4),
        "sec_per_run": round(dt / n_runs, 6),
    }


def main():
    bench_cfg = measure(max_iter=10, qp_iters=100, n_runs=64)
    default_cfg = measure(max_iter=100, qp_iters=400, n_runs=16)
    # float32 denominators: the TPU numerator runs f32, so the dtype-matched
    # single-core number is the apples-to-apples one (round-2 review: the
    # f64 denominator is materially slower on CPU and inflates the ratio)
    bench_cfg_f32 = measure(max_iter=10, qp_iters=100, n_runs=64,
                            dtype=jnp.float32)
    default_cfg_f32 = measure(max_iter=100, qp_iters=400, n_runs=16,
                              dtype=jnp.float32)

    # CONSERVATIVE MERGE: single-core wall timings on this 1-vCPU VM vary
    # run-to-run by up to ~40% (measured round 3: f64 bench config 118.8 /
    # 140.1 / 187.3 runs/s across sessions). The denominator stands in for
    # the reference, so the HIGHEST throughput ever measured is kept — a
    # faster denominator can only lower our reported multiplier.
    path = pathlib.Path(__file__).resolve().parent.parent / "baseline_measurement.json"
    if path.exists():
        old = json.loads(path.read_text())
        for key, rec in (("bench_config", bench_cfg),
                         ("reference_default_config", default_cfg),
                         ("bench_config_f32", bench_cfg_f32),
                         ("reference_default_config_f32", default_cfg_f32)):
            prev = old.get(key)
            if prev and prev.get("runs_per_sec", 0) > rec["runs_per_sec"]:
                rec.update(prev)
    out = {
        "methodology": "single-instance unvmapped sequential runs of "
                       "this solver on one CPU core (XLA CPU backend), "
                       "distinct Halton starts; BEST-OF across measurement "
                       "sessions (1-vCPU wall timings vary up to ~40% "
                       "run-to-run; keeping the fastest denominator is the "
                       "conservative choice for the reported multiplier); "
                       "see tools/measure_baseline.py and BASELINE.md",
        "platform": jax.devices()[0].platform,
        "cpu_count_visible": os.cpu_count(),
        "bench_config": bench_cfg,          # denominator used by bench.py
        "reference_default_config": default_cfg,  # for context
        "bench_config_f32": bench_cfg_f32,  # dtype-matched denominator
        "reference_default_config_f32": default_cfg_f32,
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "baseline_measurement.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
