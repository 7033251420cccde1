"""Benchmark: 1024-way vmapped multistart RBF trust-region runs on TPU.

BASELINE.json north star: >=100x throughput vs the single-core Julia
reference on 1024-way multistart RBF trust-region runs. The reference
publishes no numbers (BASELINE.md) and no Julia runtime exists in this
environment, so ``vs_baseline`` uses a MEASURED denominator: this same
solver, single instance, unvmapped, float64, sequential on one CPU core at
the identical problem/config — a conservative stand-in for single-core
Julia (same algorithm, same per-run work, XLA-compiled native CPU code).
The measurement lives in ``baseline_measurement.json`` (committed) and is
reproduced by ``tools/measure_baseline.py``; methodology in BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import pathlib
import time

import numpy as np


def _reference_runs_per_sec(key: str = "bench_config") -> tuple[float, float]:
    path = pathlib.Path(__file__).resolve().parent / "baseline_measurement.json"
    meas = json.loads(path.read_text())
    f64 = float(meas[key]["runs_per_sec"])
    f32 = float(meas.get(key + "_f32", meas[key])["runs_per_sec"])
    # f32 is never slower than f64 on the same machine, so the conservative
    # dtype-matched denominator is at least the best observed f64 number
    # (single-core timings on this VM vary ~40% across sessions and the
    # best f32 and f64 sessions differ)
    return f64, max(f32, f64)


# measured denominators (see docstring). vs_baseline uses the f64 CPU run
# (the committed round-1/2 convention); the f32 denominator is the
# dtype-matched apples-to-apples one (the TPU numerator runs float32) and
# is reported alongside as vs_baseline_f32.
REFERENCE_RUNS_PER_SEC, REFERENCE_RUNS_PER_SEC_F32 = _reference_runs_per_sec()

BATCH = 1024
MAX_ITER = 10
N_VARS = 2


def _ref_budget_point(mop, dtype, n_rep: int = 4) -> dict:
    """Second (more informative) bench point: the REFERENCE-default budget
    (``max_iter=100, qp_iters=400`` — ``AbstractConfigInterface.jl:28-58``
    run style), probe-tuned on-device lane compaction (round-3 winner,
    CLAUDE.md perf findings). Same sustained protocol as the headline."""
    import time

    import jax
    import jax.numpy as jnp

    from morbit_tpu.core.config import AlgorithmConfig
    from morbit_tpu.parallel.multistart import (StagedMultistart,
                                                suggest_schedule,
                                                suggest_widths)
    from morbit_tpu.problems.synthetic import halton_starts

    ac = AlgorithmConfig(max_iter=100, qp_iters=400)
    x0 = jnp.asarray(halton_starts(BATCH, mop.lb, mop.ub), dtype)

    t0 = time.perf_counter()
    probe = StagedMultistart(mop, ac, dtype)
    probe_res = probe(x0)
    n_iter = probe_res.n_iterations
    # probe-derived db capacity (round 5): price every capacity-linear
    # per-trip term at measured FILL instead of the worst-case heuristic
    # (measured same-session: 37.3k -> 45.8k runs/s at this budget,
    # bench_points_r5.json; sticky overflow flag reported below is the
    # correctness guard — tests/test_multistart.py locks observable
    # equality on CPU f64)
    import dataclasses as _dc

    from morbit_tpu.parallel.multistart import suggest_db_capacity

    ac = _dc.replace(ac, db_capacity=suggest_db_capacity(probe_res))
    schedule = suggest_schedule(n_iter, 100)
    tmp = StagedMultistart(mop, ac, dtype, schedule=schedule)
    widths = suggest_widths(tmp, n_iter, quantum=32)
    runner = StagedMultistart(mop, ac, dtype, schedule=schedule,
                              widths=widths)

    def slim(x0b):
        res = runner._run_impl(x0b)
        traj_alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
        overflow = jnp.any(jnp.stack([jnp.any(g.db.overflow)
                                      for g in res.state.groups]))
        return (res.x, res.fx, res.stop_code, res.n_iterations, res.n_evals,
                traj_alive, overflow)

    run = jax.jit(slim)
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

    f64, f32 = _reference_runs_per_sec("reference_default_config")
    rps = BATCH / dt
    return {
        "config": "max_iter=100, qp_iters=400 (reference defaults), "
                  f"{BATCH}-way, probe-tuned StagedMultistart "
                  f"schedule={schedule} widths={tuple(widths)} "
                  f"db_capacity={ac.db_capacity}",
        "runs_per_sec": round(rps, 2),
        "vs_baseline": round(rps / f64, 2),
        "vs_baseline_f32": round(rps / f32, 2),
        "compile_plus_probe_s": round(compile_s, 1),
        "capacity_overflow": bool(np.asarray(outs[-1][6])),
    }


def main():
    import jax
    import jax.numpy as jnp

    from morbit_tpu.core.config import AlgorithmConfig
    from morbit_tpu.models.configs import RbfConfig
    from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas
    from morbit_tpu.utils.compile_cache import enable_persistent_cache

    # persistent compilation cache: the second invocation of this script
    # skips the multi-minute XLA compiles entirely (round-3 VERDICT item 4)
    enable_persistent_cache()

    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=MAX_ITER, qp_iters=100)
    import dataclasses as _dc

    from morbit_tpu.parallel.multistart import (StagedMultistart,
                                                suggest_db_capacity,
                                                suggest_schedule,
                                                suggest_widths)

    x0 = jnp.asarray(halton_starts(BATCH, mop.lb, mop.ub), dtype)

    # staged-capacity runner: early iterations run at the database/
    # trajectory capacity their cumulative iteration bound implies —
    # bit-exact vs the plain vmapped solve
    # (tests/test_multistart.py::test_staged_multistart_matches_plain),
    # measured faster at both bench budgets (bench_points_r3.json).
    # Round 5 adds probe-derived db-capacity pricing + the probe-tuned
    # schedule/widths (73.6k -> 80.4k runs/s at this config, same-session
    # A/B in bench_points_r5.json); the sticky overflow flag in the
    # payload is the correctness guard for the tightened capacity.
    probe = StagedMultistart(mop, ac, dtype)
    probe_res = probe(x0)
    ac_tuned = _dc.replace(ac, db_capacity=suggest_db_capacity(probe_res))
    schedule = suggest_schedule(probe_res.n_iterations, MAX_ITER)
    tmp = StagedMultistart(mop, ac_tuned, dtype, schedule=schedule)
    widths = suggest_widths(tmp, probe_res.n_iterations, quantum=32)
    runner = StagedMultistart(mop, ac_tuned, dtype, schedule=schedule,
                              widths=widths)

    def slim_solve(x0_batch):
        # Return the result payload (x, fx, codes, counters) rather than the
        # full SolverState: shipping every state buffer back through the
        # device tunnel costs ~160 ms/call of pure transfer (measured,
        # tools/profile_outputs.py) that is not solve work. The per-iteration
        # trajectory stamps are kept alive against DCE via a checksum so the
        # measured work still includes them (the reference always stamps
        # iter_data, ``algorithm.jl:899-903``).
        res = runner._run_impl(x0_batch)
        traj_alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
        overflow = jnp.any(jnp.stack([jnp.any(g.db.overflow)
                                      for g in res.state.groups]))
        return (res.x, res.fx, res.stop_code, res.n_iterations, res.n_evals,
                traj_alive, overflow)

    run = jax.jit(slim_solve)

    # warmup / compile
    res = run(x0)
    jax.block_until_ready(res[0])

    # SUSTAINED throughput: submit n_rep batches back-to-back (distinct
    # pre-staged inputs — identical repeats could be served by result
    # caches) and block once at the end. Blocking after every call pays a
    # fixed ~25 ms device-tunnel round-trip per call (measured: 69.6 ms/call
    # blocked vs 45.2 ms/call pipelined at identical device time) that is
    # tunnel latency, not solver work; any real multistart workload
    # enqueues batches back-to-back. The per-call blocked latency is
    # reported alongside for transparency.
    n_rep = 8
    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), dtype))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)

    t0 = time.perf_counter()
    res = run(x0s[0])
    jax.block_until_ready(res[0])
    blocked_latency_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = [run(xi) for xi in x0s]
    jax.block_until_ready(outs[-1][0])
    dt = (time.perf_counter() - t0) / n_rep
    res = outs[-1]

    runs_per_sec = BATCH / dt
    iters = np.asarray(res[3])

    # second point: reference-default budget (max_iter=100/qp_iters=400)
    # with probe-tuned lane compaction — the far more informative number
    # (round-3 VERDICT item 7); best-effort so a failure here never breaks
    # the headline artifact
    try:
        ref_budget = _ref_budget_point(mop, dtype)
    except Exception as e:  # pragma: no cover - diagnostic path
        ref_budget = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": f"multistart RBF trust-region optimize() throughput "
                  f"({BATCH}-way vmap, 2D two-parabolas, multiquadric, "
                  f"max_iter={MAX_ITER}, {jax.devices()[0].platform})",
        "value": round(runs_per_sec, 2),
        "unit": "runs/s",
        "vs_baseline": round(runs_per_sec / REFERENCE_RUNS_PER_SEC, 2),
        "vs_baseline_f32": round(runs_per_sec / REFERENCE_RUNS_PER_SEC_F32, 2),
        "blocked_latency_ms": round(blocked_latency_s * 1e3, 1),
        "db_capacity": ac_tuned.db_capacity,
        "capacity_overflow": bool(np.asarray(res[6])),
        "protocol": f"sustained: {n_rep} back-to-back batches, distinct "
                    "pre-staged inputs, one final block",
        "ref_budget": ref_budget,
    }))


if __name__ == "__main__":
    main()
