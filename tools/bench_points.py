"""Honest multi-point TPU throughput artifact (round-2 VERDICT item #2).

The headline bench (bench.py) uses the cheapest configuration
(``max_iter=10, qp_iters=100``). This tool measures STEADY-STATE TPU
throughput at BOTH budgets — the bench config and the reference-default
budget (``max_iter=100, qp_iters=400``, matching ``AlgorithmConfig``'s
reference defaults / ``examples/large_scale_benchmarks.jl:181,203-210``
run style) — with the compile time split out, and pairs each with its
measured single-core CPU denominators (float64 and the dtype-matched
float32) from ``baseline_measurement.json``.

Writes ``bench_points_r5.json``.

Run on the TPU tunnel:  python tools/bench_points.py
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

BATCH = 1024


def measure(max_iter: int, qp_iters: int, n_rep: int = 8,
            staged: bool = False, batch: int = BATCH,
            widths: object = None) -> dict:
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=qp_iters)
    x0 = jnp.asarray(halton_starts(batch, mop.lb, mop.ub), dtype)
    schedule = None

    cap_tuned = widths == "auto+cap"
    if cap_tuned:
        widths = "auto"
    if widths == "auto":
        # probe protocol (suggest_widths docstring): one plain staged fleet
        # measures the per-lane iteration CDF; schedule bounds AND widths
        # are rebuilt from it (suggest_schedule: quantile-placed bounds beat
        # the geometric default ~10% — the p99 cap bound lets the
        # to-completion stage run narrow). The probe compile is NOT counted
        # in this row's compile time (a repeated-fleet deployment pays it
        # once, or probes on CPU).
        from morbit_tpu.parallel.multistart import (StagedMultistart,
                                                    suggest_schedule,
                                                    suggest_widths)

        probe = StagedMultistart(mop, ac, dtype)
        probe_res = probe(x0)
        n_iter = probe_res.n_iterations
        if cap_tuned:
            # probe-derived db capacity (round-5: price the capacity-linear
            # per-trip work at measured FILL; sticky overflow flag guards)
            from morbit_tpu.parallel.multistart import suggest_db_capacity
            import dataclasses as _dc

            ac = _dc.replace(ac, db_capacity=suggest_db_capacity(probe_res))
        schedule = suggest_schedule(n_iter, max_iter)
        tmp = StagedMultistart(mop, ac, dtype, schedule=schedule)
        widths = suggest_widths(tmp, n_iter, quantum=32)

    def _slim_res(res, traj):
        traj_alive = jax.tree_util.tree_map(jnp.sum, traj)
        return (res.x, res.fx, res.stop_code, res.n_iterations, res.n_evals,
                traj_alive)

    if staged:
        # staged-capacity runner (bit-exact vs plain — see
        # tests/test_multistart.py::test_staged_multistart_matches_plain);
        # slim payload: returning the full state costs ~160 ms/call on the
        # tunnel (CLAUDE.md)
        from morbit_tpu.parallel.multistart import StagedMultistart

        runner = StagedMultistart(mop, ac, dtype, schedule=schedule,
                                  widths=widths)

        def slim_batch(x0b):
            res = runner._run_impl(x0b)
            return _slim_res(res, res.state.traj)

        run = jax.jit(slim_batch)
    else:
        solver = build_solver(mop, ac, dtype)

        def slim(row):
            res = solver.solve(row)
            return _slim_res(res, res.state.traj)

        run = jax.jit(jax.vmap(slim))
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out[0])
    compile_s = time.perf_counter() - t0

    # blocked latency: one call, block immediately
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out[0])
    blocked_s = time.perf_counter() - t0

    # sustained: back-to-back batches on distinct pre-staged inputs, one
    # final block (bench.py protocol — per-call blocking pays a fixed
    # ~25 ms tunnel round-trip that is not solver work)
    dtype = x0.dtype
    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), dtype))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)
    t0 = time.perf_counter()
    outs = [run(xi) for xi in x0s]
    jax.block_until_ready(outs[-1][0])
    steady_s = (time.perf_counter() - t0) / n_rep
    return {
        "config": {"max_iter": max_iter, "qp_iters": qp_iters,
                   "batch": batch, "dtype": "float32",
                   "runner": ("StagedMultistart (staged-capacity, "
                              f"probe-derived lane-compaction schedule="
                              f"{schedule} widths={widths}, exact: ints "
                              "bit-identical, floats to reassociation)"
                              if staged and widths is not None else
                              "StagedMultistart (staged-capacity, bit-exact)"
                              if staged else "plain vmapped"),
                   "problem": "two_parabolas 2D, RbfConfig(multiquadric)"},
        "compile_plus_first_run_s": round(compile_s, 3),
        "blocked_latency_s_per_batch": round(blocked_s, 5),
        "steady_state_s_per_batch": round(steady_s, 5),
        "steady_state_runs_per_sec": round(batch / steady_s, 2),
        "protocol": f"sustained: {n_rep} back-to-back batches, distinct "
                    "pre-staged inputs, one final block",
    }


def main():
    from morbit_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    root = pathlib.Path(__file__).resolve().parent.parent
    meas = json.loads((root / "baseline_measurement.json").read_text())

    def denoms(key):
        f64 = meas[key]["runs_per_sec"]
        d = {"cpu_f64_runs_per_sec": f64}
        f32_key = key + "_f32"
        if f32_key in meas:
            # conservative dtype-matched denominator: f32 is never slower
            # than f64 on the same machine, so floor it at the best f64
            d["cpu_f32_runs_per_sec"] = max(meas[f32_key]["runs_per_sec"],
                                            f64)
        return d

    rows = {}

    def add(key, denom_key, **kw):
        pt = measure(**kw)
        pt["denominators"] = denoms(denom_key)
        for name, den in pt["denominators"].items():
            pt[f"vs_{name.replace('_runs_per_sec', '')}"] = round(
                pt["steady_state_runs_per_sec"] / den, 2)
        rows[key] = pt
        print(json.dumps(pt), flush=True)

    add("bench_config", "bench_config", max_iter=10, qp_iters=100)
    add("bench_config_staged", "bench_config", max_iter=10, qp_iters=100,
        staged=True)
    # wider fleet: per-trip glue is bandwidth-bound and scales sublinearly
    # with batch (tools/profile_trip_fixed.py: 0.72 -> 0.56 us/run/trip
    # going B=1024 -> 4096), so larger fleets get better per-run throughput
    add("bench_config_staged_b4096", "bench_config", max_iter=10,
        qp_iters=100, staged=True, batch=4096)
    add("reference_default_config", "reference_default_config",
        max_iter=100, qp_iters=400)
    add("reference_default_config_staged", "reference_default_config",
        max_iter=100, qp_iters=400, staged=True)
    # on-device lane compaction (probe-derived per-stage widths): the
    # ref-budget winner — retirement is front-loaded, so late stages run on
    # a narrow head of still-active lanes (8ddc80c: 18.9k -> 37.3k runs/s)
    add("reference_default_config_staged_widths", "reference_default_config",
        max_iter=100, qp_iters=400, staged=True, widths="auto")
    # round-5: + probe-derived db capacity (suggest_db_capacity; measured
    # +27% over widths-only in tools/ab_capacity.py, quality identical)
    add("reference_default_config_staged_widths_cap",
        "reference_default_config", max_iter=100, qp_iters=400, staged=True,
        widths="auto+cap")
    # capacity pricing at the bench config too (fill ~tens vs cap 157)
    add("bench_config_staged_cap", "bench_config", max_iter=10,
        qp_iters=100, staged=True, widths="auto+cap")

    quality_path = root / "quality_r5.json"
    quality = (json.loads(quality_path.read_text())
               if quality_path.exists() else None)

    out = {
        "platform": jax.devices()[0].platform,
        "quality_at_reference_budget": quality,
        "note": "steady-state = mean of 8 repeat calls on pre-staged device "
                "inputs after the compile call; denominators are measured "
                "single-instance sequential single-core CPU runs of this "
                "same solver (tools/measure_baseline.py, BASELINE.md); "
                "'staged' rows run the bit-exact staged-capacity runner "
                "(StagedMultistart); 'widths' rows add on-device lane "
                "compaction (ints bit-identical, floats to reassociation, "
                "tests/test_multistart.py::test_staged_widths_match_plain)",
        **rows,
    }
    (root / "bench_points_r5.json").write_text(json.dumps(out, indent=2) + "\n")


if __name__ == "__main__":
    main()
