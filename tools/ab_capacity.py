"""Same-session A/B of probe-derived db-capacity pricing at the reference
budget (round-4 VERDICT item 2 / roadmap per-trip capacity pricing).

Protocol: one probe fleet (plain staged) derives schedule+widths (round-4
protocol, variant A) and additionally the measured db fill -> tight
capacity (variant B). Both tuned runners then measure sustained throughput
alternately in ONE process/session. Variant B must report no overflow and
identical integer observables.

Optionally set MORBIT_SEL_CLAMP=N (profiling-only scan clamp) to bound the
selection-scan share separately.

Run on the TPU tunnel:  python tools/ab_capacity.py [out_jsonl]
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
from morbit_tpu.parallel.multistart import (StagedMultistart,
                                            capacity_overflowed,
                                            suggest_db_capacity)
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas
from morbit_tpu.utils.compile_cache import enable_persistent_cache

BATCH = 1024
OUT = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_cap.jsonl")


def sustained(run, x0, n_rep=8, n_meas=3):
    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), x0.dtype))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)
    out = []
    for _ in range(n_meas):
        t0 = time.perf_counter()
        outs = [run(xi) for xi in x0s]
        jax.block_until_ready(outs[-1][0])
        out.append((time.perf_counter() - t0) / n_rep)
    return out


def main():
    enable_persistent_cache()
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=100, qp_iters=400)
    x0 = jnp.asarray(halton_starts(BATCH, mop.lb, mop.ub), dtype)

    probe = StagedMultistart(mop, ac, dtype)
    t0 = time.perf_counter()
    res = probe(x0)
    probe_s = time.perf_counter() - t0
    cap_sugg = suggest_db_capacity(res)
    print(json.dumps({"probe_s": round(probe_s, 1),
                      "full_cap": probe.solver.db_capacity,
                      "suggested_cap": cap_sugg,
                      "max_fill": int(np.max(np.asarray(
                          res.state.groups[0].db.count)))}), flush=True)

    runner_a = probe.tuned(res.n_iterations)
    runner_b = probe.tuned(res.n_iterations, db_capacity=cap_sugg)

    def slim(runner):
        def f(xb):
            r = runner._run_impl(xb)
            ov = jnp.asarray([jnp.any(g.db.overflow)
                              for g in r.state.groups]).any()
            return (r.x, r.fx, r.stop_code, r.n_iterations, r.n_evals, ov)
        return jax.jit(f)

    run_a, run_b = slim(runner_a), slim(runner_b)
    rows = []
    # compile + equivalence check
    out_a = run_a(x0)
    out_b = run_b(x0)
    jax.block_until_ready((out_a[0], out_b[0]))
    assert not bool(out_b[5]), "tight capacity overflowed — rerun wider"
    # f32 cross-program caveat (same as widths, CLAUDE.md): different
    # capacities compile to differently-fused programs, so borderline lanes
    # may flip — report the drift instead of asserting exact equality
    # (the CPU f64 same-fusion lock is
    # tests/test_multistart.py::test_suggest_db_capacity_probe_protocol)
    drift = {f"out{i}_mismatch": int(np.sum(np.asarray(out_a[i])
                                            != np.asarray(out_b[i])))
             for i in (2, 3, 4)}

    def quality(out):
        """Distance to the two-parabolas Pareto segment {(t,t), |t|<=1}
        (tools/check_convergence.py metric) + budget stats: shows whether
        per-lane path divergence is chaos between equally valid solves or a
        quality regression."""
        x = np.asarray(out[0])
        t = np.clip((x[:, 0] + x[:, 1]) / 2.0, -1.0, 1.0)
        d = np.linalg.norm(x - t[:, None], axis=1)
        return {"conv@1e-2": round(float(np.mean(d < 1e-2)), 4),
                "median_dist": round(float(np.median(d)), 6),
                "mean_iters": round(float(np.mean(np.asarray(out[3]))), 2),
                "mean_evals": round(float(np.mean(np.asarray(out[4]))), 2)}

    print(json.dumps({"f32_crossprogram_drift": drift,
                      "quality_widths": quality(out_a),
                      "quality_widths_cap": quality(out_b)}), flush=True)

    for rep in range(3):
        for label, run in (("widths", run_a), ("widths+cap", run_b)):
            sus = sustained(run, x0)
            row = {"label": label, "rep": rep,
                   "sustained_s_per_batch": [round(s, 5) for s in sus],
                   "runs_per_sec": [round(BATCH / s, 1) for s in sus],
                   "ts": time.time()}
            rows.append(row)
            print(json.dumps(row), flush=True)
    with OUT.open("a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
