"""Capture a jax.profiler trace of the bench solve and print top device ops.

Uses tensorboard_plugin_profile's converters to aggregate per-op device
times from the xplane protobuf — op-level attribution for the remaining
per-iteration cost.

Run:  python tools/profile_trace.py
"""

import glob
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas


def main():
    B = 1024
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=10, qp_iters=100)
    solver = build_solver(mop, ac, dtype)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)
    run = jax.jit(jax.vmap(solver.solve))
    out = run(x0)
    jax.block_until_ready(out.x)

    trace_dir = "/tmp/jaxtrace"
    with jax.profiler.trace(trace_dir):
        out = run(x0)
        jax.block_until_ready(out.x)

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, file=sys.stderr)
    if not xplanes:
        print("no xplane captured — tracing unsupported on this backend?")
        return

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data([xplanes[-1]], "framework_op_stats^",
                                       {"tqx": "out:json;"})
    tbl = json.loads(data)
    rows = tbl["table"]["rows"] if "table" in tbl else tbl["rows"]
    cols = [c["label"] for c in (tbl["table"]["cols"] if "table" in tbl
                                 else tbl["cols"])]
    print("columns:", cols, file=sys.stderr)
    i_name = cols.index("Type") if "Type" in cols else 0
    # find a self-time column
    cand = [i for i, c in enumerate(cols) if "self" in c.lower()]
    i_time = cand[0] if cand else 1
    agg = {}
    for r in rows:
        c = r["c"]
        name = str(c[i_name]["v"])
        t = float(c[i_time]["v"] or 0)
        agg[name] = agg.get(name, 0.0) + t
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t:14.1f}  {name}")


if __name__ == "__main__":
    main()
