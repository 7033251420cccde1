"""Capture a jax.profiler trace of the bench solve and print top device ops.

Parses the xplane protobuf directly via tensorflow's tsl proto (the
tensorboard_plugin_profile converters are incompatible with this TF build)
and aggregates per-op device durations. NOTE: events nest (while-loop ops
include their children) and async copies may overlap compute — read the
leaf fusions/copies, not the loop totals.

Run:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/profile_trace.py \
          [max_iter] [qp_iters]
(defaults 10 100 — pass 100 400 for the reference-default budget)
"""

import glob
import pathlib
import sys
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas


def capture(trace_dir="/tmp/jaxtrace", max_iter=10, qp_iters=100):
    B = 1024
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=qp_iters)
    solver = build_solver(mop, ac, dtype)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)
    run = jax.jit(jax.vmap(solver.solve))
    out = run(x0)
    jax.block_until_ready(out.x)
    with jax.profiler.trace(trace_dir):
        out = run(x0)
        jax.block_until_ready(out.x)
    return trace_dir


def report(trace_dir, top=35):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        total = 0.0
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9
                agg[name] += dur
                cnt[name] += 1
                total += dur
        if total == 0:
            continue
        print(f"== plane {plane.name}: total {total:.1f} ms over "
              f"{sum(cnt.values())} events")
        for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{t:10.2f} ms  x{cnt[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    mi = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    qi = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    report(capture(max_iter=mi, qp_iters=qi))
