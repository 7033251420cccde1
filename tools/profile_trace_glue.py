"""Device-op breakdown of the per-trip glue floor.

Traces K chained ``iterate()`` repeats on an ALL-LANES-STOPPED batch (the
zero-trip configuration of tools/profile_trip_fixed.py: every active-gated
while_loop inside runs zero trips, so what remains is the glue every trip
pays even for retired lanes) and prints per-op device totals divided by K.

Run:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/profile_trace_glue.py [max_iter] [B] [K]
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


def capture(trace_dir, max_iter, B, K):
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=100)
    solver = build_solver(mop, ac, dtype)
    print(f"max_iter={max_iter} cap={solver.db_capacity} B={B} K={K}",
          flush=True)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)
    state = jax.jit(jax.vmap(solver.initialize))(x0)
    done = jax.jit(jax.vmap(solver.solve_from_state))(state)
    jax.block_until_ready(done.x)

    def chained(s):
        def body(i, st):
            st = st._replace(delta=st.delta + 1e-12 * (i + 1))
            return solver.iterate(st)
        return jax.lax.fori_loop(0, K, body, s)

    run = jax.jit(jax.vmap(chained, axis_size=B))
    out = run(done)
    jax.block_until_ready(out.x)
    v = done._replace(delta=done.delta + 1e-9)
    jax.block_until_ready(v.delta)
    with jax.profiler.trace(trace_dir):
        out = run(v)
        jax.block_until_ready(out.x)
    return trace_dir


def report(trace_dir, K, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        total = sum(agg.values())
        if total == 0:
            continue
        print(f"== plane {plane.name}: total {total:.1f} ms over "
              f"{sum(cnt.values())} events ({total/K*1e3:.0f} us/trip "
              f"incl. nesting)")
        for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{t/K*1e3:9.1f} us/trip  x{cnt[name]/K:7.1f}  {name[:100]}")


if __name__ == "__main__":
    mi = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    report(capture("/tmp/jaxtrace_glue", mi, B, K), K)
