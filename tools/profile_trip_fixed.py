"""Pure per-trip overhead floor of the outer solve loop.

Chained ``iterate()`` repeats (repeat-slope method, CLAUDE.md) on an
ALL-LANES-STOPPED state: under vmap the top-level stop cond lowers to a
select, so the full ``_iterate_inner`` glue executes while every
active-gated while_loop inside runs zero trips — the slope is the
capacity-independent launch/boundary overhead every trip pays even for
retired lanes.  Compared against the slope on an ACTIVE mid-solve state
(glue + real work) and across db capacities (max_iter 10 vs 100 sizing).

Run on the TPU tunnel:  python tools/profile_trip_fixed.py [B]
"""

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


def slope_of_iterates(solver, state, k_lo=2, k_hi=10, reps=5):
    def runner(K):
        def f(s):
            def body(i, st):
                # nudge delta per repeat to defeat CSE across iterations
                st = st._replace(delta=st.delta + 1e-12 * (i + 1))
                return solver.iterate(st)
            return jax.lax.fori_loop(0, K, body, s)
        return jax.jit(jax.vmap(f, axis_size=state.x.shape[0]))

    def timed(f):
        # distinct input VALUES per call: the axon tunnel serves repeated
        # identical (executable, input) calls from a result cache in ~30us
        # regardless of work (CLAUDE.md round-2 finding) — pre-stage one
        # perturbed state per rep, then time back-to-back calls
        variants = [
            jax.block_until_ready(
                state._replace(delta=state.delta + 1e-9 * (r + 1)))
            for r in range(reps + 1)
        ]
        out = f(variants[-1])
        jax.block_until_ready(out.x)
        t0 = time.perf_counter()
        outs = [f(v) for v in variants[:reps]]
        jax.block_until_ready(outs[-1].x)
        return (time.perf_counter() - t0) / reps

    return (timed(runner(k_hi)) - timed(runner(k_lo))) / (k_hi - k_lo)


def measure(max_iter, B):
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=100)
    solver = build_solver(mop, ac, dtype)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)
    state = jax.jit(jax.vmap(solver.initialize))(x0)
    # active mid-solve state: 3 iterations in
    it = jax.jit(jax.vmap(solver.iterate))
    for _ in range(3):
        state = it(state)
    jax.block_until_ready(state.x)
    s_active = slope_of_iterates(solver, state)
    # all-stopped state: run to completion
    done = jax.jit(jax.vmap(solver.solve_from_state))(state)
    jax.block_until_ready(done.x)
    s_stopped = slope_of_iterates(solver, done)
    print(f"max_iter={max_iter:4d} (cap={solver.db_capacity:5d}) B={B}: "
          f"active slope {s_active*1e3:7.2f} ms/trip, "
          f"all-stopped (pure glue) {s_stopped*1e3:7.2f} ms/trip",
          flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print("platform:", jax.devices()[0].platform, flush=True)
    measure(10, B)
    measure(100, B)


if __name__ == "__main__":
    main()
