"""Staged-capacity vs plain vmapped solve at the reference-default budget.

tools/profile_refbudget.py showed the plain solve at max_iter=100 pays for
the worst-case database capacity on every one of its ~36 trips (245 ms vs
124 ms at max_iter=40 with the SAME trip count).  StagedMultistart runs the
early iterations at the capacity their cumulative bound implies, inside one
jit.  This sweeps a few schedules.

Run on the TPU tunnel:  python tools/profile_staged.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import StagedMultistart, build_solver
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas

B = 1024


def mk_mop():
    return make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                              lb=[-4.0, -4.0], ub=[4.0, 4.0])


def sustained(run, x0, n_rep=6):
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out.x)
    compile_s = time.perf_counter() - t0
    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), x0.dtype))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)
    t0 = time.perf_counter()
    outs = [run(xi) for xi in x0s]
    jax.block_until_ready(outs[-1].x)
    dt = (time.perf_counter() - t0) / n_rep
    return compile_s, dt


def main():
    print("platform:", jax.devices()[0].platform, " B =", B,
          " max_iter=100 qp_iters=400", flush=True)
    ac = AlgorithmConfig(max_iter=100, qp_iters=400)
    x0 = jnp.asarray(halton_starts(B, [-4.0, -4.0], [4.0, 4.0]), jnp.float32)

    for label, schedule in [
        ("plain (no stages)", ()),
        ("default (6,12,25,50)", None),
        ("fine (4,8,16,32,64)", (4, 8, 16, 32, 64)),
        ("coarse (12,40)", (12, 40)),
    ]:
        runner = StagedMultistart(mk_mop(), ac, jnp.float32,
                                  schedule=schedule)
        caps = ([c for _, c in runner.schedule]
                + [(runner.solver.db_capacity, runner.solver.T)])
        comp, dt = sustained(runner, x0)
        print(f"{label:24s}: {dt*1e3:8.1f} ms/batch sustained "
              f"({B/dt:8.0f} runs/s)  compile {comp:5.1f}s  caps={caps}",
              flush=True)


if __name__ == "__main__":
    main()
