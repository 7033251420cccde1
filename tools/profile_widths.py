"""A/B on-device lane compaction (StagedMultistart ``widths``) at the
reference-default budget.

Lane retirement is front-loaded (1024 -> ~565 active after 10 iterations ->
~121 after 20, tools/profile_compaction.py), but a batched while_loop pays
every trip for ALL lanes. ``widths`` sorts active lanes to the front on
device at stage boundaries and runs each stage while_loop on a static head
only (exact for any widths — the full-width catch-all finishes starved
lanes). This tool:

  1. measures the per-lane iteration CDF at the stage boundaries of the
     default schedule (to pick sensible widths),
  2. benches widths=None against candidate schedules with the sustained
     protocol (back-to-back batches on pre-staged inputs, one final block).

Run on the TPU tunnel:  python tools/profile_widths.py [max_iter] [qp_iters]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import StagedMultistart
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas

BATCH = 1024
N_REP = 8


def build(max_iter, qp_iters, widths):
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=qp_iters)
    runner = StagedMultistart(mop, ac, dtype=jnp.float32, widths=widths)

    def slim(x0b):
        res = runner._run_impl(x0b)
        traj_alive = jax.tree_util.tree_map(jnp.sum, res.state.traj)
        return (res.x, res.fx, res.stop_code, res.n_iterations, res.n_evals,
                traj_alive)

    return mop, runner, jax.jit(slim)


def sustained(run, x0, n_rep=N_REP):
    t0 = time.perf_counter()
    out = run(x0)
    jax.block_until_ready(out[0])
    compile_s = time.perf_counter() - t0
    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), x0.dtype))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)
    t0 = time.perf_counter()
    outs = [run(xi) for xi in x0s]
    jax.block_until_ready(outs[-1][0])
    steady = (time.perf_counter() - t0) / n_rep
    return compile_s, steady, outs[-1]


def main():
    max_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    qp_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    mop, runner, run = build(max_iter, qp_iters, widths=None)
    bounds = tuple(t for t, _ in runner.schedule)
    print(f"schedule bounds: {bounds}", flush=True)
    x0 = jnp.asarray(halton_starts(BATCH, mop.lb, mop.ub), jnp.float32)

    compile_s, base_s, out = sustained(run, x0)
    n_iter = np.asarray(out[3])
    cdf = {t: int((n_iter > t).sum()) for t in bounds + (max_iter // 1,)}
    print(f"widths=None  compile {compile_s:.1f}s  steady "
          f"{base_s*1e3:.1f} ms/batch  ({BATCH/base_s:.0f} runs/s)")
    print(f"active lanes past iteration bound (iteration CDF, micro-trips "
          f"make true trip-retirement later): {cdf}", flush=True)

    # candidate widths: iteration-CDF counts entering each stage, padded
    # ~1.4x for criticality micro-trips, rounded up to 64; plus a compacted
    # final stage. Entering stage i the bound passed is bounds[i-1].
    def pick(slack):
        ws = [BATCH]
        for t in bounds[:-1]:
            need = int(np.ceil(cdf[t] * slack / 64.0)) * 64
            ws.append(max(64, min(BATCH, need)))
        ws.append(max(64, min(BATCH,
                              int(np.ceil(cdf[bounds[-1]] * slack / 64.0))
                              * 64)))
        return tuple(ws)

    candidates = {
        f"cdf x1.5": pick(1.5),
        f"cdf x1.1": pick(1.1),
        "halving": tuple([BATCH] + [max(64, BATCH >> (i + 1))
                                    for i in range(len(bounds))]),
    }
    for name, ws in candidates.items():
        _, runner_w, run_w = build(max_iter, qp_iters, ws)
        c_s, s_s, out_w = sustained(run_w, x0)
        same = np.allclose(np.asarray(out_w[0]), np.asarray(out[0]),
                           rtol=1e-6, atol=1e-6)
        print(f"widths={ws} ({name}): compile {c_s:.1f}s  steady "
              f"{s_s*1e3:.1f} ms/batch ({BATCH/s_s:.0f} runs/s, "
              f"{base_s/s_s:.2f}x vs None)  x-match={same}", flush=True)


if __name__ == "__main__":
    main()
