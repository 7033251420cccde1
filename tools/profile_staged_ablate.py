"""Ablate the staged ref-budget solve: where do the remaining ~123 ms go?

Runs StagedMultistart at max_iter=100/qp_iters=400 with (a) defaults,
(b) max_critical_loops=0 (criticality rebuild loop disabled — NOTE this
also shrinks the staged db capacities via resolved_db_capacity, so the
delta is an upper bound on the rebuild share), (c) eps_crit=0 (criticality
never entered).

Run on the TPU tunnel:  python tools/profile_staged_ablate.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import StagedMultistart
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas

B = 1024


def run_one(label, n_rep=6, **cfg):
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=100, qp_iters=400, **cfg)
    runner = StagedMultistart(mop, ac, jnp.float32)
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), jnp.float32)
    out = runner(x0)
    jax.block_until_ready(out.x)
    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), jnp.float32))
           for i in range(n_rep)]
    jax.block_until_ready(x0s)
    t0 = time.perf_counter()
    outs = [runner(xi) for xi in x0s]
    jax.block_until_ready(outs[-1].x)
    dt = (time.perf_counter() - t0) / n_rep
    caps = [c for _, c in runner.schedule]
    print(f"{label:32s}: {dt*1e3:8.1f} ms/batch  caps={caps}", flush=True)
    return dt


def main():
    print("platform:", jax.devices()[0].platform, " B =", B,
          " staged, max_iter=100 qp_iters=400", flush=True)
    t_full = run_one("default")
    t_nocrit = run_one("max_critical_loops=0")
    t_noeps = run_one("eps_crit=0")
    print(f"criticality-rebuild share <= {(t_full-t_nocrit)*1e3:7.1f} ms; "
          f"whole-criticality share ~ {(t_full-t_noeps)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
