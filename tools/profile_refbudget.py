"""Where does the reference-default-budget solve spend its time?

tools/profile_qp_share.py showed the QP splitting steps are ~free at
qp_iters=400 (slope ~0 between 100 and 400 iters).  The solve runs ~36-39
while-loop trips (mean lane retires at ~12) at ~7.5 ms/trip vs ~2.6 ms/trip
at the bench config — so the cost lives in the LATE iterations, where
converged-but-unstopped lanes cycle through the criticality routine.

This script times the full vmapped solve at max_iter = K for K up to 100
(marginal cost per extra iteration), then ablates max_critical_loops=0 and
criticality entry (eps_crit=0) at K=100 to bound the criticality share.

Run on the TPU tunnel:  python tools/profile_refbudget.py [B]
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


def timed(f, x0, reps=5):
    out = f(x0)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x0)
    jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / reps


def solve_time(max_iter, B, x0, **cfg):
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=400, **cfg)
    solver = build_solver(mop, ac, jnp.float32)

    def slim(row):
        res = solver.solve(row)
        return res.x, res.n_iterations, res.stop_code

    run = jax.jit(jax.vmap(slim))
    t = timed(run, x0)
    out = run(x0)
    import numpy as np
    it = np.asarray(out[1])
    return t, int(it.max()), float(it.mean())


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print("platform:", jax.devices()[0].platform, " B =", B,
          " qp_iters=400")
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), jnp.float32)

    prev = None
    for K in [5, 10, 15, 20, 30, 40, 100]:
        t, mx, mean = solve_time(K, B, x0)
        d = "" if prev is None else (
            f"   marginal {(t - prev[1]) / (K - prev[0]) * 1e3:7.2f} ms/iter")
        print(f"max_iter={K:3d}: {t*1e3:8.1f} ms  (trips~{mx}, mean lane "
              f"iters {mean:5.1f}){d}", flush=True)
        prev = (K, t)

    t_full = prev[1]
    t_nocrit, mx, mean = solve_time(100, B, x0, max_critical_loops=0)
    print(f"max_iter=100, max_critical_loops=0: {t_nocrit*1e3:8.1f} ms "
          f"(trips~{mx}, mean {mean:5.1f}; criticality-rebuild share ~ "
          f"{(t_full-t_nocrit)*1e3:7.1f} ms)", flush=True)
    t_noeps, mx2, mean2 = solve_time(100, B, x0, eps_crit=0.0)
    print(f"max_iter=100, eps_crit=0:           {t_noeps*1e3:8.1f} ms "
          f"(trips~{mx2}, mean {mean2:5.1f}; whole-criticality share ~ "
          f"{(t_full-t_noeps)*1e3:7.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
