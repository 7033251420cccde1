"""Per-iteration-index cost profile of the bench solve.

tools/profile_ablate.py showed marginal late iterations cost ~0 ms (the
active-gated while_loops run zero trips once lanes converge), so the bench's
~141 ms/iter average hides a heavily front-loaded profile. This script times
the FULL vmapped solve at max_iter = K for increasing K: the difference
t(K) - t(K-1) is the true cost of iteration K, with dispatch overhead and
init cost cancelling.

Also reports init alone and the effect of max_critical_loops=0 (criticality
rebuild loop disabled) to bound that loop's share.

Run:  python tools/profile_iters.py [B]
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
    jax.block_until_ready(out.x if hasattr(out, "x") else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x0)
    jax.block_until_ready(out.x if hasattr(out, "x") else out)
    return (time.perf_counter() - t0) / reps


def solve_time(max_iter, B, x0, **cfg):
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=100, **cfg)
    solver = build_solver(mop, ac, jnp.float32)
    run = jax.jit(jax.vmap(solver.solve))
    return timed(run, x0)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print("platform:", jax.devices()[0].platform, " B =", B)
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), jnp.float32)

    prev = None
    for K in [0, 1, 2, 3, 4, 6, 8, 10]:
        t = solve_time(K, B, x0)
        d = "" if prev is None else (
            f"   marginal {(t - prev[1]) / (K - prev[0]) * 1e3:7.1f} ms/iter")
        print(f"max_iter={K:3d}: {t*1e3:8.1f} ms{d}")
        prev = (K, t)

    t0 = solve_time(10, B, x0)
    t_nocrit = solve_time(10, B, x0, max_critical_loops=0)
    print(f"max_iter=10, max_critical_loops=0: {t_nocrit*1e3:8.1f} ms "
          f"(full: {t0*1e3:8.1f} ms, criticality-loop share ~ "
          f"{(t0-t_nocrit)*1e3:7.1f} ms)")


if __name__ == "__main__":
    main()
