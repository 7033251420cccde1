"""Mid-size batched KKT solve: blocked Gauss-Jordan vs jnp.linalg.solve.

Round-2 VERDICT weakness #3: the RBF fit KKT at ZDT n=10 is 77x77 and at
n=15 is 151x151 — past ``GJ_MAX_K`` (unrolled-graph blowup) but in the
regime where XLA's batched LU lowering serializes a dynamic-slice pivot
loop. ``ops.batched_linalg.blocked_gj_solve`` covers this band with
panelled one-hot-GEMM elimination; this tool records the measured ratio
with the repeat-slope method (two chained-repeat counts inside one jit,
input perturbed per repeat — result caches and transfer overhead cancel).

Run on the TPU tunnel:  python tools/profile_midsize_kkt.py [B]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.ops.batched_linalg import blocked_gj_solve


def timeit_slope(step, c0, k_lo=1, k_hi=3, reps=4):
    def runner(k):
        @jax.jit
        def f(c):
            for i in range(k):
                c = step(c, i)
            return c
        return f

    def timed(f):
        out = f(c0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(c0)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    return (timed(runner(k_hi)) - timed(runner(k_lo))) / (k_hi - k_lo)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtype = jnp.float32
    print("platform:", jax.devices()[0].platform, " B =", B, flush=True)
    key = jax.random.PRNGKey(0)
    for k in (77, 151):
        A0 = (jax.random.normal(key, (B, k, k), dtype)
              + 3.0 * k * jnp.eye(k, dtype=dtype))
        b0 = jax.random.normal(key, (B, k), dtype)
        with jax.default_matmul_precision("highest"):
            def s_lu(c, i, A0=A0, b0=b0):
                A = A0 + 1e-6 * i
                return c + jnp.linalg.solve(A, (b0 + c[..., None])[..., None]
                                            )[:, 0, 0]

            t_lu = timeit_slope(s_lu, jnp.zeros((B,), dtype))

            def s_bgj(c, i, A0=A0, b0=b0):
                A = A0 + 1e-6 * i
                return c + jax.vmap(blocked_gj_solve)(A, b0 + c[..., None]
                                                      )[:, 0]

            t_bgj = timeit_slope(s_bgj, jnp.zeros((B,), dtype))
            x_lu = jnp.linalg.solve(A0, b0[..., None])[..., 0]
            x_bg = jax.vmap(blocked_gj_solve)(A0, b0)
            r = jnp.max(jnp.abs(jnp.einsum("bij,bj->bi", A0, x_bg) - b0))
            print(f"k={k:4d}: jnp.linalg.solve {t_lu*1e3:8.3f} ms   "
                  f"blocked_gj {t_bgj*1e3:8.3f} ms   "
                  f"ratio {t_lu/t_bgj:6.1f}x   bgj residual {r:.2e}   "
                  f"maxdiff {jnp.max(jnp.abs(x_lu-x_bg)):.2e}", flush=True)


if __name__ == "__main__":
    main()
