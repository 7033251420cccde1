"""Mid-size batched solve: jnp.linalg.solve vs blocked Gauss-Jordan.

VERDICT r2 weakness #3: the tiny-linalg trap re-opens at n >= 7 — ZDT n=10
RBF KKT is 77x77, n=15 is 151x151, both past GJ_MAX_K and falling back to
XLA's batched LU (dynamic-slice pivot loop, ~0.25 ms/column at B=1024).
Measures both paths with the repeat-slope method at the KKT sizes.

Run:  python tools/profile_midsolve.py [B]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.ops.batched_linalg import blocked_gj_solve


def timeit_slope(step, x0, k_lo=1, k_hi=6, reps=3):
    def runner(K):
        return jax.jit(lambda x: jax.lax.fori_loop(
            0, K, lambda i, c: step(c, i), x))

    def timed(f):
        out = f(x0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(x0)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    return (timed(runner(k_hi)) - timed(runner(k_lo))) / (k_hi - k_lo)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = jnp.float32
    print("platform:", jax.devices()[0].platform, " B =", B)
    key = jax.random.PRNGKey(0)

    with jax.default_matmul_precision("highest"):
        for k in (40, 77, 151):
            A0 = (jax.random.normal(key, (B, k, k), dtype)
                  + 4.0 * jnp.eye(k, dtype=dtype))
            b0 = jax.random.normal(key, (B, k), dtype)

            def s_lu(c, i):
                A = A0 + 1e-6 * i
                return c + jnp.linalg.solve(A, b0[..., None])[:, 0, 0]

            t_lu = timeit_slope(s_lu, jnp.zeros((B,), dtype))

            def s_bgj(c, i):
                A = A0 + 1e-6 * i
                return c + jax.vmap(blocked_gj_solve)(A, b0)[:, 0]

            t_b = timeit_slope(s_bgj, jnp.zeros((B,), dtype))

            x_lu = jnp.linalg.solve(A0, b0[..., None])[..., 0]
            x_b = jax.vmap(blocked_gj_solve)(A0, b0)
            err = jnp.max(jnp.abs(x_lu - x_b))
            print(f"k={k:4d}: jnp.linalg.solve {t_lu*1e3:8.2f} ms   "
                  f"blocked_gj {t_b*1e3:8.2f} ms   "
                  f"speedup {t_lu/t_b:6.1f}x   maxdiff {err:.2e}")


if __name__ == "__main__":
    main()
