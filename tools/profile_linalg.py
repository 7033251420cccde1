"""Microbenchmark: XLA batched tiny-matrix solves vs unrolled alternatives.

fit_rbf (two 9x9 KKT solves) costs 8.4 ms at B=1024 (tools/profile_pass.py)
— suspect: jnp.linalg.solve's LU lowering for batched tiny matrices on TPU.
Times the candidate replacements. Slope method over chained repeats inside
one jit (input perturbed per repeat) so dispatch overhead cancels.

Run:  python tools/profile_linalg.py [B]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def gauss_jordan_solve(A, b):
    """Unrolled Gauss-Jordan with partial pivoting for batched tiny systems.

    A: (..., k, k), b: (..., k, m). Static k unrolled; every step is a
    full-batch elementwise op (no gathers/scatters, no while loops)."""
    k = A.shape[-1]
    M = jnp.concatenate([A, b], axis=-1)  # (..., k, k+m)
    for col in range(k):
        piv = jnp.argmax(jnp.abs(M[..., col:, col]), axis=-1) + col  # (...,)
        rows = jnp.arange(k)
        onehot_piv = rows[None, :] == piv[..., None]   # (..., k)
        onehot_col = rows == col                        # (k,)
        # swap row `col` and row `piv` via where-selects
        row_piv = jnp.sum(jnp.where(onehot_piv[..., None], M, 0.0), axis=-2)
        row_col = M[..., col, :]
        M = jnp.where(onehot_col[:, None] & jnp.ones_like(onehot_piv)[..., None],
                      row_piv[..., None, :], M)
        M = jnp.where(onehot_piv[..., None] & (~onehot_col[:, None]),
                      row_col[..., None, :], M)
        # eliminate column col from all other rows
        pivval = M[..., col, col][..., None]
        pivrow = M[..., col, :] / pivval
        M = M.at[..., col, :].set(pivrow)
        factors = M[..., :, col][..., None]             # (..., k, 1)
        upd = M - factors * pivrow[..., None, :]
        M = jnp.where(onehot_col[:, None], M, upd)
    return M[..., :, k:]


def timeit_slope(step, x0, k_lo=1, k_hi=21, reps=5):
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
    k = 9
    A0 = jax.random.normal(key, (B, k, k), dtype) + 3.0 * jnp.eye(k, dtype=dtype)
    b0 = jax.random.normal(key, (B, k, 1), dtype)

    with jax.default_matmul_precision("highest"):
        def s_lu(c, i):
            A = A0 + 1e-6 * i
            return c + jnp.linalg.solve(A, b0 + c[..., None, None] * 0)[:, 0, 0]
        t = timeit_slope(s_lu, jnp.zeros((B,), dtype))
        print(f"jnp.linalg.solve (B,9,9):        {t*1e3:8.3f} ms")

        def s_gj(c, i):
            A = A0 + 1e-6 * i
            return c + gauss_jordan_solve(A, b0)[:, 0, 0]
        t = timeit_slope(s_gj, jnp.zeros((B,), dtype))
        print(f"gauss-jordan unrolled (B,9,9):   {t*1e3:8.3f} ms")

        # accuracy check
        x_lu = jnp.linalg.solve(A0, b0)
        x_gj = gauss_jordan_solve(A0, b0)
        r1 = jnp.max(jnp.abs(A0 @ x_lu - b0))
        r2 = jnp.max(jnp.abs(A0 @ x_gj - b0))
        print(f"residual lu {r1:.2e}  gj {r2:.2e}  diff {jnp.max(jnp.abs(x_lu-x_gj)):.2e}")

        Ac = A0 @ jnp.transpose(A0, (0, 2, 1)) + jnp.eye(k, dtype=dtype)
        def s_cho(c, i):
            A = Ac + 1e-6 * i
            L = jnp.linalg.cholesky(A)
            return c + L[:, 0, 0]
        t = timeit_slope(s_cho, jnp.zeros((B,), dtype))
        print(f"jnp.linalg.cholesky (B,9,9):     {t*1e3:8.3f} ms")

        def s_tri(c, i):
            L = jnp.linalg.cholesky(Ac + 1e-6 * i)
            y = jax.scipy.linalg.solve_triangular(L, b0, lower=True)
            return c + y[:, 0, 0]
        t = timeit_slope(s_tri, jnp.zeros((B,), dtype))
        print(f"cholesky + tri solve (B,9,9):    {t*1e3:8.3f} ms")

        def s_lufac(c, i):
            lu, piv = jax.scipy.linalg.lu_factor(A0 + 1e-6 * i)
            return c + lu[:, 0, 0]
        t = timeit_slope(s_lufac, jnp.zeros((B,), dtype))
        print(f"lu_factor (B,9,9):               {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
