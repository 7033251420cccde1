"""Microbenchmark: batch-leading (vmap) vs batch-minor ADMM layouts on TPU.

Round-2 perf roadmap item 1 (CLAUDE.md): state arrays with tiny trailing
dims waste up to 64x of the (8,128) lane tiling. This script measures the
actual gap on the steepest-descent LP shape of the north-star bench
(nv=3 variables, m=6 rows, B=1024, 100 ADMM iterations, f32) before
committing to the batch-minor QP kernel rewrite.

Run on the real TPU:  python tools/profile_qp_layout.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.ops.qp import solve_qp


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def make_problems(B, n, m, key, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    A = jax.random.normal(k1, (B, m, n), dtype)
    q = jax.random.normal(k2, (B, n), dtype)
    l = -jnp.abs(jax.random.normal(k3, (B, m), dtype)) - 0.1
    u = jnp.abs(jax.random.normal(k3, (B, m), dtype)) + 0.1
    P = jnp.zeros((B, n, n), dtype)
    return P, q, A, l, u


def admm_minor(P, q, A, l, u, iters=100, sigma=1e-4, rho=0.1, alpha=1.6):
    """Batch-minor ADMM core: P (n,n,B), q (n,B), A (m,n,B), l/u (m,B).

    Unrolled tiny-n Cholesky + substitution; every array op is over the
    B-lane axis."""
    n = q.shape[0]
    m = A.shape[0]
    dtype = q.dtype

    # M = P + sigma I + A' rho A   -> (n,n,B)
    rho_v = jnp.full_like(l, rho)
    M = P + jnp.einsum("mib,mb,mjb->ijb", A, rho_v, A)
    M = M + sigma * jnp.eye(n, dtype=dtype)[:, :, None]

    # unrolled Cholesky over the two tiny leading dims
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        for i in range(j + 1, n):
            s = M[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / L[j][j]

    def cho_solve(b):  # b: (n, B) list-wise
        yv = [None] * n
        for i in range(n):
            s = b[i]
            for k in range(i):
                s = s - L[i][k] * yv[k]
            yv[i] = s / L[i][i]
        xv = [None] * n
        for i in reversed(range(n)):
            s = yv[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * xv[k]
            xv[i] = s / L[i][i]
        return jnp.stack(xv)

    def step(_, s):
        z, zz, y = s
        rhs = sigma * z - q + jnp.einsum("mnb,mb->nb", A, rho_v * zz - y)
        xt = cho_solve(rhs)
        zt = jnp.einsum("mnb,nb->mb", A, xt)
        z_new = alpha * xt + (1 - alpha) * z
        zz_arg = alpha * zt + (1 - alpha) * zz + y / rho_v
        zz_new = jnp.clip(zz_arg, l, u)
        y_new = y + rho_v * (alpha * zt + (1 - alpha) * zz - zz_new)
        return z_new, zz_new, y_new

    z0 = jnp.zeros((n, q.shape[1]), dtype)
    zz0 = jnp.clip(jnp.zeros((m, q.shape[1]), dtype), l, u)
    y0 = jnp.zeros((m, q.shape[1]), dtype)
    z, zz, y = jax.lax.fori_loop(0, iters, step, (z0, zz0, y0))
    return z


def main():
    B, n, m = 1024, 3, 6
    iters = 100
    key = jax.random.PRNGKey(0)
    P, q, A, l, u = make_problems(B, n, m, key)
    print("platform:", jax.devices()[0].platform)

    with jax.default_matmul_precision("highest"):
        # current: vmapped single-instance kernel (one rho stage, polish off,
        # to match the minor prototype's work)
        f_lead = jax.jit(jax.vmap(
            lambda Pq, qq, Aq, lq, uq: solve_qp(
                Pq, qq, Aq, lq, uq, iters=iters, polish=False,
                adapt_every=iters).z))
        t_lead = timeit(f_lead, P, q, A, l, u)
        print(f"batch-leading vmap solve_qp: {t_lead*1e3:.3f} ms")

        # full current path (as used by the solver: polish on, adaptation)
        f_full = jax.jit(jax.vmap(
            lambda Pq, qq, Aq, lq, uq: solve_qp(
                Pq, qq, Aq, lq, uq, iters=iters).z))
        t_full = timeit(f_full, P, q, A, l, u)
        print(f"batch-leading vmap solve_qp (+polish/adapt): {t_full*1e3:.3f} ms")

        # batch-minor prototype
        Pm = jnp.transpose(P, (1, 2, 0))
        qm = jnp.transpose(q, (1, 0))
        Am = jnp.transpose(A, (1, 2, 0))
        lm = jnp.transpose(l, (1, 0))
        um = jnp.transpose(u, (1, 0))
        f_minor = jax.jit(lambda *a: admm_minor(*a, iters=iters))
        t_minor = timeit(f_minor, Pm, qm, Am, lm, um)
        print(f"batch-minor ADMM core:       {t_minor*1e3:.3f} ms")

        # correctness cross-check vs the same-work leading variant
        z_lead = f_lead(P, q, A, l, u)
        z_minor = jnp.transpose(f_minor(Pm, qm, Am, lm, um), (1, 0))
        err = jnp.max(jnp.abs(z_lead - z_minor))
        print(f"max |z_lead - z_minor| = {err:.3e}")
        print(f"speedup core-vs-core: {t_lead / t_minor:.1f}x")


if __name__ == "__main__":
    main()
