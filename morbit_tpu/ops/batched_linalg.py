"""Unrolled dense solvers for tiny matrices (TPU hot path).

XLA's batched LU/Cholesky lowerings serialize pivot loops with dynamic
slices and cost milliseconds for ``(B, k, k)`` operands even at ``k <= 16``
(measured on v5e, B=1024, k=9: ``jnp.linalg.solve`` 2.48 ms,
``lu_factor`` 2.34 ms, ``cholesky`` 1.00 ms — tools/profile_linalg.py).
The routines here unroll over the *static* tiny dimension with pure
elementwise/where ops (no gathers, no while loops), so under ``vmap`` every
step is one fused full-batch VPU op: the same k=9 solve runs in ~0.012 ms —
~200x faster.

All functions are written single-instance (``A (k, k)``) and are
vmap-transparent. Row pivoting uses where-selects, never dynamic indexing.

Precision policy: float64 callers (CPU parity / golden-trajectory runs)
should keep ``jnp.linalg`` for bit-stability with round-1 goldens — use
:func:`solve_small`, which dispatches on dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gj_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``A x = b`` by Gauss-Jordan elimination with partial pivoting.

    ``A``: (k, k), ``b``: (k,) or (k, m); unrolled over static k. Singular
    systems produce inf/nan (like LU), which callers detect with their
    existing ``isfinite`` / residual fallbacks.
    """
    k = A.shape[0]
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    M = jnp.concatenate([A, B], axis=1)  # (k, k + m)
    rows = jnp.arange(k)
    for col in range(k):
        sub = jnp.abs(M[col:, col])
        piv = jnp.argmax(sub) + col                      # traced scalar
        is_piv = rows == piv                             # (k,)
        is_col = rows == col                             # (k,) static pattern
        # swap rows col <-> piv via where-selects (gather-free)
        row_piv = jnp.sum(jnp.where(is_piv[:, None], M, 0.0), axis=0)
        row_col = M[col]
        M = jnp.where(is_col[:, None], row_piv[None, :],
                      jnp.where(is_piv[:, None], row_col[None, :], M))
        # normalize pivot row, eliminate the column everywhere else
        pivrow = M[col] / M[col, col]
        factors = M[:, col:col + 1]
        M = jnp.where(is_col[:, None], pivrow[None, :],
                      M - factors * pivrow[None, :])
    X = M[:, k:]
    return X[:, 0] if vec else X


def gj_inverse(A: jax.Array) -> jax.Array:
    """Inverse via :func:`gj_solve` against the identity."""
    return gj_solve(A, jnp.eye(A.shape[0], dtype=A.dtype))


#: unrolled solves win below this size; above it the O(k^3)-op unrolled
#: graph blows up trace/compile size and XLA's batched LU amortizes
#: (the v5e measurements cover k <= 16; ZDT n=15 RBF KKTs reach k=151)
GJ_MAX_K = 24

#: blocked Gauss-Jordan covers the mid-size band (RBF KKT systems at
#: n_vars = 7..15 are 44x44 .. 151x151 — past GJ_MAX_K but far below where
#: XLA's batched LU becomes competitive, its per-column pivot loop costing
#: ~0.25 ms/column at B=1024 on v5e)
BLOCKED_GJ_MAX_K = 512
#: panel width: per-column panel work is O(B*k*r) slab traffic, trailing
#: updates are rank-r one-hot GEMMs — r=16 balances the two
GJ_PANEL = 16


def blocked_gj_solve(A: jax.Array, b: jax.Array, r: int = GJ_PANEL) -> jax.Array:
    """Blocked Gauss-Jordan with partial pivoting for mid-size systems.

    Single-instance ``A (k, k)``, ``b (k,)``/``(k, m)``; vmap-transparent
    (every step is elementwise/select/matmul — no gathers, no scatters, no
    while loops). Panels of ``r`` columns are eliminated at once:

    1. an unrolled within-panel GJ pass picks the ``r`` pivot rows with
       standard partial pivoting (cheap ``(k, r)`` slab ops);
    2. the block-elimination identity ``M <- M - F D^-1 M_S`` (``F`` the
       original panel, ``D`` its pivot block, ``S`` the pivot rows) applies
       the whole panel's elimination as TWO rank-``r`` matmuls — MXU work
       instead of ``r`` full-matrix elementwise sweeps. One-hot matmuls
       stand in for row gathers/scatters (TPU-friendly).

    Singular systems yield inf/nan like LU; callers keep their residual
    fallbacks. Replaces ``jnp.linalg.solve`` whose batched LU lowering
    serializes a dynamic-slice pivot loop (~0.25 ms/column at B=1024 on
    v5e — 20+ ms for the ZDT n=10 RBF KKT at k=77).
    """
    k = A.shape[0]
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    m = B.shape[1]
    M = jnp.concatenate([A, B], axis=1)  # (k, k+m)
    rows = jnp.arange(k)
    avail = jnp.ones((k,), bool)
    all_onehots = []
    for p0 in range(0, k, r):
        rc = min(r, k - p0)
        F = M[:, p0:p0 + rc]                          # original panel (k, rc)
        # ---- within-panel GJ: pivot selection only
        P = F
        onehots = []
        for c in range(rc):
            colv = jnp.where(avail, jnp.abs(P[:, c]), -1.0)
            oh = rows == jnp.argmax(colv)             # (k,)
            onehots.append(oh)
            avail = avail & (~oh)
            pivrow = jnp.sum(jnp.where(oh[:, None], P, 0.0), axis=0)
            pivrow = pivrow / pivrow[c]
            P = jnp.where(oh[:, None], pivrow[None, :],
                          P - P[:, c:c + 1] * pivrow[None, :])
        OH = jnp.stack(onehots).astype(M.dtype)       # (rc, k)
        all_onehots.append(OH)
        # ---- block elimination of the whole panel
        PivRows = OH @ M                              # (rc, k+m) original rows
        D = PivRows[:, p0:p0 + rc]                    # (rc, rc) pivot block
        Dinv = gj_inverse(D)
        any_oh = jnp.sum(OH, axis=0) > 0.5            # (k,)
        E = jnp.where(any_oh[:, None], 0.0, F @ Dinv)  # (k, rc)
        M = M - E @ PivRows
        M = jnp.where(any_oh[:, None], OH.T @ (Dinv @ PivRows), M)
    OHall = jnp.concatenate(all_onehots, axis=0)      # (k, k) row j -> pivot j
    X = OHall @ M[:, k:]
    return X[:, 0] if vec else X


def solve_small(A: jax.Array, b: jax.Array) -> jax.Array:
    """Size + dtype dispatch: unrolled Gauss-Jordan for tiny systems and
    blocked Gauss-Jordan for mid-size systems at <= 32-bit (TPU perf path),
    ``jnp.linalg.solve`` otherwise (float64 keeps CPU parity/golden
    trajectories bit-identical to round 1; very large k falls back to the
    library lowering)."""
    if jnp.finfo(A.dtype).bits <= 32:
        if A.shape[-1] <= GJ_MAX_K:
            return gj_solve(A, b)
        if A.shape[-1] <= BLOCKED_GJ_MAX_K:
            return blocked_gj_solve(A, b)
    if b.ndim == 1:
        return jnp.linalg.solve(A, b[:, None])[:, 0]
    return jnp.linalg.solve(A, b)


def chol_factor(M: jax.Array) -> jax.Array:
    """Unrolled Cholesky of an SPD (k, k) matrix; returns lower L.

    Breakdown (non-SPD input) yields nan entries, detectable with
    ``isfinite`` exactly like ``jnp.linalg.cholesky``."""
    k = M.shape[0]
    L = [[None] * k for _ in range(k)]
    for j in range(k):
        s = M[j, j]
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        L[j][j] = jnp.sqrt(s)
        for i in range(j + 1, k):
            s2 = M[i, j]
            for t in range(j):
                s2 = s2 - L[i][t] * L[j][t]
            L[i][j] = s2 / L[j][j]
    zero = jnp.zeros_like(M[0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(k)])
            for i in range(k)]
    return jnp.stack(rows)


def chol_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``L L' x = b`` by unrolled forward/back substitution.

    ``L``: (k, k) lower triangular; ``b``: (k,)."""
    k = L.shape[0]
    y = [None] * k
    for i in range(k):
        s = b[i]
        for t in range(i):
            s = s - L[i, t] * y[t]
        y[i] = s / L[i, i]
    x = [None] * k
    for i in reversed(range(k)):
        s = y[i]
        for t in range(i + 1, k):
            s = s - L[t, i] * x[t]
        x[i] = s / L[i, i]
    return jnp.stack(x)
