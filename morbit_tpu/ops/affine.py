"""Affinely-independent point selection (masked greedy QR-projection filter).

Static-shape re-design of the reference's stateful iterator
``AffinelyIndependentPointFilter`` (``src/models/AffinelyIndependentPoints.jl``)
used for RBF training-set rounds 1 and 2 (``src/models/RbfModel.jl:205-265``).

Semantics faithfully mirrored:

* the *first* accepted candidate of a filter run is the seed with maximum
  ``||s - x0||_inf`` and is accepted *unconditionally*
  (``AffinelyIndependentPoints.jl:51-69``);
* every further candidate maximizes ``||Z @ (Z' @ (s - x0))||_inf`` where the
  columns of ``Z`` span the orthogonal complement of the already-picked
  shifted sites ``Y`` and are normalized to unit inf-norm
  (``AffinelyIndependentPoints.jl:71-106``, ``:4-11``); it is accepted while
  the projection exceeds ``pivot_val``;
* selection stops after ``n_pick`` accepts or when no candidate passes.

The orthogonal complement is computed by an explicit unpivoted Householder QR
with LAPACK's sign convention, so the complement columns match Julia's
``qr(Y).Q[:, k+1:end]`` bit-for-bit at f64 — required for trajectory parity
(improving directions feed round-3 sampling sites).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

#: kernel-safe mode — set (trace-time) by ops.prepare_fused while tracing
#: the fused Pallas prepare kernel: Mosaic cannot lower batched
#: ``dot_general``/``linalg.norm``, so the tiny static-dim contractions
#: below switch to explicit mul-sum forms. The ALGORITHM is shared between
#: both paths; only the contraction primitive differs (float64 golden runs
#: always take the plain primitives).
KERNEL_SAFE = False


def _vdot(a, b):
    if KERNEL_SAFE:
        return jnp.sum(a * b)
    return a @ b


def _vecmat(v, A):
    """v @ A for (k,) @ (k, m)."""
    if KERNEL_SAFE:
        return jnp.sum(v[:, None] * A, axis=0)
    return v @ A


def _matvec(A, v):
    """A @ v for (m, k) @ (k,)."""
    if KERNEL_SAFE:
        return jnp.sum(A * v[None, :], axis=1)
    return A @ v


def _matmul_small(A, B):
    """A @ B for (m, k) @ (k, p) with tiny static p (column loop)."""
    if KERNEL_SAFE:
        return jnp.stack(
            [jnp.sum(A * B[:, j][None, :], axis=1)
             for j in range(B.shape[1])], axis=1)
    return A @ B


def _norm(x):
    if KERNEL_SAFE:
        return jnp.sqrt(jnp.sum(x * x))
    return jnp.linalg.norm(x)


def _eye(n, dtype):
    """Identity built from iota comparisons: Pallas kernels cannot capture
    array constants (and ``jnp.eye`` would be one)."""
    if KERNEL_SAFE:
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        return (r == c).astype(dtype)
    return jnp.eye(n, dtype=dtype)


def _rev_eye(n, dtype):
    """Reversal permutation matrix R[i, k] = [k == n-1-i]."""
    if KERNEL_SAFE:
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        return (r + c == n - 1).astype(dtype)
    import numpy as np

    return jnp.asarray(np.eye(n)[::-1], dtype)


def householder_q(Y: jax.Array, k) -> jax.Array:
    """Full Q factor of the unpivoted Householder QR of ``Y[:, :k]``.

    ``Y`` is (n, kmax) zero-padded beyond column ``k`` (traced int). Columns
    ``>= k`` act as identity reflections, so ``Q[:, k:]`` spans the orthogonal
    complement of the valid columns exactly as Julia's ``qr(Y).Q`` does.
    """
    n, kmax = Y.shape
    dtype = Y.dtype
    Q = _eye(n, dtype)
    A = Y

    # static Python loop (not an unrolled fori): every index below is a
    # Python int, so no dynamic_slice appears — required for the Pallas
    # lowering of the fused prepare kernel (ops/prepare_fused.py), and
    # numerically identical ops in the same order on the plain path
    for j in range(kmax):
        col = A[:, j]
        # zero out entries above the diagonal
        idx = jnp.arange(n)
        x = jnp.where(idx >= j, col, 0.0)
        normx = _norm(x)
        x1 = col[j]
        # LAPACK convention: alpha = -sign(x1)*||x||
        sgn = jnp.where(x1 >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sgn * normx
        v = x - alpha * (idx == j).astype(dtype)
        vnorm2 = _vdot(v, v)
        active = (j < k) & (vnorm2 > 0) & (normx > 0)
        beta = jnp.where(active, 2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0), 0.0)
        # H = I - beta v v';   A <- H A,  Q <- Q H
        A = A - beta * jnp.outer(v, _vecmat(v, A))
        Q = Q - beta * jnp.outer(_matvec(Q, v), v)
    return Q


def orthogonal_complement(Y: jax.Array, k) -> jax.Array:
    """Complement basis with inf-norm-normalized columns.

    Returns (n, n) whose columns ``j >= k`` are the complement (columns
    ``< k`` are meaningless and should be masked by the caller). Mirrors
    ``_orthogonal_complement_matrix`` (``AffinelyIndependentPoints.jl:4-11``).
    """
    Q = householder_q(Y, k)
    norms = jnp.max(jnp.abs(Q), axis=0)
    return Q / jnp.where(norms > 0, norms, 1.0)


class AffineSelection(NamedTuple):
    selected: jax.Array     # (max_seeds,) bool — picked seeds
    order: jax.Array        # (n,) int32 — seed index per pick slot (-1 unused)
    n_picked: jax.Array     # int32 — accepted count *by this call*
    Y: jax.Array            # (n, n) shifted picked sites as zero-padded columns
    k: jax.Array            # int32 — total valid columns of Y (incl. warm start)
    Z: jax.Array            # (n, n) complement basis, columns >= k valid


def affinely_independent_points(
    x0: jax.Array,
    seeds: jax.Array,
    seed_mask: jax.Array,
    pivot_val,
    n_pick,
    Y_init: jax.Array | None = None,
    k_init=0,
) -> AffineSelection:
    """Greedy masked selection of up to ``n_pick`` affinely independent seeds.

    ``seeds``: (max_seeds, n) with ``seed_mask`` validity. ``Y_init``/``k_init``
    warm-start the span from a previous round (round 2 passes round 1's
    ``Y``/``Z``; ``RbfModel.jl:251-265``). ``n_pick`` is a traced/static bound
    counting only *this call's* accepts.
    """
    n = x0.shape[0]
    dtype = x0.dtype
    max_seeds = seeds.shape[0]
    # cast before the minor-dim insert: Mosaic cannot reshape i1 vectors
    shifted = (seeds - x0[None, :]) * seed_mask.astype(dtype)[:, None]

    Y0 = jnp.zeros((n, n), dtype) if Y_init is None else Y_init
    k0 = jnp.asarray(k_init, jnp.int32)
    Z0 = orthogonal_complement(Y0, k0)

    # static Python loop with one-hot/where writes only (no dynamic_slice /
    # dynamic_update_slice / traced gathers): required for the Pallas
    # lowering of the fused prepare kernel (ops/prepare_fused.py). Every
    # substitution is exact: integer/boolean selects, ``score[best]`` ->
    # ``max(score)`` (equal by definition), and the one-hot row gather sums
    # a single value with zeros.
    selected = jnp.zeros((max_seeds,), bool)
    order = -jnp.ones((n,), jnp.int32)
    n_picked = jnp.asarray(0, jnp.int32)
    Y, k, Z = Y0, k0, Z0
    done = jnp.asarray(False)
    seed_ids = jnp.arange(max_seeds)
    slot_ids = jnp.arange(n)

    for _ in range(n):
        avail = seed_mask & (~selected)
        # projection scores; the very first pick of this call scores by plain
        # shifted inf-norm and skips the pivot test (reference ":51-69")
        first = n_picked == 0
        col_mask = (slot_ids >= k).astype(dtype)
        Zm = Z * col_mask[None, :]
        proj = _matmul_small(shifted, Zm)  # (max_seeds, n): (s-x0)' Z
        proj_back = _matmul_small(proj, Zm.T)  # Z (Z'(s-x0)) rows
        score_proj = jnp.max(jnp.abs(proj_back), axis=1)
        score_norm = jnp.max(jnp.abs(shifted), axis=1)
        score = jnp.where(first, score_norm, score_proj)
        score = jnp.where(avail, score, -jnp.inf)

        best = jnp.argmax(score).astype(jnp.int32)
        best_val = jnp.max(score)
        have_any = jnp.any(avail)
        # boolean algebra, not where-on-bools (Mosaic cannot select i1)
        passes = have_any & (first | (best_val > pivot_val))
        accept = passes & (~done) & (n_picked < n_pick) & (k < n)

        onehot = seed_ids == best
        # (cap, 1) mask born 2-D (no i1 reshape — Mosaic limitation)
        best_row = jnp.sum(
            jnp.where(seed_ids[:, None] == best, shifted, 0.0), axis=0)
        selected = selected | (onehot & accept)
        order = jnp.where((slot_ids == n_picked) & accept, best, order)
        Y = jnp.where((slot_ids[None, :] == k) & accept, best_row[:, None], Y)
        k_new = jnp.where(accept, k + 1, k)
        Z = jnp.where(accept, orthogonal_complement(Y, k_new), Z)
        k = k_new
        n_picked = jnp.where(accept, n_picked + 1, n_picked)
        done = done | (~accept)
    return AffineSelection(selected, order, n_picked, Y, k, Z)


def improving_directions_from(Z: jax.Array, k) -> tuple[jax.Array, jax.Array]:
    """Reversed valid complement columns as improving directions.

    The reference collects ``reverse(eachcol(Z))`` (``RbfModel.jl:231-237``):
    direction ``i`` is column ``n-1-i`` of ``Z``. Returns a (n, n) matrix whose
    *rows* are the directions in consumption order plus the valid count
    ``n - k``.
    """
    n = Z.shape[0]
    # row i = column n-1-i. One-hot contraction with the constant reversal
    # matrix (lax.rev / concatenate are not lowerable in the fused Pallas
    # prepare kernel); exact: each output element sums one value with zeros.
    R = _rev_eye(n, Z.dtype)                     # R[i, k] = [k == n-1-i]
    # dirs[i, j] = sum_k R[i, k] Z[j, k] = Z[j, n-1-i]  (no transpose op)
    dirs = jnp.sum(R[:, None, :] * Z[None, :, :], axis=2)
    count = (n - k).astype(jnp.int32)
    return dirs, count
