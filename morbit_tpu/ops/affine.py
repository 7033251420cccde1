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


def householder_q(Y: jax.Array, k) -> jax.Array:
    """Full Q factor of the unpivoted Householder QR of ``Y[:, :k]``.

    ``Y`` is (n, kmax) zero-padded beyond column ``k`` (traced int). Columns
    ``>= k`` act as identity reflections, so ``Q[:, k:]`` spans the orthogonal
    complement of the valid columns exactly as Julia's ``qr(Y).Q`` does.
    """
    n, kmax = Y.shape
    dtype = Y.dtype
    Q = jnp.eye(n, dtype=dtype)
    A = Y

    def body(j, carry):
        A, Q = carry
        col = A[:, j]
        # zero out entries above the diagonal
        idx = jnp.arange(n)
        x = jnp.where(idx >= j, col, 0.0)
        normx = jnp.linalg.norm(x)
        x1 = col[j]
        # LAPACK convention: alpha = -sign(x1)*||x||
        sgn = jnp.where(x1 >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sgn * normx
        v = x - alpha * (idx == j).astype(dtype)
        vnorm2 = v @ v
        active = (j < k) & (vnorm2 > 0) & (normx > 0)
        beta = jnp.where(active, 2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0), 0.0)
        # H = I - beta v v';   A <- H A,  Q <- Q H
        A = A - beta * jnp.outer(v, v @ A)
        Q = Q - beta * jnp.outer(Q @ v, v)
        return A, Q

    A, Q = jax.lax.fori_loop(0, kmax, body, (A, Q), unroll=True)
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
    shifted = (seeds - x0[None, :]) * seed_mask[:, None].astype(dtype)

    Y0 = jnp.zeros((n, n), dtype) if Y_init is None else Y_init
    k0 = jnp.asarray(k_init, jnp.int32)
    Z0 = orthogonal_complement(Y0, k0)

    def pick_body(i, carry):
        selected, order, n_picked, Y, k, Z, done = carry

        avail = seed_mask & (~selected)
        # projection scores; the very first pick of this call scores by plain
        # shifted inf-norm and skips the pivot test (reference ":51-69")
        first = n_picked == 0
        col_mask = (jnp.arange(n) >= k).astype(dtype)
        Zm = Z * col_mask[None, :]
        proj = shifted @ Zm            # (max_seeds, n): (s-x0)' Z
        proj_back = proj @ Zm.T        # Z (Z'(s-x0)) rows
        score_proj = jnp.max(jnp.abs(proj_back), axis=1)
        score_norm = jnp.max(jnp.abs(shifted), axis=1)
        score = jnp.where(first, score_norm, score_proj)
        score = jnp.where(avail, score, -jnp.inf)

        best = jnp.argmax(score)
        best_val = score[best]
        have_any = jnp.any(avail)
        passes = jnp.where(first, have_any, have_any & (best_val > pivot_val))
        accept = passes & (~done) & (n_picked < n_pick) & (k < n)

        selected = selected.at[best].set(jnp.where(accept, True, selected[best]))
        order = order.at[n_picked].set(
            jnp.where(accept, best.astype(jnp.int32), order[n_picked])
        )
        newY = Y.at[:, k].set(shifted[best])
        Y = jnp.where(accept, newY, Y)
        k_new = jnp.where(accept, k + 1, k)
        Z = jnp.where(accept, orthogonal_complement(Y, k_new), Z)
        n_picked = jnp.where(accept, n_picked + 1, n_picked)
        done = done | (~accept)
        return selected, order, n_picked, k_new, Y, k_new, Z, done

    # re-pack carry order (k duplicated above by mistake-proofing); use scan-safe tuple
    def body(i, carry):
        selected, order, n_picked, Y, k, Z, done = carry
        out = pick_body(i, (selected, order, n_picked, Y, k, Z, done))
        selected, order, n_picked, _, Y, k, Z, done = out
        return selected, order, n_picked, Y, k, Z, done

    carry = (
        jnp.zeros((max_seeds,), bool),
        -jnp.ones((n,), jnp.int32),
        jnp.asarray(0, jnp.int32),
        Y0,
        k0,
        Z0,
        jnp.asarray(False),
    )
    carry = jax.lax.fori_loop(0, n, body, carry, unroll=True)
    selected, order, n_picked, Y, k, Z, _ = carry
    return AffineSelection(selected, order, n_picked, Y, k, Z)


def improving_directions_from(Z: jax.Array, k) -> tuple[jax.Array, jax.Array]:
    """Reversed valid complement columns as improving directions.

    The reference collects ``reverse(eachcol(Z))`` (``RbfModel.jl:231-237``):
    direction ``i`` is column ``n-1-i`` of ``Z``. Returns a (n, n) matrix whose
    *rows* are the directions in consumption order plus the valid count
    ``n - k``.
    """
    n = Z.shape[0]
    dirs = Z[:, ::-1].T  # row i = column n-1-i
    count = (n - k).astype(jnp.int32)
    return dirs, count
