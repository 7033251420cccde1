"""Fixed-capacity on-device evaluation database.

TPU-native redesign of the reference's append-only ``ArrayDB``
(``src/Databases.jl:11-120``): sites/values live in preallocated HBM arrays
with a fill counter, a validity mask implied by the counter, and an
``evaluated`` mask replacing the lazy *unevaluated-ids* list
(``Databases.jl:258-277``, ``eval_missing!``). Insertions are
``array.at[count].set`` updates; box queries are masked reductions, so every
operation is jit/vmap-friendly with static shapes.

One database exists per surrogate group (``SuperDB`` analogue:
``src/Databases.jl:340-350``); sites are stored in *scaled* space, like the
reference stores transformed sites (``set_transformed!``, ``utilities.jl:54``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class Database(NamedTuple):
    X: jax.Array          # (cap, n) scaled sites
    Y: jax.Array          # (cap, m) values (garbage until evaluated)
    evaluated: jax.Array  # (cap,) bool
    count: jax.Array      # int32 fill counter


def init_database(cap: int, n: int, m: int, dtype) -> Database:
    return Database(
        X=jnp.zeros((cap, n), dtype),
        Y=jnp.zeros((cap, m), dtype),
        evaluated=jnp.zeros((cap,), bool),
        count=jnp.asarray(0, jnp.int32),
    )


def valid_mask(db: Database) -> jax.Array:
    return jnp.arange(db.X.shape[0]) < db.count


def add_site(db: Database, x: jax.Array, do_add=True) -> tuple[Database, jax.Array]:
    """Insert an unevaluated site (``new_result!``, ``Databases.jl``).

    Returns the new db and the row index. If the database is full or
    ``do_add`` is false the insert is a no-op and the index is -1. Capacity
    is sized by ``AlgorithmConfig.resolved_db_capacity`` so overflow means a
    configuration error; the solver surfaces it by never evaluating row -1.

    APPEND-ONLY INVARIANT: existing rows are never overwritten in place —
    inserts only touch the slot at ``count`` (and ``eval_missing`` only
    fills values of not-yet-``evaluated`` rows). The criticality-loop
    fixpoint fast-forward (``Solver._criticality_and_trial``) certifies a
    fixpoint from model leaves + ``db.count`` + ``n_evals`` alone; any
    future op that mutates row *contents* without changing those would
    silently invalidate it.
    """
    cap = db.X.shape[0]
    ok = jnp.asarray(do_add) & (db.count < cap)
    idx = jnp.where(ok, db.count, -1).astype(jnp.int32)
    slot = jnp.clip(db.count, 0, cap - 1)
    X = jnp.where(ok, db.X.at[slot].set(x), db.X)
    evaluated = jnp.where(ok, db.evaluated.at[slot].set(False), db.evaluated)
    count = jnp.where(ok, db.count + 1, db.count)
    return Database(X, db.Y, evaluated, count), idx


def add_evaluated(db: Database, x: jax.Array, y: jax.Array, do_add=True) -> tuple[Database, jax.Array]:
    """Insert a site together with its values (``put_eval_result_into_db!``,
    ``Databases.jl:390-401``)."""
    cap = db.X.shape[0]
    ok = jnp.asarray(do_add) & (db.count < cap)
    idx = jnp.where(ok, db.count, -1).astype(jnp.int32)
    slot = jnp.clip(db.count, 0, cap - 1)
    X = jnp.where(ok, db.X.at[slot].set(x), db.X)
    Y = jnp.where(ok, db.Y.at[slot].set(y), db.Y)
    evaluated = jnp.where(ok, db.evaluated.at[slot].set(True), db.evaluated)
    count = jnp.where(ok, db.count + 1, db.count)
    return Database(X, Y, evaluated, count), idx


def eval_missing(
    db: Database,
    eval_fn_scaled: Callable[[jax.Array], jax.Array],
    window: int | None = None,
    eval_batch_masked: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
) -> tuple[Database, jax.Array]:
    """Evaluate all unevaluated rows in one batched call.

    The analogue of ``eval_missing!`` (``Databases.jl:258-277``) — the hook
    the reference uses to "evaluate everything in one go to exploit
    parallelism" — here it is a masked ``vmap`` (one fused kernel). Returns
    the updated db and the number of evaluations performed (for the budget
    counters; masked rows are computed but not counted, matching the
    reference's per-``CountedFunc`` call counting).

    ``window``: static bound on how many trailing rows can be unevaluated
    (rows are append-only and every model-update cycle ends with an
    eval_missing pass, so unevaluated rows live in the tail). When given,
    only that tail slice is evaluated — O(window) instead of O(capacity)
    true-function work per update.

    APPEND-ONLY INVARIANT (see :func:`add_site`): this only fills values of
    rows whose ``evaluated`` flag is unset — already-evaluated rows are
    never recomputed or overwritten, which the criticality fixpoint
    fast-forward depends on.
    """
    cap = db.X.shape[0]
    if window is None or window >= cap:
        missing = valid_mask(db) & (~db.evaluated)
        if eval_batch_masked is not None:
            # host black-box path: ONE callback, user code physically runs
            # only at the missing rows (``eval_missing!`` parity)
            new_vals = eval_batch_masked(db.X, missing)
        else:
            new_vals = jax.vmap(eval_fn_scaled)(db.X)
        Y = jnp.where(missing[:, None], new_vals, db.Y)
        n_evals = jnp.sum(missing).astype(jnp.int32)
        return Database(db.X, Y, db.evaluated | missing, db.count), n_evals

    start = jnp.clip(db.count - window, 0, cap - window)
    Xw = jax.lax.dynamic_slice_in_dim(db.X, start, window, axis=0)
    idx = start + jnp.arange(window)
    missing_w = (idx < db.count) & (~db.evaluated[idx])
    if eval_batch_masked is not None:
        vals_w = eval_batch_masked(Xw, missing_w)
    else:
        vals_w = jax.vmap(eval_fn_scaled)(Xw)
    Yw_old = jax.lax.dynamic_slice_in_dim(db.Y, start, window, axis=0)
    Yw = jnp.where(missing_w[:, None], vals_w, Yw_old)
    Y = jax.lax.dynamic_update_slice_in_dim(db.Y, Yw, start, axis=0)
    evaluated = db.evaluated.at[idx].set(db.evaluated[idx] | missing_w)
    n_evals = jnp.sum(missing_w).astype(jnp.int32)
    return Database(db.X, Y, evaluated, db.count), n_evals


def results_in_box(
    db: Database,
    lb: jax.Array,
    ub: jax.Array,
    exclude_index=None,
) -> jax.Array:
    """Mask of valid rows inside the box (``results_in_box_indices``,
    ``Databases.jl:324-327``), optionally excluding one row (the center)."""
    inside = jnp.all((db.X >= lb[None, :]) & (db.X <= ub[None, :]), axis=1)
    mask = valid_mask(db) & inside
    if exclude_index is not None:
        mask = mask & (jnp.arange(db.X.shape[0]) != exclude_index)
    return mask


def get_rows(db: Database, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Gather (sites, values) for index array ``idx``; idx < 0 gives zeros."""
    safe = jnp.clip(idx, 0, db.X.shape[0] - 1)
    ok = (idx >= 0)[:, None]
    return jnp.where(ok, db.X[safe], 0.0), jnp.where(ok, db.Y[safe], 0.0)


def compact_to_row(db: Database, idx) -> Database:
    """Drop all history except row ``idx`` (moved to row 0).

    The ``use_db = false`` / ``MockDB`` analogue (``Databases.jl:11-32``,
    ``AbstractConfigInterface.jl:22``): with storage disabled the reference
    remembers nothing between iterations; here the per-iteration working
    set still needs a buffer, so we keep a *tiny* database and reset it to
    the current iterate's row at the start of every iteration. ``idx < 0``
    empties the database."""
    keep = jnp.asarray(idx) >= 0
    safe = jnp.clip(idx, 0, db.X.shape[0] - 1)
    return Database(
        X=db.X.at[0].set(db.X[safe]),
        Y=db.Y.at[0].set(db.Y[safe]),
        evaluated=jnp.zeros_like(db.evaluated).at[0].set(
            keep & db.evaluated[safe]),
        count=jnp.where(keep, 1, 0).astype(jnp.int32),
    )


def rescale(db: Database, old_scale, old_offset, new_scale, new_offset) -> Database:
    """Re-transform stored sites when the variable scaler changes
    (``transform!/untransform!``, ``Databases.jl`` + ``algorithm.jl:661-679``)."""
    X_unscaled = (db.X - old_offset[None, :]) / old_scale[None, :]
    X_new = X_unscaled * new_scale[None, :] + new_offset[None, :]
    return db._replace(X=jnp.where(valid_mask(db)[:, None], X_new, db.X))
