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

Storage layout (TPU perf, round 3): sites, values and the evaluated flag are
PACKED into one ``(cap, n + m + 1)`` array. Each distinct buffer carried
across a ``while_loop`` boundary pays a fixed ~0.4-0.7 ms alternate-memory
copy stall at B=1024 on v5e **independent of its size** (measured,
tools/profile_trace.py), so one packed buffer beats three logical ones.
``X`` / ``Y`` / ``evaluated`` remain available as read-only views.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Database:
    """Packed evaluation database; ``n``/``m`` are static metadata."""

    data: jax.Array   # (cap, n + m + 1): [sites | values | evaluated-flag]
    count: jax.Array  # int32 fill counter
    # True once an insert was DROPPED because the database was full: the
    # reference ``ArrayDB`` is append-only and unbounded, so a dropped row
    # means the model silently trains on fewer points than the reference
    # would. ``resolved_db_capacity`` sizes the buffer so this is
    # unreachable by default; an explicit undersized ``db_capacity``
    # surfaces here (and in the final report) instead of failing silently.
    overflow: jax.Array  # bool
    n: int
    m: int

    def tree_flatten(self):
        return (self.data, self.count, self.overflow), (self.n, self.m)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0], aux[1])

    # ---- read-only views (the pre-packing field API)
    @property
    def X(self) -> jax.Array:
        return self.data[..., :, : self.n]

    @property
    def Y(self) -> jax.Array:
        return self.data[..., :, self.n: self.n + self.m]

    @property
    def evaluated(self) -> jax.Array:
        return self.data[..., :, self.n + self.m] > 0.5


def _row(db: Database, x, y, evaluated):
    """Assemble one packed row."""
    flag = jnp.asarray(evaluated, db.data.dtype).reshape((1,))
    return jnp.concatenate([x, y, flag])


def init_database(cap: int, n: int, m: int, dtype) -> Database:
    return Database(
        data=jnp.zeros((cap, n + m + 1), dtype),
        count=jnp.asarray(0, jnp.int32),
        overflow=jnp.asarray(False),
        n=n, m=m,
    )


def valid_mask(db: Database) -> jax.Array:
    return jnp.arange(db.data.shape[0]) < db.count


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
    cap = db.data.shape[0]
    ok = jnp.asarray(do_add) & (db.count < cap)
    idx = jnp.where(ok, db.count, -1).astype(jnp.int32)
    row = _row(db, x, jnp.zeros((db.m,), db.data.dtype), 0.0)
    data = _onehot_write(db.data, db.count, row, ok)
    count = jnp.where(ok, db.count + 1, db.count)
    overflow = db.overflow | (jnp.asarray(do_add) & (db.count >= cap))
    return dataclasses.replace(db, data=data, count=count,
                               overflow=overflow), idx


def _onehot_write(data, slot, row, ok):
    """Write ``row`` at ``slot`` as a one-hot SELECT, not a scatter.

    ``data.at[slot].set(row)`` with a traced per-lane slot lowers, under
    vmap on TPU, to a batched scatter that XLA serializes as a while-loop
    over the batch (~3.5 ms per insert at B=1024 — traced; the per-lane
    (1, w) dynamic-update-slices dominated the whole iteration). The dense
    masked select is one fused vector op over (cap, w) and batches
    perfectly. Values are bit-identical either way."""
    cap = data.shape[0]
    hit = (jnp.arange(cap) == slot) & ok
    return jnp.where(hit[:, None], row[None, :], data)


def add_evaluated(db: Database, x: jax.Array, y: jax.Array, do_add=True) -> tuple[Database, jax.Array]:
    """Insert a site together with its values (``put_eval_result_into_db!``,
    ``Databases.jl:390-401``)."""
    cap = db.data.shape[0]
    ok = jnp.asarray(do_add) & (db.count < cap)
    idx = jnp.where(ok, db.count, -1).astype(jnp.int32)
    row = _row(db, x, y, 1.0)
    data = _onehot_write(db.data, db.count, row, ok)
    count = jnp.where(ok, db.count + 1, db.count)
    overflow = db.overflow | (jnp.asarray(do_add) & (db.count >= cap))
    return dataclasses.replace(db, data=data, count=count,
                               overflow=overflow), idx


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
    cap = db.data.shape[0]
    n, m = db.n, db.m
    one = jnp.asarray(1.0, db.data.dtype)
    if window is None or window >= cap:
        missing = valid_mask(db) & (~db.evaluated)
        if eval_batch_masked is not None:
            # host black-box path: ONE callback, user code physically runs
            # only at the missing rows (``eval_missing!`` parity)
            new_vals = eval_batch_masked(db.X, missing)
        else:
            new_vals = jax.vmap(eval_fn_scaled)(db.X)
        new_rows = jnp.concatenate(
            [new_vals, jnp.full((cap, 1), one)], axis=1)
        tail = jnp.where(missing[:, None], new_rows, db.data[:, n:])
        data = jnp.concatenate([db.data[:, :n], tail], axis=1)
        n_evals = jnp.sum(missing).astype(jnp.int32)
        return dataclasses.replace(db, data=data), n_evals

    start = jnp.clip(db.count - window, 0, cap - window)
    Dw = jax.lax.dynamic_slice_in_dim(db.data, start, window, axis=0)
    Xw = Dw[:, :n]
    idx = start + jnp.arange(window)
    missing_w = (idx < db.count) & (Dw[:, n + m] <= 0.5)
    if eval_batch_masked is not None:
        vals_w = eval_batch_masked(Xw, missing_w)
    else:
        vals_w = jax.vmap(eval_fn_scaled)(Xw)
    new_rows = jnp.concatenate(
        [Xw, vals_w, jnp.full((window, 1), one)], axis=1)
    Dw_new = jnp.where(missing_w[:, None], new_rows, Dw)
    # write the window back row-by-row as one-hot SELECTS (static unroll):
    # a dynamic_update_slice at a traced per-lane ``start`` lowers, under
    # vmap on TPU, to a batched scatter serialized as a while-loop over the
    # batch (see _onehot_write) — window is small and static, so ``window``
    # dense selects are far cheaper
    data = db.data
    for j in range(window):
        data = _onehot_write(data, start + j, Dw_new[j],
                             jnp.asarray(True))
    n_evals = jnp.sum(missing_w).astype(jnp.int32)
    return dataclasses.replace(db, data=data), n_evals


def results_in_box(
    db: Database,
    lb: jax.Array,
    ub: jax.Array,
    exclude_index=None,
) -> jax.Array:
    """Mask of valid rows inside the box (``results_in_box_indices``,
    ``Databases.jl:324-327``), optionally excluding one row (the center)."""
    X = db.X
    inside = jnp.all((X >= lb[None, :]) & (X <= ub[None, :]), axis=1)
    mask = valid_mask(db) & inside
    if exclude_index is not None:
        mask = mask & (jnp.arange(X.shape[0]) != exclude_index)
    return mask


def get_rows(db: Database, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Gather (sites, values) for index array ``idx``; idx < 0 gives zeros."""
    safe = jnp.clip(idx, 0, db.data.shape[0] - 1)
    ok = (idx >= 0)[:, None]
    rows = jnp.where(ok, db.data[safe], 0.0)
    return rows[:, : db.n], rows[:, db.n: db.n + db.m]


def compact_to_row(db: Database, idx) -> Database:
    """Drop all history except row ``idx`` (moved to row 0).

    The ``use_db = false`` / ``MockDB`` analogue (``Databases.jl:11-32``,
    ``AbstractConfigInterface.jl:22``): with storage disabled the reference
    remembers nothing between iterations; here the per-iteration working
    set still needs a buffer, so we keep a *tiny* database and reset it to
    the current iterate's row at the start of every iteration. ``idx < 0``
    empties the database."""
    keep = jnp.asarray(idx) >= 0
    safe = jnp.clip(idx, 0, db.data.shape[0] - 1)
    row = db.data[safe]
    flag_col = db.n + db.m
    row = row.at[flag_col].set(jnp.where(keep, row[flag_col], 0.0))
    data = db.data.at[0].set(row)
    # invalidate the evaluated flag of stale rows (validity is count-driven,
    # so clearing the flag column is enough to keep the views consistent)
    data = data.at[1:, flag_col].set(0.0)
    return dataclasses.replace(
        db, data=data, count=jnp.where(keep, 1, 0).astype(jnp.int32))


def rescale(db: Database, old_scale, old_offset, new_scale, new_offset) -> Database:
    """Re-transform stored sites when the variable scaler changes
    (``transform!/untransform!``, ``Databases.jl`` + ``algorithm.jl:661-679``)."""
    X = db.X
    X_unscaled = (X - old_offset[None, :]) / old_scale[None, :]
    X_new = X_unscaled * new_scale[None, :] + new_offset[None, :]
    X_sel = jnp.where(valid_mask(db)[:, None], X_new, X)
    data = jnp.concatenate([X_sel, db.data[:, db.n:]], axis=1)
    return dataclasses.replace(db, data=data)
