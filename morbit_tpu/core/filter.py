"""Multiobjective filter for relaxable nonlinear constraints.

Fixed-capacity (theta, f) array with masked dominance tests — the
static-shape redesign of ``MaxFilter``/``StrictFilter``/``DummyFilter``
(``src/AbstractFilterInterface.jl``, ``src/FilterImplementation.jl``).

``MaxFilter`` compares the scalar ``maximum(fx)``; ``StrictFilter`` compares
componentwise. Both are covered by storing f-entries of static width
``f_dim`` (1 for max, m for strict). Entries are envelope-shifted on insert
(``add_entry!``, ``AbstractFilterInterface.jl:32-39``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FilterState(NamedTuple):
    theta: jax.Array  # (cap,)
    fvals: jax.Array  # (cap, f_dim)
    count: jax.Array  # int32
    # True once an insert was DROPPED because the fixed-capacity buffer was
    # full: the reference filter is unbounded (``FilterImplementation.jl``),
    # so a dropped entry weakens acceptability vs the reference — the
    # default capacity (``resolved_filter_capacity``: max_iter + 2, a filter
    # gains <= 1 entry per iteration, ``algorithm.jl:875-877``) makes this
    # unreachable, but an explicit undersized ``filter_capacity`` surfaces
    # here instead of failing silently.
    overflow: jax.Array  # bool


def init_filter(cap: int, f_dim: int, dtype) -> FilterState:
    return FilterState(
        theta=jnp.zeros((cap,), dtype),
        fvals=jnp.zeros((cap, f_dim), dtype),
        count=jnp.asarray(0, jnp.int32),
        overflow=jnp.asarray(False),
    )


def compute_constraint_val(l_e, l_i, c_e, c_i):
    """theta = max(0, max|l_e|, max(l_i), max|c_e|, max(c_i))
    (``AbstractFilterInterface.jl:15-21``). Empty blocks are zero-length
    static arrays and contribute 0."""
    parts = [jnp.zeros((1,), l_e.dtype if l_e.size else jnp.result_type(float))]
    if l_e.shape[0]:
        parts.append(jnp.max(jnp.abs(l_e))[None])
    if l_i.shape[0]:
        parts.append(jnp.max(l_i)[None])
    if c_e.shape[0]:
        parts.append(jnp.max(jnp.abs(c_e))[None])
    if c_i.shape[0]:
        parts.append(jnp.max(c_i)[None])
    return jnp.max(jnp.concatenate(parts))


def compute_objective_val(fx, mode: str):
    """'max' -> maximum(fx) (``FilterImplementation.jl:32-34``);
    'strict' -> fx componentwise (``:47``)."""
    if mode == "max":
        return jnp.max(fx)[None]
    return fx


def add_entry(filt: FilterState, theta_k, f_k, shift) -> FilterState:
    """Envelope-shifted insert (``AbstractFilterInterface.jl:32-39``)."""
    cap = filt.theta.shape[0]
    ok = filt.count < cap
    theta = theta_k - shift * theta_k
    f = f_k - shift * theta_k
    # one-hot selects at the traced per-lane slot (scatter serializes as a
    # lane loop under vmap — see dbm._onehot_write)
    hit = ok & (jnp.arange(cap) == jnp.clip(filt.count, 0, cap - 1))
    return FilterState(
        theta=jnp.where(hit, theta, filt.theta),
        fvals=jnp.where(hit[:, None], f[None, :], filt.fvals),
        count=jnp.where(ok, filt.count + 1, filt.count),
        overflow=filt.overflow | ~ok,
    )


def is_acceptable(filt: FilterState, theta, f) -> jax.Array:
    """(theta, f) vs all stored entries (``AbstractFilterInterface.jl:47-58``):
    dominated iff theta > theta_j AND any(f > f_j) for some entry j."""
    valid = jnp.arange(filt.theta.shape[0]) < filt.count
    dominated = (theta > filt.theta) & jnp.any(f[None, :] > filt.fvals, axis=1)
    return ~jnp.any(dominated & valid)


def is_acceptable_vs(filt: FilterState, theta, f, theta_k, f_k, shift) -> jax.Array:
    """(theta, f) vs filter AND vs the current iterate's shifted envelope
    (``AbstractFilterInterface.jl:60-71``)."""
    ok_k = (theta <= (1.0 - shift) * theta_k) | jnp.all(f <= f_k - shift * theta_k)
    return ok_k & is_acceptable(filt, theta, f)
