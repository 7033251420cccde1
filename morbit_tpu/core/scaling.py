"""Variable scaling (diagonal affine transform).

Reference: ``src/VarScaler.jl``. The default behaviour is mirrored exactly
(``get_var_scaler``, ``VarScaler.jl:195-238``): finitely box-constrained
problems are scaled onto the unit cube ``[0,1]^n``; otherwise no scaling.
The transform is stored as per-coordinate ``scale``/``offset`` vectors
(``x_hat = scale * x + offset``) — a plain pytree, so it can live inside the
jitted solver state and per-iteration rescaling (``var_scaler_update =
:model``, ``VarScaler.jl:240-260``) stays on-device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class VarScaler(NamedTuple):
    """Diagonal affine scaler ``x_hat = scale*x + offset``."""

    scale: jax.Array    # (n,)
    offset: jax.Array   # (n,)
    lb_scaled: jax.Array  # (n,) internal (scaled) lower bounds
    ub_scaled: jax.Array  # (n,) internal upper bounds


def transform(scal: VarScaler, x: jax.Array) -> jax.Array:
    return scal.scale * x + scal.offset


def untransform(scal: VarScaler, x_scaled: jax.Array) -> jax.Array:
    return (x_scaled - scal.offset) / scal.scale


def jacobian_of_unscaling(scal: VarScaler) -> jax.Array:
    """d(untransform)/d(x_hat) = diag(1/scale) (``VarScaler.jl:33-35``)."""
    return jnp.diag(1.0 / scal.scale)


def no_scaling(lb: jax.Array, ub: jax.Array) -> VarScaler:
    """``NoVarScaling`` (``VarScaler.jl:62-89``)."""
    ones = jnp.ones_like(lb)
    return VarScaler(scale=ones, offset=jnp.zeros_like(lb), lb_scaled=lb, ub_scaled=ub)


def unit_cube_scaling(lb: jax.Array, ub: jax.Array) -> VarScaler:
    """Map the finite box onto [0,1]^n (``VarScaler.jl:205-213``)."""
    w = ub - lb
    scale = 1.0 / w
    offset = -lb * scale
    return VarScaler(
        scale=scale,
        offset=offset,
        lb_scaled=jnp.zeros_like(lb),
        ub_scaled=jnp.ones_like(ub),
    )


MIN_SCALING_FACTOR = 1e-8
MAX_SCALING_FACTOR = 1e8


def estimate_auto_scaler(jacobian: np.ndarray, lb, ub) -> VarScaler:
    """Jacobian-based scaling-factor estimation for (partially) unbounded
    problems (Lasdon & Beck style; ``_estimate_linear_scaling`` +
    ``_scaling_factors``, ``VarScaler.jl:139-193``).

    Bounded coordinates get unit-cube factors ``1/w``; unbounded ones get
    ``exp(mean(log |J_col|))``-style factors matched to the bounded columns'
    mean magnitude, clipped to [1e-8, 1e8]."""
    J = np.asarray(jacobian, float)
    lb = np.asarray(lb, float)
    ub = np.asarray(ub, float)
    w = ub - lb
    bounded = np.isfinite(w)
    factors = np.ones(J.shape[1])

    def col_factor(col, target=None):
        nz = col != 0
        if not nz.any():
            return 1.0
        exp_arg = -np.sum(np.log(np.abs(col[nz])))
        if target is not None:
            exp_arg += np.sum(np.log(np.abs(target[nz])))
        return float(np.exp(exp_arg / nz.sum()))

    if bounded.any():
        J_fin = J[:, bounded] / w[bounded][None, :]
        target_val = np.mean(np.abs(J_fin), axis=1)
        for j in np.where(~bounded)[0]:
            factors[j] = col_factor(J[:, j], target_val)
        factors[bounded] = 1.0 / w[bounded]
    else:
        for j in range(J.shape[1]):
            factors[j] = col_factor(J[:, j])
    factors = np.clip(factors, MIN_SCALING_FACTOR, MAX_SCALING_FACTOR)

    dtype = jnp.result_type(float)
    scale = jnp.asarray(factors, dtype)
    lbj = jnp.asarray(lb, dtype)
    ubj = jnp.asarray(ub, dtype)
    return VarScaler(scale=scale, offset=jnp.zeros_like(scale),
                     lb_scaled=scale * lbj, ub_scaled=scale * ubj)


def estimate_linear_scaling_traced(J, lb, ub, bounded_mask) -> VarScaler:
    """Traced version of :func:`estimate_auto_scaler` for the in-loop
    ``var_scaler_update = :model`` path (``new_var_scaler``,
    ``VarScaler.jl:240-260``). ``bounded_mask`` is a static numpy bool mask
    of finitely-bounded coordinates."""
    import numpy as _np

    dtype = J.dtype
    n = J.shape[1]
    w = ub - lb

    def col_factor(col, log_target_sum, target_nnz):
        nz = col != 0
        nnz = jnp.sum(nz)
        safe = jnp.where(nz, jnp.abs(col), 1.0)
        exp_arg = -jnp.sum(jnp.log(safe)) + log_target_sum
        return jnp.where(nnz > 0,
                         jnp.exp(exp_arg / jnp.maximum(nnz + target_nnz, 1)),
                         1.0)

    bounded_mask = _np.asarray(bounded_mask)
    if bounded_mask.any():
        Jb = J[:, bounded_mask] / w[bounded_mask][None, :]
        target = jnp.mean(jnp.abs(Jb), axis=1)  # (rows,)
    else:
        target = None

    factors = []
    for j in range(n):
        if bounded_mask[j]:
            factors.append(1.0 / w[j])
        else:
            col = J[:, j]
            if target is not None:
                nz = col != 0
                safe_t = jnp.where(nz & (target != 0), jnp.abs(target), 1.0)
                log_t = jnp.sum(jnp.log(safe_t))
                factors.append(col_factor(col, log_t, 0))
            else:
                factors.append(col_factor(col, 0.0, 0))
    scale = jnp.clip(jnp.stack([jnp.asarray(f, dtype) for f in factors]),
                     MIN_SCALING_FACTOR, MAX_SCALING_FACTOR)
    return VarScaler(scale=scale, offset=jnp.zeros_like(scale),
                     lb_scaled=scale * lb, ub_scaled=scale * ub)


def get_var_scaler(lb, ub, mode: str = "default") -> VarScaler:
    """Pick the scaler from the config setting (``VarScaler.jl:195-238``).

    ``mode``: 'default'/'auto' use unit-cube scaling when all bounds are
    finite, 'none' disables scaling. (The ':auto' finite-difference
    Jacobian estimation branch for unbounded problems falls back to no
    scaling here; see ``_estimate_linear_scaling``, to be driven host-side.)
    """
    # finiteness is static metadata: decide on the HOST values before any
    # jnp conversion (inside a trace, jnp.asarray yields a tracer and the
    # decision must not depend on traced data — hit by parametric_multistart,
    # which constructs the Solver inside the traced solve)
    finite = bool(np.all(np.isfinite(np.asarray(lb))) and np.all(np.isfinite(np.asarray(ub))))
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    if mode in ("default", "auto") and finite:
        return unit_cube_scaling(lb, ub)
    return no_scaling(lb, ub)
