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


def get_var_scaler(lb, ub, mode: str = "default") -> VarScaler:
    """Pick the scaler from the config setting (``VarScaler.jl:195-238``).

    ``mode``: 'default'/'auto' use unit-cube scaling when all bounds are
    finite, 'none' disables scaling. (The ':auto' finite-difference
    Jacobian estimation branch for unbounded problems falls back to no
    scaling here; see ``_estimate_linear_scaling``, to be driven host-side.)
    """
    lb = jnp.asarray(lb)
    ub = jnp.asarray(ub)
    finite = bool(np.all(np.isfinite(np.asarray(lb))) and np.all(np.isfinite(np.asarray(ub))))
    if mode in ("default", "auto") and finite:
        return unit_cube_scaling(lb, ub)
    return no_scaling(lb, ub)
