"""Box/step geometry kernels.

Static-shape, fully vectorized equivalents of the reference's coordinate
utilities (``src/utilities.jl``): box projection, local trust-region bounds,
and the closed-form max-stepsize computation ``_intersect_bounds``
(``src/utilities.jl:156-287``). All functions are jit/vmap-friendly: no
data-dependent Python control flow, empty constraint blocks are handled by
passing zero-row arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project_into_box(z: jax.Array, lb: jax.Array, ub: jax.Array) -> jax.Array:
    """``min.(max.(z, lb), ub)`` — reference ``src/utilities.jl:122``."""
    return jnp.minimum(jnp.maximum(z, lb), ub)


def local_bounds(x: jax.Array, delta, lb: jax.Array, ub: jax.Array):
    """Intersection of the global box with the trust-region box.

    Reference ``_local_bounds`` (``src/utilities.jl:290-294``).
    """
    return jnp.maximum(lb, x - delta), jnp.minimum(ub, x + delta)


def _crossing_sigmas(ax: jax.Array, b: jax.Array, ad: jax.Array, sense_lb: bool):
    """Step lengths at which ``ax + sigma*ad`` crosses the bound ``b``.

    Vectorized form of ``_intersect_bound_vec`` (``src/utilities.jl:126-152``):
    entries with ``ad == 0`` never cross (+inf); entries starting exactly on
    the bound give 0 if the direction points outward, +inf otherwise.
    ``sense_lb=True`` treats ``b`` as a lower bound on ``ax``, else an upper
    bound (for inequality rows ``a@x <= b`` use ``sense_lb=False``).
    """
    tmp = b - ax
    dir_nz = ad != 0
    tmp_z = tmp == 0
    safe_ad = jnp.where(dir_nz, ad, 1.0)
    sigma_cross = tmp / safe_ad

    if sense_lb:
        onbound = jnp.where(ad > 0, jnp.inf, 0.0)
    else:
        onbound = jnp.where(ad < 0, jnp.inf, 0.0)

    sigma = jnp.where(tmp_z, onbound, sigma_cross)
    # ad == 0 (and not on the bound): constraint value never changes.
    # If infeasible already the reference still returns a crossing ratio of
    # +/-inf via division; we mirror "never crosses" with +inf, matching the
    # feasible-start contract of the caller sites.
    return jnp.where(dir_nz | tmp_z, sigma, jnp.inf)


def intersect_bounds(
    x: jax.Array,
    d: jax.Array,
    lb: jax.Array | None = None,
    ub: jax.Array | None = None,
    A_ineq: jax.Array | None = None,
    b_ineq: jax.Array | None = None,
    ineq_mask: jax.Array | None = None,
    ret_mode: str = "pos",
):
    """Maximum step ``sigma`` with ``lb <= x + sigma*d <= ub`` and
    ``A_ineq @ (x + sigma*d) <= b_ineq``.

    Inequality-only path of ``_intersect_bounds`` (``src/utilities.jl:172-221``)
    — the equality-constrained path is handled separately by the descent code.

    ``ret_mode``: ``'pos'`` returns the largest feasible sigma >= 0 (0 if the
    positive ray is immediately blocked), ``'neg'`` symmetric for sigma <= 0,
    ``'absmax'`` whichever of the two has larger magnitude, ``'both'`` the pair
    ``(neg, pos)``. ``ineq_mask`` masks padded constraint rows.
    """
    sigmas = []
    if lb is not None:
        sigmas.append(_crossing_sigmas(x, lb, d, sense_lb=True))
    if ub is not None:
        sigmas.append(_crossing_sigmas(x, ub, d, sense_lb=False))
    if A_ineq is not None and A_ineq.shape[0] > 0:
        ax = A_ineq @ x
        ad = A_ineq @ d
        b = jnp.zeros(A_ineq.shape[0], x.dtype) if b_ineq is None else b_ineq
        s = _crossing_sigmas(ax, b, ad, sense_lb=False)
        if ineq_mask is not None:
            s = jnp.where(ineq_mask, s, jnp.inf)
        sigmas.append(s)

    if not sigmas:
        big = jnp.asarray(jnp.inf, x.dtype)
        if ret_mode == "pos":
            return big
        if ret_mode == "neg":
            return -big
        if ret_mode == "both":
            return -big, big
        return big

    sigma = jnp.concatenate(sigmas)
    nonneg = sigma >= 0

    # sigma_pos = min over nonnegative entries, 0 if there are none
    # (src/utilities.jl:196-209). "if zero d -> Inf" (":168-170").
    pos_vals = jnp.where(nonneg, sigma, jnp.inf)
    sigma_pos = jnp.where(jnp.any(nonneg), jnp.min(pos_vals), 0.0)
    neg_vals = jnp.where(~nonneg, sigma, -jnp.inf)
    sigma_neg = jnp.where(jnp.any(~nonneg), jnp.max(neg_vals), 0.0)

    d_is_zero = jnp.all(d == 0)
    sigma_pos = jnp.where(d_is_zero, jnp.inf, sigma_pos)
    sigma_neg = jnp.where(d_is_zero, jnp.inf, sigma_neg)

    if ret_mode == "pos":
        return sigma_pos
    if ret_mode == "neg":
        return sigma_neg
    if ret_mode == "absmax":
        return jnp.where(jnp.abs(sigma_pos) >= jnp.abs(sigma_neg), sigma_pos, sigma_neg)
    if ret_mode == "both":
        return sigma_neg, sigma_pos
    raise ValueError(f"unknown ret_mode {ret_mode!r}")


def intersect_box(x, d, lb, ub, ret_mode: str = "absmax"):
    """``intersect_box`` (``src/utilities.jl:285-287``)."""
    return intersect_bounds(x, d, lb, ub, ret_mode=ret_mode)


def scale_to_unit(x, lb, ub):
    """Affine map of finitely-bounded coordinates onto [0,1]^n.

    Mirrors ``_scale`` (``src/utilities.jl:91-96``): infinite bounds leave the
    coordinate untouched.
    """
    w = ub - lb
    finite = jnp.isfinite(w)
    w_ = jnp.where(finite, w, 1.0)
    lb_ = jnp.where(finite, lb, 0.0)
    return (x - lb_) / w_


def unscale_from_unit(x_scaled, lb, ub):
    """Inverse of :func:`scale_to_unit` (``src/utilities.jl:109-112``)."""
    w = ub - lb
    finite = jnp.isfinite(w)
    return jnp.where(finite, x_scaled * jnp.where(finite, w, 1.0) + jnp.where(finite, lb, 0.0), x_scaled)
