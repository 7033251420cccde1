"""Batched RBF interpolation kernels: Gram assembly, masked KKT solve, eval.

TPU-native replacement for the reference's external dependency
``RadialBasisFunctionModels.jl`` (used at ``src/models/RbfModel.jl:759-800``
for fitting and evaluating the interpolants). Training sets have static
capacity ``max_points`` with a validity mask (hard part #2 in SURVEY.md §7):
masked rows of the Gram matrix are replaced by identity rows so the dense
KKT solve stays well-posed and the corresponding weights are exactly zero.

Kernels (sign conventions chosen conditionally-positive-definite compatible
with the reference package; ``src/models/RbfModel.jl:48-54`` lists the five
supported names):

* ``cubic`` (k odd, default 3):            ``(-1)^ceil(k/2) r^k``
* ``gaussian`` (eps, default 1):           ``exp(-(eps*r)^2)``
* ``multiquadric`` (eps, e=1/2):           ``-(1 + (eps*r)^2)^e``
* ``inv_multiquadric`` (eps, e=1/2):       ``(1 + (eps*r)^2)^-e``
* ``thin_plate_spline`` (k int, default 2):``(-1)^(k+1) r^(2k) log(r)``

Gradients/Jacobians of fitted models are obtained by ``jax.jacfwd`` of the
(eval) closure — exact, fused, and free of hand-written derivative code; all
kernels below are written to be autodiff-safe at ``r = 0``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

RBF_KERNELS = ("cubic", "multiquadric", "inv_multiquadric", "gaussian", "thin_plate_spline")


def kernel_default_param(kernel: str) -> float:
    return {"cubic": 3.0, "gaussian": 1.0, "multiquadric": 1.0,
            "inv_multiquadric": 1.0, "thin_plate_spline": 2.0}[kernel]


def apply_kernel(kernel: str, r2: jax.Array, param) -> jax.Array:
    """phi(r) expressed in r^2 for autodiff safety at r = 0.

    For ``cubic``/``thin_plate_spline`` the parameter is an integer exponent
    and must be *static* (a Python number); for the smooth kernels it is the
    shape parameter epsilon and may be a traced scalar (the reference allows
    a trust-region-radius-dependent expression, ``RbfModel.jl:135-143``).
    """
    if kernel == "cubic":
        k = float(param)
        # r^k with k odd -> (r2)^(k/2); safe because d/dr2 (r2^{3/2}) -> 0 at 0
        sign = (-1.0) ** -(-k // 2)
        return sign * r2 ** (k / 2.0)
    if kernel == "gaussian":
        return jnp.exp(-(param ** 2) * r2)
    if kernel == "multiquadric":
        return -jnp.sqrt(1.0 + param ** 2 * r2)
    if kernel == "inv_multiquadric":
        return 1.0 / jnp.sqrt(1.0 + param ** 2 * r2)
    if kernel == "thin_plate_spline":
        k = int(param)
        # r^(2k) log(r) = 0.5 * r2^k * log(r2); guard log at 0 (value & grad -> 0)
        safe_r2 = jnp.where(r2 > 0, r2, 1.0)
        val = 0.5 * ((-1.0) ** (k + 1)) * r2 ** k * jnp.log(safe_r2)
        return jnp.where(r2 > 0, val, 0.0)
    raise ValueError(f"unknown RBF kernel {kernel!r}")


def poly_dim(n_vars: int, poly_deg: int) -> int:
    """Dimension of the polynomial tail basis (deg in {-1, 0, 1})."""
    if poly_deg < 0:
        return 0
    if poly_deg == 0:
        return 1
    if poly_deg == 1:
        return n_vars + 1
    raise ValueError("polynomial_degree must be -1, 0 or 1")


def poly_basis(x: jax.Array, poly_deg: int) -> jax.Array:
    """[1] or [1, x...] rows of the polynomial block Pi (deg<=1, as in the
    reference: ``RbfModel.jl:74`` restricts the tail to degree <= 1)."""
    if poly_deg < 0:
        return jnp.zeros((0,), x.dtype)
    if poly_deg == 0:
        return jnp.ones((1,), x.dtype)
    return jnp.concatenate([jnp.ones((1,), x.dtype), x])


def _pairwise_sqdist(S: jax.Array) -> jax.Array:
    d = S[:, None, :] - S[None, :, :]
    return jnp.sum(d * d, axis=-1)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RbfFit:
    """Fitted coefficients of a (vector-valued) RBF interpolant.

    PACKED into two buffers (TPU perf: every while-loop-carried buffer pays
    a fixed alternate-memory copy stall — tools/profile_trace.py):
    ``fdata (max_pts, n+m+1) = [sites | w | mask]`` and
    ``flam (poly_dim+1, m) = [lam ; param-row]``. The named views keep the
    logical field API."""

    fdata: jax.Array   # (max_pts, n + m + 1)
    flam: jax.Array    # (poly_dim + 1, m)
    n: int
    m: int

    def tree_flatten(self):
        return (self.fdata, self.flam), (self.n, self.m)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1])

    @classmethod
    def pack(cls, sites, mask, w, lam, param):
        n = sites.shape[-1]
        m = w.shape[-1]
        dt = sites.dtype
        fdata = jnp.concatenate(
            [sites, w, jnp.asarray(mask, dt)[..., None]], axis=-1)
        prow = jnp.broadcast_to(jnp.asarray(param, dt), (1, m))
        flam = jnp.concatenate([jnp.asarray(lam, dt), prow], axis=-2)
        return cls(fdata, flam, n, m)

    @property
    def sites(self):
        return self.fdata[..., :, : self.n]

    @property
    def w(self):
        return self.fdata[..., :, self.n: self.n + self.m]

    @property
    def mask(self):
        return self.fdata[..., :, self.n + self.m] > 0.5

    @property
    def lam(self):
        return self.flam[..., : self.flam.shape[-2] - 1, :]

    @property
    def param(self):
        return self.flam[..., self.flam.shape[-2] - 1, 0]


def fit_rbf(
    sites: jax.Array,
    values: jax.Array,
    mask: jax.Array,
    kernel: str = "cubic",
    param=None,
    poly_deg: int = 1,
    reg: float = 0.0,
) -> RbfFit:
    """Solve the interpolation KKT system ``[Phi Pi; Pi' 0][w; lam] = [V; 0]``.

    ``sites``: (max_pts, n); ``values``: (max_pts, m); ``mask``: (max_pts,).
    Masked rows get identity Phi rows/cols, zero Pi rows and zero rhs, so
    their weights vanish without changing the interpolant. When the valid
    point count is below the tail dimension the system is singular; ``reg``
    adds a tiny Tikhonov term on the tail block to keep the solve defined
    (the reference never hits this case on its nominal path because rounds
    1-3 guarantee n+1 affinely independent points; see ``RbfModel.jl:586``).
    """
    max_pts, n = sites.shape
    m = values.shape[1]
    dtype = sites.dtype
    if param is None:
        param = kernel_default_param(kernel)

    mm = mask[:, None] & mask[None, :]
    eye = jnp.eye(max_pts, dtype=dtype)

    # The fused Pallas Gram kernel only pays off once the per-program block
    # is large: under vmap the pallas grid executes sequentially per core, so
    # batched-tiny blocks are faster through XLA's batched lowering
    # (measured at N=66: 38 vs 40 runs/s on ZDT1 n=10).
    if dtype == jnp.float32 and max_pts >= 128:
        from morbit_tpu.ops.pallas_kernels import pallas_available, rbf_gram_matrix

        if pallas_available():
            Phi = rbf_gram_matrix(sites, mask, kernel, param)
        else:
            Phi = jnp.where(mm, apply_kernel(kernel, _pairwise_sqdist(sites), param), eye)
    else:
        Phi = jnp.where(mm, apply_kernel(kernel, _pairwise_sqdist(sites), param), eye)
    # exponent kernels keep the static value; smooth kernels may be traced
    param = jnp.asarray(param, dtype)
    n_valid = jnp.sum(mask).astype(dtype)

    # Conditioning (needed for float32 on TPU): when the tail contains the
    # constant, ``Pi' w = 0`` forces ``1' w = 0``, so adding any multiple of
    # 11' to Phi leaves the interpolant's w unchanged — centering removes the
    # dominant rank-one part (e.g. multiquadric Phi ~ -11' for small radii).
    # A global scale alpha is likewise factored out (w = w_tilde / alpha,
    # lambda unchanged).
    np_ = poly_dim(n, poly_deg)
    if np_ > 0:
        c = jnp.sum(jnp.where(mm, Phi, 0.0)) / jnp.maximum(n_valid ** 2, 1.0)
        Phi_c = Phi - c
    else:
        Phi_c = Phi
    alpha = jnp.maximum(jnp.max(jnp.abs(jnp.where(mm, Phi_c, 0.0))),
                        jnp.asarray(1e-30, dtype))
    Phi_s = jnp.where(mm, Phi_c / alpha, eye)

    if np_ > 0:
        Pi = jax.vmap(lambda s: poly_basis(s, poly_deg))(sites)  # (max_pts, np_)
        Pi = jnp.where(mask[:, None], Pi, 0.0)

        def kkt(extra_reg):
            zero = extra_reg * jnp.eye(np_, dtype=dtype)
            return jnp.block([[Phi_s, Pi], [Pi.T, -zero]])

        rhs = jnp.concatenate([jnp.where(mask[:, None], values, 0.0),
                               jnp.zeros((np_, m), dtype)])
    else:
        def kkt(extra_reg):
            return Phi_s + extra_reg * eye

        rhs = jnp.where(mask[:, None], values, 0.0)

    from morbit_tpu.ops.batched_linalg import GJ_MAX_K, solve_small

    K = kkt(jnp.asarray(reg, dtype))
    sol = solve_small(K, rhs)
    # residual-checked ridge fallback for singular/degenerate systems
    resid = jnp.max(jnp.abs(K @ sol - rhs)) / (jnp.max(jnp.abs(rhs)) + 1.0)
    tol = 1e2 * jnp.sqrt(jnp.finfo(dtype).eps)
    bad = (~jnp.all(jnp.isfinite(sol))) | (resid > tol)
    ridge = max(reg, 1e2 * float(jnp.finfo(dtype).eps))
    k_dim = max_pts + np_
    if k_dim <= GJ_MAX_K:
        # tiny systems: the second solve is ~free and a while-loop boundary
        # would cost more than it saves (CLAUDE.md perf notes)
        sol2 = solve_small(kkt(jnp.asarray(ridge, dtype)), rhs)
    else:
        # mid/large systems: gate the fallback behind a 0/1-trip while_loop
        # so the (expensive) second solve only runs when some instance is
        # actually degenerate — numerically identical to computing it always
        def fb_body(c):
            return (jnp.asarray(False),
                    solve_small(kkt(jnp.asarray(ridge, dtype)), rhs))

        _, sol2 = jax.lax.while_loop(
            lambda c: c[0], fb_body, (bad, jnp.zeros_like(sol)))
    sol = jnp.where(bad, sol2, sol)

    w = jnp.where(mask[:, None], sol[:max_pts] / alpha, 0.0)
    lam = sol[max_pts:]
    return RbfFit.pack(sites, mask, w, lam, param)


def _eval_param(fit: RbfFit, kernel: str, param):
    """Exponent kernels need the static value; smooth kernels reuse the
    (possibly traced) fitted shape parameter."""
    if param is not None:
        return param
    if kernel in ("cubic", "thin_plate_spline"):
        return kernel_default_param(kernel)
    return fit.param


def eval_rbf(fit: RbfFit, x: jax.Array, kernel: str, poly_deg: int, param=None) -> jax.Array:
    """Evaluate the fitted vector model at one scaled site ``x`` -> (m,)."""
    d = fit.sites - x[None, :]
    r2 = jnp.sum(d * d, axis=-1)
    phi = apply_kernel(kernel, r2, _eval_param(fit, kernel, param))
    phi = jnp.where(fit.mask, phi, 0.0)
    out = phi @ fit.w
    if fit.lam.shape[0] > 0:
        out = out + poly_basis(x, poly_deg) @ fit.lam
    return out


def rbf_jacobian(fit: RbfFit, x: jax.Array, kernel: str, poly_deg: int, param=None) -> jax.Array:
    """(m, n) Jacobian of the model at ``x`` via forward-mode autodiff."""
    return jax.jacfwd(lambda xx: eval_rbf(fit, xx, kernel, poly_deg, param))(x)


def get_matrices(sites: jax.Array, mask: jax.Array, kernel: str, param, poly_deg: int):
    """Return (Phi, Pi) for the masked training set — the analogue of
    ``RBF.get_matrices`` used by round 4 (``RbfModel.jl:374``)."""
    dtype = sites.dtype
    if param is None:
        param = kernel_default_param(kernel)
    Phi = apply_kernel(kernel, _pairwise_sqdist(sites), param)
    mm = mask[:, None] & mask[None, :]
    Phi = jnp.where(mm, Phi, jnp.eye(sites.shape[0], dtype=dtype))
    Pi = jax.vmap(lambda s: poly_basis(s, poly_deg))(sites)
    Pi = jnp.where(mask[:, None], Pi, 0.0)
    return Phi, Pi
