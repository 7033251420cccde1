"""Pallas TPU kernels for the hot dense ops.

The single hottest dense op in the solver is RBF Gram assembly: pairwise
squared distances + kernel application + mask/identity padding, recomputed
for every model fit and every round-4 candidate wave. The fused Pallas
kernel computes the whole (N, N) Gram block in one VMEM pass: the cross
term rides the MXU (``-2 S S'``), the kernel transform and masking ride the
VPU, and nothing round-trips through HBM in between.

``vmap`` of ``pallas_call`` adds a grid dimension, so the per-instance
kernel batches cleanly over multistart fleets.

Falls back to plain XLA on non-TPU backends (tests run the kernel in
interpreter mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from morbit_tpu.ops.rbf import apply_kernel


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


def _gram_kernel(kernel: str, sites_ref, mask_ref, param_ref, out_ref):
    S = sites_ref[:]                       # (N, n)
    m = mask_ref[:]                        # (N, 1) float 0/1
    sq = jnp.sum(S * S, axis=1, keepdims=True)          # (N, 1)
    cross = jnp.dot(S, S.T, preferred_element_type=S.dtype,
                    precision=jax.lax.Precision.HIGHEST)  # MXU, fp32 passes
    r2 = jnp.maximum(sq + sq.T - 2.0 * cross, 0.0)
    phi = apply_kernel(kernel, r2, param_ref[0, 0])
    mm = m @ m.T                           # (N, N) pair mask
    N = S.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    eye = (row == col).astype(S.dtype)
    out_ref[:] = jnp.where(mm > 0, phi, eye)


def rbf_gram_matrix(sites: jax.Array, mask: jax.Array, kernel: str, param,
                    interpret: bool = False) -> jax.Array:
    """Masked identity-padded RBF Gram matrix via the fused Pallas kernel.

    ``sites``: (N, n); ``mask``: (N,) bool. The shape parameter must be a
    scalar (static exponents of cubic/tps are baked into the closure).
    """
    N, n = sites.shape
    dtype = sites.dtype
    if kernel in ("cubic", "thin_plate_spline"):
        # static exponent: bake into the kernel closure, pass dummy scalar
        static_param = float(param)
        body = functools.partial(_gram_kernel_static, kernel, static_param)
        param_arr = jnp.zeros((1, 1), dtype)
    else:
        body = functools.partial(_gram_kernel, kernel)
        param_arr = jnp.asarray(param, dtype).reshape(1, 1)

    mask_f = mask.astype(dtype).reshape(N, 1)
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((N, N), dtype),
        interpret=interpret,
    )(sites, mask_f, param_arr)


def admm_iterations(Minv, A, rho, q, l, u, z0, zz0, y0,
                    iters: int, sigma: float, alpha: float,
                    interpret: bool = False):
    """Run ``iters`` OSQP splitting steps entirely in VMEM.

    The XLA while-loop lowering round-trips the (tiny) carry through HBM every
    iteration; this kernel keeps the whole state on-chip — the second hot-op
    Pallas kernel next to the Gram assembly. The KKT matrix is pre-inverted
    outside (one batched solve), so the body is pure matvecs + clips
    (VPU/MXU-friendly). ``vmap`` adds the batch grid dimension.

    Shapes: Minv (n, n), A (m, n), rho/q/l/u/z/zz/y vectors passed as
    (1, k) rows. Returns (z, zz, y).
    """
    n = Minv.shape[0]
    m = A.shape[0]
    dtype = Minv.dtype

    def body(Minv_ref, A_ref, rho_ref, q_ref, l_ref, u_ref,
             z_ref, zz_ref, y_ref, z_out, zz_out, y_out):
        Mi = Minv_ref[:]
        Am = A_ref[:]
        rho_v = rho_ref[:]
        qv = q_ref[:]
        lv = l_ref[:]
        uv = u_ref[:]

        def step(_, carry):
            z, zz, y = carry                     # (1, n), (1, m), (1, m)
            rhs = sigma * z - qv + jnp.dot(
                rho_v * zz - y, Am,
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)          # (1, n)
            xt = jnp.dot(rhs, Mi.T, preferred_element_type=dtype,
                         precision=jax.lax.Precision.HIGHEST)  # (1, n)
            zt = jnp.dot(xt, Am.T, preferred_element_type=dtype,
                         precision=jax.lax.Precision.HIGHEST)  # (1, m)
            z_new = alpha * xt + (1.0 - alpha) * z
            zz_arg = alpha * zt + (1.0 - alpha) * zz + y / rho_v
            zz_new = jnp.clip(zz_arg, lv, uv)
            y_new = y + rho_v * (alpha * zt + (1.0 - alpha) * zz - zz_new)
            return z_new, zz_new, y_new

        z, zz, y = jax.lax.fori_loop(
            0, iters, step, (z_ref[:], zz_ref[:], y_ref[:]))
        z_out[:] = z
        zz_out[:] = zz
        y_out[:] = y

    out = pl.pallas_call(
        body,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dtype),
            jax.ShapeDtypeStruct((1, m), dtype),
            jax.ShapeDtypeStruct((1, m), dtype),
        ),
        interpret=interpret,
    )(Minv, A, rho.reshape(1, m), q.reshape(1, n), l.reshape(1, m),
      u.reshape(1, m), z0.reshape(1, n), zz0.reshape(1, m), y0.reshape(1, m))
    z, zz, y = out
    return z[0], zz[0], y[0]


def _gram_kernel_static(kernel: str, param: float, sites_ref, mask_ref,
                        param_ref, out_ref):
    S = sites_ref[:]
    m = mask_ref[:]
    sq = jnp.sum(S * S, axis=1, keepdims=True)
    cross = jnp.dot(S, S.T, preferred_element_type=S.dtype,
                    precision=jax.lax.Precision.HIGHEST)
    r2 = jnp.maximum(sq + sq.T - 2.0 * cross, 0.0)
    phi = apply_kernel(kernel, r2, param)
    mm = m @ m.T
    N = S.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    eye = (row == col).astype(S.dtype)
    out_ref[:] = jnp.where(mm > 0, phi, eye)
