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
