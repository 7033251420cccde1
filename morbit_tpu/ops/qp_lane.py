"""Lane-batched fused ADMM stage loop for the tiny descent QPs.

The steepest-descent min-max LP (``core/descent.py:steepest_descent_direction``,
reference ``src/descent.jl:91-135``) and the normal-step LP dominate the
per-iteration device time at reference-default budgets (``qp_iters=400``):
under plain ``vmap`` the splitting loop is 400 trips of ~10 tiny fused ops
each, whose per-trip launch/loop overhead at B=1024 dwarfs the actual VPU
work (the body touches ~60 scalars per lane).  Here the ENTIRE fixed-trip
ADMM (all rho-stages, per-stage Cholesky refactorization, and the
``adapt_every``-step splitting loops) runs as ONE Pallas kernel per 1024-lane
tile with every intermediate in VMEM.

Layout: the batch occupies the last TWO axes as ``(8, 128)`` float32 VPU
tiles — per-lane scalars become full ``(sublane, lane)`` tiles, so each of
the ~60 multiply-adds per splitting step is one full-rate VPU op (the
round-4 kernel's ``(T,)`` lane vectors fill only 1 of 8 sublanes).  All
contractions over the tiny ``nv``/``m`` axes are static Python loops;
per-row state lives in plain Python lists of ``(8, 128)`` arrays (never
``jnp.stack`` — Mosaic offset mismatch, see CLAUDE.md).

Numerical semantics match :func:`morbit_tpu.ops.qp.solve_qp`'s fixed-trip
stage loop op-for-op (same formulas, same order — the unbatched impl IS the
extracted XLA loop); infinities in ``l``/``u`` are replaced by ±1e30 on the
routing side (Mosaic-safe, identical clip behavior for finite data).
Routing follows ``ops/prepare_fused.py``: a raw primitive with an explicit
batching rule — unbatched calls (sequential solves, float64 goldens) keep
the existing XLA lowering bit-identically; vmapped float32 TPU solves at
B >= ``_MIN_B`` take the kernel.
"""

from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp

#: master switch for the fused QP stage loop (A/B profiling hook)
QP_LANE = bool(int(_os.environ.get("MORBIT_QP_LANE", "1")))
#: largest (nv, m) routed to the kernel — the body op count scales with
#: nv*m and Mosaic compile time with it; the proven regime is the tiny
#: descent/normal-step LPs (bench: nv=3, m=6)
_MAX_NV = int(_os.environ.get("MORBIT_QP_LANE_MAX_NV", "8"))
_MAX_M = int(_os.environ.get("MORBIT_QP_LANE_MAX_M", "24"))
#: smallest batch routed to the kernel (smaller fleets pad to the 1024-lane
#: tile; below this the padding waste beats the launch-overhead savings)
_MIN_B = int(_os.environ.get("MORBIT_QP_LANE_MIN_B", "256"))
#: lanes per grid step: 8 sublanes x 128 lanes = one full f32 VPU tile set
_SUB, _LANE = 8, 128
_TILE_B = _SUB * _LANE

#: test hook: run the Pallas path in interpreter mode on CPU
FORCE_INTERPRET = False

_BIG = 1e30


def _pallas_ok(dtype) -> bool:
    if not QP_LANE:
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if FORCE_INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# --------------------------------------------------------------- kernel body

def _chol_lane(M, nv):
    """Unrolled Cholesky of the nested-list matrix ``M[i][j]`` of (8, 128)
    tiles — same formulas/order as ``ops.batched_linalg.chol_factor``."""
    L = [[None] * nv for _ in range(nv)]
    for j in range(nv):
        s = M[j][j]
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        L[j][j] = jnp.sqrt(s)
        for i in range(j + 1, nv):
            s2 = M[i][j]
            for t in range(j):
                s2 = s2 - L[i][t] * L[j][t]
            L[i][j] = s2 / L[j][j]
    return L


def admm_lane_batched(P, q, A, l, u, rho0, *, nv, m, n_stages, n_steps,
                      sigma, alpha, rho_lo, rho_hi, dtype):
    """Fused fixed-trip ADMM, batch as trailing (8, 128) tiles.

    ``P``: (nv, nv, 8, 128); ``q``: (nv, 8, 128); ``A``: (m, nv, 8, 128);
    ``l``/``u``/``rho0``: (m, 8, 128).  Returns ``(z_rows, zz_rows, y_rows)``
    as lists of (8, 128) tiles.  Mirrors ``ops.qp.solve_qp``'s stage loop
    (OSQP splitting, Stellato et al. 2020) op-for-op.
    """
    z = [jnp.zeros((_SUB, _LANE), dtype) for _ in range(nv)]
    zz = [jnp.clip(jnp.zeros((_SUB, _LANE), dtype), l[r], u[r])
          for r in range(m)]
    y = [jnp.zeros((_SUB, _LANE), dtype) for _ in range(m)]
    rho = [rho0[r] for r in range(m)]

    for _stage in range(n_stages):
        # ---- M = P + sigma I + A' diag(rho) A  (nested (8,128) tiles)
        M = [[None] * nv for _ in range(nv)]
        for i in range(nv):
            for j in range(i + 1):
                acc = P[i][j] + (sigma if i == j else 0.0)
                for r in range(m):
                    acc = acc + A[r][i] * rho[r] * A[r][j]
                M[i][j] = acc
                M[j][i] = acc
        L = _chol_lane(M, nv)
        # jittered refactorization on per-lane breakdown (non-SPD lanes)
        ok = jnp.ones((_SUB, _LANE), jnp.bool_)
        for j in range(nv):
            for i in range(j, nv):
                ok = ok & jnp.isfinite(L[i][j])
        tr = M[0][0]
        for i in range(1, nv):
            tr = tr + M[i][i]
        jit = 1e-3 * (tr / nv + 1.0)
        M2 = [[M[i][j] + (jit if i == j else 0.0) for j in range(nv)]
              for i in range(nv)]
        L2 = _chol_lane(M2, nv)
        L = [[jnp.where(ok, L[i][j], L2[i][j]) if j <= i else None
              for j in range(nv)] for i in range(nv)]

        # Precompute Minv = L^-T L^-1 and 1/rho once per stage: the
        # splitting iterations then contain no divisions at all (the
        # forward/back substitutions' serial divide chains dominate the
        # in-kernel critical path at tiny nv).
        Linv = [[None] * nv for _ in range(nv)]
        for j in range(nv):
            dinv = 1.0 / L[j][j]
            Linv[j][j] = dinv
            for i in range(j + 1, nv):
                s_ = L[i][j] * Linv[j][j]
                for t in range(j + 1, i):
                    s_ = s_ + L[i][t] * Linv[t][j]
                Linv[i][j] = -s_ / L[i][i]
        Minv = [[None] * nv for _ in range(nv)]
        for i in range(nv):
            for j in range(i + 1):
                acc = None
                for t in range(max(i, j), nv):
                    term = Linv[t][i] * Linv[t][j]
                    acc = term if acc is None else acc + term
                Minv[i][j] = acc
                Minv[j][i] = acc
        rinv = [1.0 / rho[r] for r in range(m)]

        # ---- n_steps splitting iterations entirely in VMEM
        def step(_, s):
            z = list(s[:nv])
            zz = list(s[nv:nv + m])
            y = list(s[nv + m:])
            t1 = [rho[r] * zz[r] - y[r] for r in range(m)]
            rhs = []
            for i in range(nv):
                acc = sigma * z[i] - q[i]
                for r in range(m):
                    acc = acc + A[r][i] * t1[r]
                rhs.append(acc)
            # xt = Minv @ rhs (division-free; Minv precomputed per stage)
            xt = [None] * nv
            for i in range(nv):
                acc = Minv[i][0] * rhs[0]
                for j in range(1, nv):
                    acc = acc + Minv[i][j] * rhs[j]
                xt[i] = acc
            z_new = [alpha * xt[i] + (1 - alpha) * z[i] for i in range(nv)]
            zz_new, y_new = [], []
            for r in range(m):
                zt = A[r][0] * xt[0]
                for i in range(1, nv):
                    zt = zt + A[r][i] * xt[i]
                zz_arg = alpha * zt + (1 - alpha) * zz[r] + y[r] * rinv[r]
                zzr = jnp.clip(zz_arg, l[r], u[r])
                zz_new.append(zzr)
                y_new.append(y[r] + rho[r] * (alpha * zt
                                              + (1 - alpha) * zz[r] - zzr))
            return tuple(z_new) + tuple(zz_new) + tuple(y_new)

        s = jax.lax.fori_loop(0, n_steps, step,
                              tuple(z) + tuple(zz) + tuple(y))
        z = list(s[:nv])
        zz = list(s[nv:nv + m])
        y = list(s[nv + m:])

        # ---- residuals -> rho rescale (next stage's factorization)
        if _stage + 1 < n_stages:
            pr = jnp.zeros((_SUB, _LANE), dtype)
            for r in range(m):
                Az = A[r][0] * z[0]
                for i in range(1, nv):
                    Az = Az + A[r][i] * z[i]
                pr = jnp.maximum(pr, jnp.abs(Az - zz[r]))
            dr = jnp.zeros((_SUB, _LANE), dtype)
            for i in range(nv):
                g = q[i]
                for j in range(nv):
                    g = g + P[i][j] * z[j]
                for r in range(m):
                    g = g + A[r][i] * y[r]
                dr = jnp.maximum(dr, jnp.abs(g))
            scale = jnp.sqrt(jnp.maximum(pr, 1e-30)
                             / jnp.maximum(dr, 1e-30))
            scale = jnp.clip(scale, 0.1, 10.0)
            rho = [jnp.clip(rho[r] * scale, rho_lo, rho_hi)
                   for r in range(m)]
    return z, zz, y


# ------------------------------------------------------------ pallas wrapper

def _pallas_admm(statics, B, P, q, A, l, u, rho0):
    """Run the fused kernel over 1024-lane tiles.

    Batched (leading-axis B) operands; returns ``(z (B, nv), zz (B, m),
    y (B, m))``.  B is padded to a multiple of 1024 with copies of lane 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nv, m = statics["nv"], statics["m"]
    dtype = jnp.dtype(statics["dtype"])

    padded = ((B + _TILE_B - 1) // _TILE_B) * _TILE_B
    pad = padded - B

    def p(a):
        if pad == 0:
            return a
        reps = jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    # Mosaic-safe bounds: +-inf -> +-1e30 (identical clip behavior)
    l_s = jnp.clip(p(l), -_BIG, _BIG)
    u_s = jnp.clip(p(u), -_BIG, _BIG)

    def lane_last(a):
        # (padded, ...) -> (..., padded//128, 128): batch as trailing tiles
        out = jnp.moveaxis(a, 0, -1)
        return out.reshape(out.shape[:-1] + (padded // _LANE, _LANE))

    ins = (lane_last(p(P)), lane_last(p(q)), lane_last(p(A)),
           lane_last(l_s), lane_last(u_s), lane_last(p(rho0)))

    grid = (padded // _TILE_B,)

    def spec(*lead):
        nlead = len(lead)
        return pl.BlockSpec(
            lead + (_SUB, _LANE),
            lambda i, _n=nlead: (0,) * _n + (i, 0),
            memory_space=pltpu.VMEM)

    in_specs = [spec(nv, nv), spec(nv), spec(m, nv), spec(m), spec(m),
                spec(m)]
    out_shapes = (
        jax.ShapeDtypeStruct((nv, padded // _LANE, _LANE), dtype),
        jax.ShapeDtypeStruct((m, padded // _LANE, _LANE), dtype),
        jax.ShapeDtypeStruct((m, padded // _LANE, _LANE), dtype),
    )
    out_specs = (spec(nv), spec(m), spec(m))

    kstat = {k: statics[k] for k in
             ("nv", "m", "n_stages", "n_steps", "sigma", "alpha",
              "rho_lo", "rho_hi")}

    def kernel(P_ref, q_ref, A_ref, l_ref, u_ref, r_ref, o_z, o_zz, o_y):
        Pk = [[P_ref[i, j] for j in range(nv)] for i in range(nv)]
        qk = [q_ref[i] for i in range(nv)]
        Ak = [[A_ref[r, i] for i in range(nv)] for r in range(m)]
        lk = [l_ref[r] for r in range(m)]
        uk = [u_ref[r] for r in range(m)]
        rk = [r_ref[r] for r in range(m)]
        z, zz, y = admm_lane_batched(Pk, qk, Ak, lk, uk, rk,
                                     dtype=dtype, **kstat)
        for i in range(nv):
            o_z[i] = z[i]
        for r in range(m):
            o_zz[r] = zz[r]
            o_y[r] = y[r]

    z, zz, y = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=bool(FORCE_INTERPRET),
    )(*ins)

    def lane_first(a):
        out = a.reshape(a.shape[:-2] + (padded,))
        return jnp.moveaxis(out, -1, 0)[:B]

    return lane_first(z), lane_first(zz), lane_first(y)


# --------------------------------------------------------- primitive routing

_PRIM_CACHE: dict = {}


def make_admm_stages(nv, m, *, n_stages, n_steps, sigma, alpha, rho_lo,
                     rho_hi, dtype, core):
    """Cached raw primitive for the fixed-trip ADMM stage loop.

    ``core(P, q, A, l, u, rho0) -> (z, zz, y)`` is the single-instance XLA
    stage loop extracted from :func:`morbit_tpu.ops.qp.solve_qp` — the
    primitive's impl/lowering inline it unchanged, so unbatched solves and
    float64 golden paths are bit-identical to the pre-primitive code.
    Vmapped float32 TPU calls at B >= ``_MIN_B`` with small (nv, m) route
    to the fused Pallas kernel; everything else falls back to
    ``jax.vmap(core)`` (today's lowering).
    """
    key = (nv, m, n_stages, n_steps, float(sigma), float(alpha),
           float(rho_lo), float(rho_hi), jnp.dtype(dtype).name)
    if key in _PRIM_CACHE:
        return _PRIM_CACHE[key]

    from jax.interpreters import batching, mlir

    import jax.extend.core as jex_core
    from jax.core import ShapedArray

    statics = dict(nv=nv, m=m, n_stages=n_stages, n_steps=n_steps,
                   sigma=float(sigma), alpha=float(alpha),
                   rho_lo=float(rho_lo), rho_hi=float(rho_hi),
                   dtype=jnp.dtype(dtype).name)

    prim = jex_core.Primitive(
        f"qp_admm_nv{nv}_m{m}_s{n_stages}x{n_steps}_{jnp.dtype(dtype).name}")
    prim.multiple_results = True

    from morbit_tpu.ops.precision import (current_matmul_precision,
                                          matmul_precision_ctx)

    # ``precision`` is captured at bind time (trace time, solver context
    # active) and replayed around every deferred re-trace — the lower_fun
    # lowering runs AFTER the trace-time context exits, which on TPU silently
    # dropped these f32 matmuls to bf16 (omega=-inf; see ops/precision.py).
    def _core_list(*args, precision=None):
        with matmul_precision_ctx(precision):
            return list(core(*args))

    prim.def_impl(_core_list)

    @prim.def_abstract_eval
    def _abs(P, q, A, l, u, rho0, *, precision=None):
        dt = q.dtype
        return [ShapedArray((nv,), dt), ShapedArray((m,), dt),
                ShapedArray((m,), dt)]

    mlir.register_lowering(prim,
                           mlir.lower_fun(_core_list, multiple_results=True))

    def _batch(args, dims, *, precision=None):
        size = next(a.shape[d] for a, d in zip(args, dims)
                    if d is not batching.not_mapped)

        def at0(a, d):
            if d is batching.not_mapped:
                return jnp.broadcast_to(a, (size,) + a.shape)
            return jnp.moveaxis(a, d, 0)

        args0 = tuple(at0(a, d) for a, d in zip(args, dims))
        single_level = args0[0].ndim == 3  # (B, nv, nv) — not nested vmap
        with matmul_precision_ctx(precision):
            if (single_level and _pallas_ok(dtype) and m > 0
                    and nv <= _MAX_NV and m <= _MAX_M and size >= _MIN_B):
                outs = _pallas_admm(statics, size, *args0)
            else:
                outs = jax.vmap(core)(*args0)
        return list(outs), [0, 0, 0]

    batching.primitive_batchers[prim] = _batch

    def run(P, q, A, l, u, rho0):
        return tuple(prim.bind(P, q, A, l, u, rho0,
                               precision=current_matmul_precision()))

    _PRIM_CACHE[key] = run
    return run
