"""Batched dense QP/LP solver (fixed-iteration ADMM + active-set polish).

TPU-native replacement for the OSQP C library, which the reference calls via
JuMP for the multiobjective steepest-descent LP (``src/descent.jl:91-135``)
and the normal-step LP (``src/descent.jl:691-758``). OSQP itself is ADMM with
an optional polish step; we implement the same operator splitting with a
*fixed* iteration budget and a fixed-shape active-set polish, so the whole
solve is one jittable dense-linear-algebra pipeline that can be ``vmap``-ed
over problem instances (the batched GEMMs/solves then saturate the MXU).

Problem form (OSQP form):

    min   1/2 z' P z + q' z
    s.t.  l <= A z <= u

Equality rows are expressed as ``l_i == u_i``. Padded rows are expressed as
``l_i = -inf, u_i = +inf`` (they never bind and contribute nothing).

All shapes are static; dtype follows the inputs (use float64 for
trajectory-parity runs, float32 on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPSolution(NamedTuple):
    z: jax.Array          # primal solution, shape (n,)
    y: jax.Array          # dual solution, shape (m,)
    obj: jax.Array        # objective value at z
    prim_res: jax.Array   # ||clip violation||_inf
    dual_res: jax.Array   # ||P z + q + A' y||_inf
    status_ok: jax.Array  # bool: residuals below tolerance


def _make_stage(P, q, A, l, u, *, n, m, dtype, sigma, alpha, rho_clip,
                n_steps, unroll_chol):
    """One ADMM rho-stage (factorize + ``n_steps`` splitting iterations +
    residual-driven rho rescale) as a closure over the problem data.

    Extracted verbatim from the pre-round-3 inline ``stage`` so the XLA
    lowering (and the float64 golden trajectories) stay bit-identical; the
    fused lane-batched kernel (``ops/qp_lane.py``) mirrors these exact
    formulas. An in-VMEM per-instance Pallas splitting loop
    (``ops.pallas_kernels.admm_iterations``) remains DISABLED: under vmap
    the pallas grid executes sequentially per core (measured 727 -> 263
    runs/s); the lane-batched kernel replaces the whole stage sequence
    instead.

    Unrolled tiny-k factorizations at <= 32-bit (XLA's batched
    cholesky/triangular-solve lowerings cost ~1 ms at (1024, 9, 9) on v5e;
    the unrolled ops fuse to ~us — tools/profile_linalg.py); float64 keeps
    jnp.linalg for bit-stability with the round-1 golden trajectories, and
    large n falls back too (unrolled-graph compile blowup)."""
    import jax

    from morbit_tpu.ops.batched_linalg import chol_factor, chol_solve

    def _chol(M_):
        return chol_factor(M_) if unroll_chol else jnp.linalg.cholesky(M_)

    def _chol_solve(L_, rhs_):
        if unroll_chol:
            return chol_solve(L_, rhs_)
        return jax.scipy.linalg.cho_solve((L_, True), rhs_)

    def stage(carry, rho_scale_unused=None):
        z, zz, y, rho_v = carry
        M = P + sigma * jnp.eye(n, dtype=dtype) + (A.T * rho_v) @ A
        # Cholesky once per stage; jittered refactorization on breakdown
        L = _chol(M)
        bad = ~jnp.all(jnp.isfinite(L))
        jitter = 1e-3 * (jnp.trace(M) / n + 1.0)
        L2 = _chol(M + jitter * jnp.eye(n, dtype=dtype))
        L = jnp.where(bad, L2, L)
        # pin the factorization outside the splitting loop: without the
        # barrier XLA can sink the (loop-invariant) Cholesky into the loop
        # body when A was constructed in-graph — measured ~600x slowdown
        L = jax.lax.optimization_barrier(L)

        def step(_, s):
            z, zz, y = s
            rhs = sigma * z - q + A.T @ (rho_v * zz - y)
            xt = _chol_solve(L, rhs)
            zt = A @ xt
            z_new = alpha * xt + (1 - alpha) * z
            zz_arg = alpha * zt + (1 - alpha) * zz + y / rho_v
            zz_new = jnp.clip(zz_arg, l, u)
            y_new = y + rho_v * (alpha * zt + (1 - alpha) * zz - zz_new)
            return z_new, zz_new, y_new

        # unroll to amortize while-trip overhead (the body is a handful
        # of tiny fused ops; 8 bodies per trip measured best on v5e)
        z, zz, y = jax.lax.fori_loop(0, n_steps, step, (z, zz, y),
                                     unroll=8)

        # residuals for rho adaptation / early exit
        Az = A @ z
        pr = jnp.max(jnp.abs(Az - zz)) if m else jnp.asarray(0.0, dtype)
        dr = jnp.max(jnp.abs(P @ z + q + A.T @ y))
        scale = jnp.sqrt(jnp.maximum(pr, 1e-30) / jnp.maximum(dr, 1e-30))
        scale = jnp.clip(scale, 0.1, 10.0)
        rho_new = jnp.clip(rho_v * scale, rho_clip[0], rho_clip[1])
        return (z, zz, y, rho_new), jnp.maximum(pr, dr)

    return stage


def _rho_vec(l, u, rho, dtype):
    """Per-row penalty: OSQP uses ``rho*1e3`` on equality rows. The spread
    is narrowed in float32 to keep the KKT factorization well-conditioned."""
    f32 = jnp.finfo(dtype).bits <= 32
    eq_fac, loose_fac = (1e2, 1e-2) if f32 else (1e3, 1e-6)
    is_eq = (u - l) <= 1e-12
    loose = jnp.isinf(l) & jnp.isinf(u)
    r = jnp.where(is_eq, rho * eq_fac, rho)
    return jnp.where(loose, rho * loose_fac, r)


def solve_qp(
    P: jax.Array,
    q: jax.Array,
    A: jax.Array,
    l: jax.Array,
    u: jax.Array,
    iters: int = 400,
    rho: float = 0.1,
    sigma: float | None = None,
    alpha: float = 1.6,
    polish: bool = True,
    adapt_every: int = 100,
    eps: float | None = None,
    exit_eps: float | None = None,
) -> QPSolution:
    """Solve one dense QP. ``vmap`` over a leading axis for batches.

    The ADMM recursion follows OSQP (Stellato et al., 2020): a single dense
    KKT factorization ``M = P + sigma I + A' diag(rho) A`` per rho-stage, then
    ``iters`` fixed splitting steps; rho is rescaled from the residual ratio
    every ``adapt_every`` iterations (a handful of refactorizations — cheap at
    these sizes and fully batchable).

    ``exit_eps``: residual-based early exit at stage granularity — later
    rho-stages are skipped once both residuals fall below the tolerance,
    mirroring OSQP's ``check_termination`` (the reference never runs a fixed
    trip count; ``eps_abs/eps_rel`` default 1e-3, Stellato et al. §5.1).
    OFF by default (0): measured on v5e at the 1024-way reference-default
    bench, the batched exit does NOT pay — under vmap the stage while_loop
    runs until the slowest lane's QP converges (straggler lanes hold all 4
    stages nearly always), the loop boundary adds overhead, and looser
    tolerances (1e-3) cost MORE outer solver iterations than they save
    (777 -> 862 ms/batch). It IS a win for unbatched/sequential solves —
    opt in via ``AlgorithmConfig.qp_exit_eps`` or this parameter. float64
    golden trajectories require the fixed-trip default.
    """
    n = q.shape[0]
    dtype = q.dtype
    m = A.shape[0]
    # vmap batching anchor: when P/q are closed-over constants (the LP case),
    # a mixed batched/unbatched ADMM loop lowers catastrophically on TPU
    # (~700x slower, measured on v5e). Tying them to A makes every loop
    # operand batched under vmap; a no-op otherwise.
    anchor = jnp.asarray(0.0, dtype) * A[0, 0] if m else jnp.asarray(0.0, dtype)
    P = P + anchor
    q = q + anchor
    # ---- row equilibration (OSQP scales its problem data by default,
    # Stellato et al. 2020 §5.1 — a mathematical no-op on the solution).
    # The fixed-budget ADMM STALLS on mixed-scale constraint rows: the
    # steepest-descent LP pairs rows of inf-norm ~50 (model-Jacobian rows
    # [Dm_i, -||Dm_i||]) with unit box rows, and the raw splitting loop
    # leaves pr ~ 5e-2 even at 4000 iterations while the polish then reads
    # noisy duals and picks an over-determined active set (round-4 full
    # oracle finding; repro: tools/repro_qp_equilibrate.py). Dividing each
    # row by its inf-norm makes the same loop converge to machine
    # precision. Classification for the per-row penalty (_rho_vec) uses
    # the ORIGINAL bounds; the returned dual is scaled back.
    if m:
        r_eq = jnp.max(jnp.abs(A), axis=1)
        r_eq = jnp.where(r_eq > 0, r_eq, 1.0)
    else:
        r_eq = jnp.ones((0,), dtype)
    rho_v0_src = (l, u)
    A = A / r_eq[:, None] if m else A
    l = l / r_eq
    u = u / r_eq
    # pin the problem data: in-graph-constructed constraint blocks otherwise
    # lower to a pathologically slow splitting loop (measured ~600x on v5e)
    P, q, A, l, u, r_eq = jax.lax.optimization_barrier((P, q, A, l, u, r_eq))
    f32 = jnp.finfo(dtype).bits <= 32
    if sigma is None:
        sigma = 1e-4 if f32 else 1e-6
    if eps is None:
        eps = 1e-6 if f32 else 1e-8
    rho_clip = (1e-3, 1e4) if f32 else (1e-6, 1e6)

    from morbit_tpu.ops.batched_linalg import GJ_MAX_K

    unroll_chol = f32 and n <= GJ_MAX_K

    stage = _make_stage(P, q, A, l, u, n=n, m=m, dtype=dtype, sigma=sigma,
                        alpha=alpha, rho_clip=rho_clip,
                        n_steps=min(adapt_every, iters),
                        unroll_chol=unroll_chol)

    z0 = jnp.zeros(n, dtype)
    zz0 = jnp.clip(jnp.zeros(m, dtype), l, u)
    y0 = jnp.zeros(m, dtype)
    # row classification (eq / loose) from the ORIGINAL bounds — the
    # equilibration must not flip a row's penalty class
    rho_v0 = _rho_vec(rho_v0_src[0], rho_v0_src[1], jnp.asarray(rho, dtype),
                      dtype)

    n_stages = max(1, iters // adapt_every)
    if exit_eps is None:
        exit_eps = 0.0  # fixed trips (see docstring: batched exit measured slower)
    carry = (z0, zz0, y0, rho_v0)
    if exit_eps and n_stages > 1:
        # stage-granular early exit: once both residuals are below the
        # tolerance the remaining rho-stages are skipped (under vmap the
        # loop runs until the slowest lane's QP converges — still far
        # cheaper than the fixed budget, which is sized for the worst case)
        def ee_cond(c):
            carry, s, res = c
            return (s < n_stages) & (res > exit_eps)

        def ee_body(c):
            carry, s, _ = c
            carry, res = stage(carry)
            return carry, s + jnp.int32(1), res

        carry, _, _ = jax.lax.while_loop(
            ee_cond, ee_body,
            (carry, jnp.int32(0), jnp.asarray(jnp.inf, dtype)))
        z, zz, y, _ = carry
    else:
        # fixed-trip stage sequence behind a raw primitive: unbatched and
        # float64 paths inline this exact loop (bit-identical); vmapped
        # float32 TPU fleets route to the fused lane-batched Pallas kernel
        # (ops/qp_lane.py) — the splitting loop is the dominant device cost
        # at reference-default budgets (qp_iters=400)
        from morbit_tpu.ops.qp_lane import make_admm_stages

        def _core(P_, q_, A_, l_, u_, rho0_):
            st = _make_stage(P_, q_, A_, l_, u_, n=n, m=m, dtype=dtype,
                             sigma=sigma, alpha=alpha, rho_clip=rho_clip,
                             n_steps=min(adapt_every, iters),
                             unroll_chol=unroll_chol)
            c = (jnp.zeros(n, dtype), jnp.clip(jnp.zeros(m, dtype), l_, u_),
                 jnp.zeros(m, dtype), rho0_)
            for _ in range(n_stages):
                c, _res = st(c)
            return c[0], c[1], c[2]

        run = make_admm_stages(
            n, m, n_stages=n_stages, n_steps=min(adapt_every, iters),
            sigma=float(sigma), alpha=float(alpha), rho_lo=float(rho_clip[0]),
            rho_hi=float(rho_clip[1]), dtype=dtype, core=_core)
        z, zz, y = run(P, q, A, l, u, rho_v0)

    if polish:
        z, y = _polish(P, q, A, l, u, z, y,
                       delta=1e-5 if f32 else 1e-8)

    Az = A @ z
    viol = jnp.maximum(Az - u, 0.0) + jnp.maximum(l - Az, 0.0)
    prim_res = jnp.max(viol) if m else jnp.asarray(0.0, dtype)
    dual_res = jnp.max(jnp.abs(P @ z + q + A.T @ y))
    obj = 0.5 * z @ (P @ z) + q @ z
    ok = (prim_res <= 1e3 * eps ** 0.5) & jnp.all(jnp.isfinite(z))
    # dual back in the caller's (unequilibrated) row scale: the scaled
    # problem's stationarity A_s' y_s = A' (y_s / r)
    y = y / r_eq if m else y
    return QPSolution(z, y, obj, prim_res, dual_res, ok)


def _polish(P, q, A, l, u, z, y, delta: float = 1e-8, refine_steps: int = 3):
    """Fixed-shape active-set polish (OSQP 'polish' analogue).

    Active rows are detected from the ADMM dual signs; the equality-
    constrained KKT system is solved with all rows present but inactive rows
    disabled by a diagonal switch, keeping the shape static:

        [ P + dI    A' D ] [x  ]   [ -q      ]
        [ D A      -E    ] [nu ] = [ D b_act ]

    with ``D = diag(active)`` and ``E = d*I + diag(1-active)`` so inactive
    rows reduce to ``nu_i = 0``. A few iterative-refinement steps recover
    accuracy lost to the regularization.
    """
    dtype = q.dtype
    n = q.shape[0]
    m = A.shape[0]

    Az = A @ z
    gap = jnp.maximum(u - l, 0.0)
    tol = 1e-6 * (1.0 + jnp.abs(Az))
    low_active = (y < -1e-10) | (Az <= l + tol)
    upp_active = (y > 1e-10) | (Az >= u - tol)
    is_eq = gap <= 1e-12
    active = (low_active & jnp.isfinite(l)) | (upp_active & jnp.isfinite(u)) | is_eq
    b_act = jnp.where(is_eq, l, jnp.where(upp_active & jnp.isfinite(u), u, l))
    b_act = jnp.where(jnp.isfinite(b_act), b_act, 0.0)
    act = active.astype(dtype)

    DA = A * act[:, None]
    K = jnp.block([
        [P + delta * jnp.eye(n, dtype=dtype), DA.T],
        [DA, -(delta * act + (1.0 - act)) * jnp.eye(m, dtype=dtype)],
    ])
    rhs = jnp.concatenate([-q, act * b_act])

    from morbit_tpu.ops.batched_linalg import GJ_MAX_K

    f32 = jnp.finfo(dtype).bits <= 32
    if f32 and K.shape[-1] <= 2 * GJ_MAX_K:
        # unrolled inverse once; refinement applications become matvecs
        # (XLA's batched lu_factor costs ~2.3 ms at (1024, 9, 9) on v5e);
        # size-capped — many-constraint KKTs fall back to LU
        from morbit_tpu.ops.batched_linalg import gj_inverse

        Kinv = gj_inverse(K)
        solve_K = lambda v: Kinv @ v
    else:
        lu, piv = jax.scipy.linalg.lu_factor(K)
        solve_K = lambda v: jax.scipy.linalg.lu_solve((lu, piv), v)
    sol = solve_K(rhs)

    # iterative refinement against the *unregularized* KKT operator
    def kkt_mv(v):
        x, nu = v[:n], v[n:]
        return jnp.concatenate([P @ x + DA.T @ nu, DA @ x - (1.0 - act) * nu])

    for _ in range(refine_steps):
        r = rhs - kkt_mv(sol)
        sol = sol + solve_K(r)

    z_pol = sol[:n]
    y_pol = act * sol[n:]

    # accept polish only if it did not hurt feasibility/stationarity
    def merit(zc, yc):
        Azc = A @ zc
        pr = jnp.max(jnp.maximum(Azc - u, 0.0) + jnp.maximum(l - Azc, 0.0)) if m else 0.0
        dr = jnp.max(jnp.abs(P @ zc + q + A.T @ yc))
        return pr + dr

    better = (merit(z_pol, y_pol) <= merit(z, y)) & jnp.all(jnp.isfinite(z_pol))
    z_out = jnp.where(better, z_pol, z)
    y_out = jnp.where(better, y_pol, y)
    return z_out, y_out
