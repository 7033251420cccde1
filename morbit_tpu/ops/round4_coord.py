"""Coordinate-sliced (batch-on-lanes) RBF round-4 kernel body.

Hand-vectorized re-expression of :func:`morbit_tpu.models.rbf_round4.run_round4`
for the fused Pallas TPU kernel, following the same layout discipline as
``ops/prepare_coord.py``: every per-lane scalar is a ``(T,)`` vector
(T lanes = the batch tile), every per-candidate scalar is a ``(T, C)``
slab, and the tiny per-lane ``(maxN, maxN)`` factor matrices are Python
lists of ``(T,)`` vectors. The data-dependent acceptance while_loop becomes
a STATIC ``max_points``-trip wave loop with done-masking: every wave either
accepts exactly one candidate (the first passer in database order — scan
semantics identical to the reference's sequential candidate loop,
``src/models/RbfModel.jl:352-499``) or marks the lane done, so
``max_points`` trips dominate the while_loop's trip count. Dynamic-slot
writes (row ``N`` of a factor) are masked sweeps over static indices.

SEMANTICS: mirrors ``run_round4`` step for step (same reference citations
apply). Equivalence against the shared implementation is pinned by
tests/test_round4_fused.py on random cases; float reductions may differ in
the last bits, integer acceptance decisions agree away from pivot ties.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# sentinel index "no candidate" (plain int: a jnp constant at module scope
# would be CAPTURED by the Pallas kernel, which Mosaic rejects)
_BIG = 2 ** 30


def _phi_r2_slab(kernel, r2, param_col, static_param):
    """``apply_kernel`` on a slab; smooth kernels take the per-lane traced
    shape parameter, cubic/thin-plate the static exponent (ops/rbf.py:40)."""
    if kernel == "cubic":
        k = float(static_param)
        sign = (-1.0) ** -(-k // 2)
        return sign * r2 ** (k / 2.0)
    if kernel == "gaussian":
        return jnp.exp(-(param_col ** 2) * r2)
    if kernel == "multiquadric":
        return -jnp.sqrt(1.0 + param_col ** 2 * r2)
    if kernel == "inv_multiquadric":
        return 1.0 / jnp.sqrt(1.0 + param_col ** 2 * r2)
    if kernel == "thin_plate_spline":
        k = int(static_param)
        safe_r2 = jnp.where(r2 > 0, r2, 1.0)
        val = 0.5 * ((-1.0) ** (k + 1)) * r2 ** k * jnp.log(safe_r2)
        return jnp.where(r2 > 0, val, 0.0)
    raise ValueError(f"unknown RBF kernel {kernel!r}")


def _masked_qr_coord(Pi, maxN, pd, dtype):
    """Masked Householder QR of the zero-row-padded (maxN, pd) block on
    (T,) coordinate lists (``_masked_householder_qr``, rbf_round4.py:58)."""
    zero = jnp.zeros_like(Pi[0][0])
    A = [[Pi[i][k] for k in range(pd)] for i in range(maxN)]
    Q = [[jnp.full_like(zero, 1.0 if i == j else 0.0) for j in range(maxN)]
         for i in range(maxN)]
    for j in range(pd):
        x = [A[i][j] if i >= j else zero for i in range(maxN)]
        norm2 = zero
        for i in range(j, maxN):
            norm2 = norm2 + x[i] * x[i]
        normx = jnp.sqrt(norm2)
        sgn = jnp.where(A[j][j] >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sgn * normx
        v = [x[i] - (alpha if i == j else zero) if i == j else x[i]
             for i in range(maxN)]
        vnorm2 = zero
        for i in range(maxN):
            vnorm2 = vnorm2 + v[i] * v[i]
        active = (normx > 0) & (vnorm2 > 0)
        beta = jnp.where(active, 2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0), 0.0)
        for k in range(pd):
            vA = zero
            for i in range(maxN):
                vA = vA + v[i] * A[i][k]
            for i in range(maxN):
                A[i][k] = A[i][k] - beta * v[i] * vA
        Qv = [zero] * maxN
        for i in range(maxN):
            acc = zero
            for m in range(maxN):
                acc = acc + Q[i][m] * v[m]
            Qv[i] = acc
        for i in range(maxN):
            for m in range(maxN):
                Q[i][m] = Q[i][m] - beta * Qv[i] * v[m]
    return Q, A


def _poly_row(xc, pd):
    """poly_basis on coordinate lists: [1] or [1, x...] (ops/rbf.py:79)."""
    one = jnp.ones_like(xc[0])
    if pd == 0:
        return []
    if pd == 1:
        return [one]
    return [one] + list(xc)


def round4_coord_batched(X_t, cand, sites0, count, param, *, n, C, maxN, pd,
                         kernel, static_param, chol_pivot2, max_points,
                         dtype):
    """Batched round-4 acceptance on a (T, n, C) candidate block.

    ``X_t``: (T, n, C) transposed candidate sites; ``cand``: (T, C) bool;
    ``sites0``: (T, maxN, n) rounds-1-3 training sites (zero-padded);
    ``count``: (T,) int32 initial rows; ``param``: (T,) shape parameter.
    Returns ``(accepted (T, C) bool, N_final (T,) int32)``.
    """
    T = count.shape[0]
    zero = jnp.zeros((T,), dtype)
    eps10 = 10 * jnp.finfo(dtype).eps
    Xc = [X_t[:, c, :] for c in range(n)]                      # n x (T, C)
    sites = [[sites0[:, i, c] for c in range(n)] for i in range(maxN)]
    N0 = count.astype(jnp.int32)
    param_col = param[:, None]

    # ---- Phi0: masked kernel Gram of the initial sites (identity beyond N)
    rowmask = [(jnp.full((T,), i, jnp.int32) < N0) for i in range(maxN)]
    Phi = [[None] * maxN for _ in range(maxN)]
    for i in range(maxN):
        for j in range(maxN):
            r2 = zero
            for c in range(n):
                d = sites[i][c] - sites[j][c]
                r2 = r2 + d * d
            val = _phi_r2_slab(kernel, r2[:, None], param_col,
                               static_param)[:, 0]
            eye = 1.0 if i == j else 0.0
            Phi[i][j] = jnp.where(rowmask[i] & rowmask[j], val, eye)
    phi0 = _phi_r2_slab(kernel, jnp.zeros((T, 1), dtype), param_col,
                        static_param)[:, 0]

    # ---- initial masked QR of the polynomial block
    if pd > 0:
        Pi0 = [[jnp.where(rowmask[i], p, 0.0)
                for p in _poly_row([sites[i][c] for c in range(n)], pd)]
               for i in range(maxN)]
        Q, R = _masked_qr_coord(Pi0, maxN, pd, dtype)
    else:
        Q = [[jnp.full((T,), 1.0 if i == j else 0.0, dtype)
              for j in range(maxN)] for i in range(maxN)]
        R = [[] for _ in range(maxN)]

    Z = [[zero for _ in range(maxN)] for _ in range(maxN)]
    L = [[jnp.full((T,), 1.0 if i == j else 0.0, dtype)
          for j in range(maxN)] for i in range(maxN)]
    Linv = [[jnp.full((T,), 1.0 if i == j else 0.0, dtype)
             for j in range(maxN)] for i in range(maxN)]
    zc = jnp.zeros((T,), jnp.int32)
    N = N0
    accepted = jnp.zeros((T, C), jnp.int32)
    cursor = jnp.zeros((T,), jnp.int32)
    done = jnp.zeros((T,), jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)

    # candidate poly rows (wave-invariant)
    pi_c = _poly_row(Xc, pd)                                   # pd x (T, C)

    # ---- wave loop as lax.fori_loop over STACKED carries ----------------
    # An unrolled Python loop keeps every wave's (T, C) temporaries live at
    # once in scoped VMEM (measured 30.4M at T=128/C=60), forcing a tiny
    # batch tile; a fori_loop bounds VMEM to ONE wave's working set. The
    # coordinate-sliced body is unchanged — the per-slot lists become
    # static views of the carried stacks at the loop boundary.
    def _stack_rows(vs):                   # K-list of (T,) -> (K, T)
        # iota-masked accumulate instead of jnp.stack: Mosaic cannot
        # concatenate vectors whose sublane offsets differ ("result/input
        # offset mismatch on non-concat dimension")
        K = len(vs)
        r = jax.lax.broadcasted_iota(jnp.int32, (K, T), 0)
        out = None
        for k, v in enumerate(vs):
            contrib = jnp.where(r == k, v[None, :], jnp.zeros((), v.dtype))
            out = contrib if out is None else out + contrib
        return out

    def _stack2(rows):                     # maxN x K lists of (T,) vectors
        planes = [_stack_rows(r) for r in rows]          # each (K, T)
        M = len(planes)
        i = jax.lax.broadcasted_iota(jnp.int32, (M,) + planes[0].shape, 0)
        out = None
        for m, p in enumerate(planes):
            contrib = jnp.where(i == m, p[None], jnp.zeros((), p.dtype))
            out = contrib if out is None else out + contrib
        return out

    def _unstack2(a, n_rows, n_cols):
        return [[a[i, k] for k in range(n_cols)] for i in range(n_rows)]

    carry0 = (_stack2(sites), _stack2(Phi), _stack2(Q), _stack2(Z),
              _stack2(L), _stack2(Linv),
              (_stack2(R) if pd > 0 else jnp.zeros((1, 1, T), dtype)),
              zc, N, accepted, cursor, done)

    def _wave_body(_w, carry):
        (sites_s, Phi_s, Q_s, Z_s, L_s, Linv_s, R_s,
         zc, N, accepted, cursor, done) = carry
        sites = _unstack2(sites_s, maxN, n)
        Phi = _unstack2(Phi_s, maxN, maxN)
        Q = _unstack2(Q_s, maxN, maxN)
        Z = _unstack2(Z_s, maxN, maxN)
        L = _unstack2(L_s, maxN, maxN)
        Linv = _unstack2(Linv_s, maxN, maxN)
        R = _unstack2(R_s, maxN, pd) if pd > 0 else [[] for _ in range(maxN)]
        rowmask = [(jnp.full((T,), i, jnp.int32) < N) for i in range(maxN)]
        done_b = done > 0
        # ---- per-candidate quantities vs the current state --------------
        # phi_xi[i]: kernel value against training row i (0 beyond N)
        phi_xi = []
        for i in range(maxN):
            r2 = jnp.zeros((T, C), dtype)
            for c in range(n):
                d = sites[i][c][:, None] - Xc[c]
                r2 = r2 + d * d
            val = _phi_r2_slab(kernel, r2, param_col, static_param)
            # mask via f32 multiply: Mosaic cannot reshape i1 vectors to
            # (T, 1) (minor-dim insertion is 32-bit only)
            phi_xi.append(val * rowmask[i].astype(dtype)[:, None])

        # Givens pass per candidate (slabs): R_rot, row_rot, gvec, ghat
        if pd > 0:
            # per-candidate copies of the ROTATED rows only (j < pd): rows
            # >= pd are never touched by a Givens plane (active = j < N)
            Rc = [[jnp.broadcast_to(R[j][k][:, None], (T, C)) + 0.0
                   for k in range(pd)] for j in range(pd)]
            rowc = [p + jnp.zeros((T, C), dtype) for p in pi_c]
            gvec = [jnp.zeros((T, C), dtype) for _ in range(maxN)]
            ghat = jnp.ones((T, C), dtype)
            Npd = jnp.minimum(N, pd)
            for j in range(pd):
                active = (j < Npd).astype(jnp.int32)[:, None] > 0
                a = Rc[j][j]
                b = rowc[j]
                r = jnp.sqrt(a * a + b * b)
                has = (r > 0) & active
                rsafe = jnp.where(r > 0, r, 1.0)
                cth = jnp.where(has, a / rsafe, 1.0)
                sth = jnp.where(has, b / rsafe, 0.0)
                for k in range(pd):
                    Rjk = Rc[j][k]
                    Rc[j][k] = cth * Rjk + sth * rowc[k]
                    rowc[k] = -sth * Rjk + cth * rowc[k]
                for m in range(maxN):
                    e = 1.0 if m == j else 0.0
                    gvec[m] = cth * gvec[m] - sth * e
                ghat = cth * ghat
            rn2 = jnp.zeros((T, C), dtype)
            for k in range(pd):
                rn2 = rn2 + rowc[k] * rowc[k]
            # boolean select via algebra, not where-on-bools (Mosaic cannot
            # select i1 vectors in the fused kernel)
            below = (N < pd).astype(jnp.int32)[:, None] > 0
            rank_ok = (below & (jnp.sqrt(rn2) > eps10)) | (~below)
        else:
            Rc = []
            rowc = []
            gvec = [jnp.zeros((T, C), dtype) for _ in range(maxN)]
            ghat = jnp.ones((T, C), dtype)
            rank_ok = jnp.ones((T, C), bool)

        # Qg = Q @ gvec ; t = Phi @ Qg + phi_xi * ghat ; v = Z' t (zc-masked)
        Qg = []
        for i in range(maxN):
            acc = jnp.zeros((T, C), dtype)
            for m in range(maxN):
                acc = acc + Q[i][m][:, None] * gvec[m]
            Qg.append(acc)
        PhiQg = []
        for i in range(maxN):
            acc = jnp.zeros((T, C), dtype)
            for m in range(maxN):
                acc = acc + Phi[i][m][:, None] * Qg[m]
            PhiQg.append(acc)
        t = [PhiQg[i] + phi_xi[i] * ghat for i in range(maxN)]
        zmask = [(jnp.full((T,), m, jnp.int32) < zc) for m in range(maxN)]
        v = []
        for m in range(maxN):
            acc = jnp.zeros((T, C), dtype)
            for i in range(maxN):
                acc = acc + Z[i][m][:, None] * t[i]
            v.append(acc * zmask[m].astype(dtype)[:, None])
        sigma = jnp.zeros((T, C), dtype)
        phiQg = jnp.zeros((T, C), dtype)
        for i in range(maxN):
            sigma = sigma + Qg[i] * PhiQg[i]
            phiQg = phiQg + phi_xi[i] * Qg[i]
        sigma = sigma + 2.0 * ghat * phiQg + ghat * ghat * phi0[:, None]
        Lv = []
        for m in range(maxN):
            acc = jnp.zeros((T, C), dtype)
            for k in range(maxN):
                acc = acc + Linv[m][k][:, None] * v[k]
            Lv.append(acc * zmask[m].astype(dtype)[:, None])
        tau2 = sigma
        for m in range(maxN):
            tau2 = tau2 - Lv[m] * Lv[m]

        # ---- first passer in database order ----------------------------
        ok = (cand & rank_ok & (tau2 > chol_pivot2)
              & (cols >= cursor[:, None]))
        best = jnp.min(jnp.where(ok, cols, _BIG), axis=1).astype(jnp.int32)
        any_ok = jnp.any(ok, axis=1) & (N < max_points) & (~done_b)
        onehot = cols == best[:, None]

        def pick(slab):
            return jnp.sum(jnp.where(onehot, slab, 0.0), axis=1)

        # ---- accept: state update at the picked candidate (masked) ------
        acc = any_ok
        accf = acc.astype(dtype)
        tau2_b = pick(tau2)
        tau = jnp.sqrt(jnp.maximum(tau2_b, jnp.finfo(dtype).tiny))
        xi = [pick(Xc[c]) for c in range(n)]
        phi_b = [pick(phi_xi[i]) for i in range(maxN)]
        Qg_b = [pick(Qg[i]) for i in range(maxN)]
        Lv_b = [pick(Lv[m]) for m in range(maxN)]
        ghat_b = pick(ghat)
        if pd > 0:
            Rc_b = [[pick(Rc[j][k]) for k in range(pd)] for j in range(pd)]
            rowc_b = [pick(rowc[k]) for k in range(pd)]
            pi_b = [pick(p) for p in pi_c]

        isN = [acc & (jnp.full((T,), i, jnp.int32) == N) for i in range(maxN)]
        isZ = [acc & (jnp.full((T,), m, jnp.int32) == zc) for m in range(maxN)]

        # sites[slotN] = xi
        for i in range(maxN):
            w = isN[i].astype(dtype)
            for c in range(n):
                sites[i][c] = sites[i][c] + w * (xi[c] - sites[i][c])

        if pd > 0:
            # Q <- blkdiag(Q, 1) G' — replay the Givens planes on the columns
            # (rbf_round4.py:205-227); recomputes c/s from the state R
            Rg = [[R[j][k] for k in range(pd)] for j in range(pd)]
            rowg = [pi_b[k] for k in range(pd)]
            Npd = jnp.minimum(N, pd)
            for j in range(pd):
                active = j < Npd
                a = Rg[j][j]
                b = rowg[j]
                r = jnp.sqrt(a * a + b * b)
                has = (r > 0) & active & acc
                rsafe = jnp.where(r > 0, r, 1.0)
                cth = jnp.where(has, a / rsafe, 1.0)
                sth = jnp.where(has, b / rsafe, 0.0)
                for k in range(pd):
                    Rjk = Rg[j][k]
                    Rg[j][k] = cth * Rjk + sth * rowg[k]
                    rowg[k] = -sth * Rjk + cth * rowg[k]
                # rotate Q columns (j, slotN): colN = sum_m [m==N] Q[:, m]
                for i in range(maxN):
                    colj = Q[i][j]
                    colN = zero
                    for m in range(maxN):
                        colN = colN + isN[m].astype(dtype) * Q[i][m]
                    newj = cth * colj + sth * colN
                    newN = -sth * colj + cth * colN
                    Q[i][j] = jnp.where(acc, newj, Q[i][j])
                    for m in range(maxN):
                        Q[i][m] = jnp.where(isN[m], newN, Q[i][m])
            # R <- R_rot (rotated rows j < pd), then row slotN = row_rot
            # (the .at[slotN].set wins when slotN < pd, rbf_round4.py:227)
            for j in range(pd):
                for k in range(pd):
                    R[j][k] = jnp.where(acc, Rc_b[j][k], R[j][k])
            for i in range(maxN):
                for k in range(pd):
                    R[i][k] = jnp.where(isN[i], rowc_b[k], R[i][k])

        # zcol = Qg with entry slotN = ghat; Z[:, zslot] = zcol
        zcol = [Qg_b[i] + isN[i].astype(dtype) * (ghat_b - Qg_b[i])
                for i in range(maxN)]
        for i in range(maxN):
            for m in range(maxN):
                Z[i][m] = jnp.where(isZ[m], zcol[i], Z[i][m])
        # L[zslot] = [Lv (zc-masked); tau at diagonal]
        zm = [zmask[m].astype(dtype) for m in range(maxN)]
        for m in range(maxN):
            for k in range(maxN):
                newv = jnp.where(jnp.full((T,), k, jnp.int32) == zc, tau,
                                 Lv_b[k] * zm[k])
                L[m][k] = jnp.where(isZ[m], newv, L[m][k])
        # Linv[zslot] = [-(Linv' Lv)/tau ; 1/tau at diagonal]
        linv_row = []
        for k in range(maxN):
            s = zero
            for m in range(maxN):
                s = s + Linv[m][k] * Lv_b[m]
            linv_row.append(-s / tau)
        for m in range(maxN):
            for k in range(maxN):
                newv = jnp.where(jnp.full((T,), k, jnp.int32) == zc,
                                 1.0 / tau, linv_row[k] * zm[k])
                Linv[m][k] = jnp.where(isZ[m], newv, Linv[m][k])
        # Phi row slotN = phi_xi, col slotN = phi_xi, diag slotN = phi0
        for i in range(maxN):
            for j in range(maxN):
                newv = jnp.where(isN[i], phi_b[j], Phi[i][j])
                newv = jnp.where(isN[j] & (~isN[i]), phi_b[i], newv)
                newv = jnp.where(isN[i] & isN[j], phi0, newv)
                Phi[i][j] = newv

        accepted = jnp.maximum(
            accepted,
            (onehot & (acc.astype(jnp.int32)[:, None] > 0)).astype(jnp.int32))
        N_new = N + acc.astype(jnp.int32)
        zc = zc + acc.astype(jnp.int32)
        cursor = jnp.where(acc, best + 1, jnp.full((T,), C, jnp.int32))
        done = jnp.maximum(
            done, ((~any_ok) | (N_new >= max_points)).astype(jnp.int32))
        N = N_new

        return (_stack2(sites), _stack2(Phi), _stack2(Q), _stack2(Z),
                _stack2(L), _stack2(Linv),
                (_stack2(R) if pd > 0 else R_s),
                zc, N, accepted, cursor, done)

    # early exit: most lanes accept only 1-3 points, so the tile usually
    # finishes well before the max_points-trip bound
    def _cond(wc):
        w, carry = wc
        done = carry[11]
        return (w < max_points) & (jnp.min(done) == 0)

    def _body(wc):
        w, carry = wc
        return w + 1, _wave_body(w, carry)

    _, carry = jax.lax.while_loop(_cond, _body,
                                  (jnp.asarray(0, jnp.int32), carry0))
    accepted, N = carry[9] > 0, carry[8]
    return accepted, N
