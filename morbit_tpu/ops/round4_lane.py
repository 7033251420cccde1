"""Lane-batched (batch-last) array-form RBF round-4 kernel body.

Second-generation fused round-4 (supersedes the coordinate-sliced list
form of ``ops/round4_coord.py``): the batch tile T lives on the LANE axis
(last dim) of every array, and the per-lane state is kept in STACKED form
throughout — ``Phi/Q/Z/L/Linv`` are ``(maxN, maxN, T)``, per-candidate
slabs are ``(C, T)`` or ``(maxN, C, T)``. All contractions over the tiny
``maxN``/``pd`` axes are static Python loops of dense multiply-adds, so a
wave costs ~50 vector ops on full-lane tiles instead of the list form's
~400 (plus its per-wave stack/unstack round-trip, which dominated its
runtime). The acceptance semantics are identical to
:func:`morbit_tpu.models.rbf_round4.run_round4` (first passer in database
order per wave, Cholesky-bounded — ``src/models/RbfModel.jl:352-499``);
equivalence is pinned by tests/test_round4_fused.py.

Mosaic notes: no i1 reshapes/minor-dim broadcasts (masks are cast to the
compute dtype before axis insertion), no jnp.stack/concatenate of vectors,
early-exit ``lax.while_loop`` over waves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 2 ** 30


def _eye3(maxN, T, dtype):
    """(maxN, maxN, T) identity-per-lane, built from iota (a jnp.eye literal
    would be CAPTURED by the Pallas kernel, which pallas_call rejects)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (maxN, maxN, T), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (maxN, maxN, T), 1)
    return (ri == ci).astype(dtype)


def _phi_r2(kernel, r2, param, static_param):
    """``apply_kernel`` on an array; ``param`` broadcasts against ``r2``."""
    if kernel == "cubic":
        k = float(static_param)
        sign = (-1.0) ** -(-k // 2)
        return sign * r2 ** (k / 2.0)
    if kernel == "gaussian":
        return jnp.exp(-(param ** 2) * r2)
    if kernel == "multiquadric":
        return -jnp.sqrt(1.0 + param ** 2 * r2)
    if kernel == "inv_multiquadric":
        return 1.0 / jnp.sqrt(1.0 + param ** 2 * r2)
    if kernel == "thin_plate_spline":
        k = int(static_param)
        safe = jnp.where(r2 > 0, r2, 1.0)
        val = 0.5 * ((-1.0) ** (k + 1)) * r2 ** k * jnp.log(safe)
        return jnp.where(r2 > 0, val, 0.0)
    raise ValueError(f"unknown RBF kernel {kernel!r}")


def _masked_qr_lane(A, maxN, pd, dtype):
    """Masked Householder QR of the zero-row-padded (maxN, pd, T) block
    (same elimination order as ``rbf_round4._masked_householder_qr``)."""
    T = A.shape[-1]
    Q = _eye3(maxN, T, dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (maxN, T), 0)
    for j in range(pd):
        colj = A[:, j, :]                                      # (maxN, T)
        x = jnp.where(rows >= j, colj, 0.0)
        norm2 = jnp.sum(x * x, axis=0)                         # (T,)
        normx = jnp.sqrt(norm2)
        sgn = jnp.where(A[j, j, :] >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sgn * normx
        ej = (rows == j).astype(dtype)
        v = x - alpha[None, :] * ej                            # (maxN, T)
        vnorm2 = jnp.sum(v * v, axis=0)
        active = (normx > 0) & (vnorm2 > 0)
        beta = jnp.where(active,
                         2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0), 0.0)
        # A <- A - beta v (v'A); loop k over the pd columns (static)
        vA = [jnp.sum(v * A[:, k, :], axis=0) for k in range(pd)]  # pd x (T,)
        Anew = [A[:, k, :] - beta[None, :] * v * vA[k][None, :]
                for k in range(pd)]
        colsA = jax.lax.broadcasted_iota(jnp.int32, (maxN, pd, T), 1)
        upd = jnp.zeros_like(A)
        for k in range(pd):
            upd = upd + jnp.where(colsA == k, Anew[k][:, None, :], 0.0)
        A = upd
        # Q <- Q - beta (Qv) v'
        Qv = jnp.zeros((maxN, T), dtype)
        for m in range(maxN):
            Qv = Qv + Q[:, m, :] * v[m][None, :]
        Q = Q - beta[None, None, :] * Qv[:, None, :] * v[None, :, :]
    return Q, A


def round4_lane_batched(X, cand, sites0, count, param, *, n, C, maxN, pd,
                        kernel, static_param, chol_pivot2, max_points,
                        dtype):
    """Batched round-4 acceptance, batch T on the last (lane) axis.

    ``X``: (n, C, T) candidate sites; ``cand``: (C, T) bool; ``sites0``:
    (maxN, n, T) rounds-1-3 training sites (zero-padded); ``count``: (T,)
    int32; ``param``: (T,) shape parameter. Returns
    ``(accepted (C, T) bool, N_final (T,) int32)``.
    """
    T = count.shape[0]
    f = lambda b: b.astype(dtype)
    eps10 = 10 * jnp.finfo(dtype).eps
    tiny = jnp.finfo(dtype).tiny
    rowsN = jax.lax.broadcasted_iota(jnp.int32, (maxN, T), 0)  # slot index
    colsC = jax.lax.broadcasted_iota(jnp.int32, (C, T), 0)     # cand index
    eye3 = _eye3(maxN, T, dtype)
    param_b = param[None, :]                                   # (1, T)

    N0 = count.astype(jnp.int32)
    rowmask0 = f(rowsN < N0[None, :])                          # (maxN, T)

    # ---- Phi0: masked kernel Gram of the initial sites (identity beyond N)
    r2_ss = jnp.zeros((maxN, maxN, T), dtype)
    for c in range(n):
        d = sites0[:, c, :][:, None, :] - sites0[:, c, :][None, :, :]
        r2_ss = r2_ss + d * d
    Phi0 = _phi_r2(kernel, r2_ss, param_b[None], static_param)
    mm = rowmask0[:, None, :] * rowmask0[None, :, :]
    Phi = Phi0 * mm + eye3 * (1.0 - mm)
    phi0 = _phi_r2(kernel, jnp.zeros((1, T), dtype), param_b,
                   static_param)[0]                            # (T,)

    # ---- initial masked QR of the polynomial block
    if pd > 0:
        # poly rows: [1] or [1, x...] per training slot
        colsP = jax.lax.broadcasted_iota(jnp.int32, (maxN, pd, T), 1)
        Pi = jnp.where(colsP == 0, 1.0, 0.0).astype(dtype)
        for c in range(n):
            if pd > 1:
                Pi = jnp.where(colsP == 1 + c,
                               sites0[:, c, :][:, None, :], Pi)
        Pi = Pi * rowmask0[:, None, :]
        Q, R = _masked_qr_lane(Pi, maxN, pd, dtype)
        pi_c = [jnp.ones((C, T), dtype)] + (
            [X[c] for c in range(n)] if pd > 1 else [])        # pd x (C, T)
    else:
        Q = eye3
        R = jnp.zeros((maxN, 1, T), dtype)
        pi_c = []

    Z = jnp.zeros((maxN, maxN, T), dtype)
    L = _eye3(maxN, T, dtype)
    Linv = L
    carry0 = (sites0, Phi, Q, R, Z, L, Linv,
              N0, jnp.zeros((T,), jnp.int32),                  # N, zc
              jnp.zeros((C, T), jnp.int32),                    # accepted
              jnp.zeros((T,), jnp.int32),                      # cursor
              jnp.zeros((T,), jnp.int32))                      # done

    cand_f = f(cand)

    def wave(carry):
        (sites, Phi, Q, R, Z, L, Linv, N, zc, accepted, cursor, done) = carry
        rowmask = f(rowsN < N[None, :])                        # (maxN, T)
        zmask = f(rowsN < zc[None, :])                         # (maxN, T)

        # ---- phi_xi: kernel values candidate x training row (0 beyond N)
        phi_xi = []
        for i in range(maxN):
            r2 = jnp.zeros((C, T), dtype)
            for c in range(n):
                d = sites[i, c, :][None, :] - X[c]
                r2 = r2 + d * d
            phi_xi.append(_phi_r2(kernel, r2, param_b, static_param)
                          * rowmask[i][None, :])

        # ---- Givens pass per candidate: rotate the appended poly row
        if pd > 0:
            Rc = [[R[j, k, :][None, :] + jnp.zeros((C, T), dtype)
                   for k in range(pd)] for j in range(pd)]
            rowc = [p + jnp.zeros((C, T), dtype) for p in pi_c]
            gvec = [jnp.zeros((C, T), dtype) for _ in range(maxN)]
            ghat = jnp.ones((C, T), dtype)
            Npd = jnp.minimum(N, pd)
            for j in range(pd):
                act = f(Npd > j)[None, :]                      # (1, T)
                a = Rc[j][j]
                b = rowc[j]
                r = jnp.sqrt(a * a + b * b)
                has = jnp.where(r > 0, act, 0.0)
                rsafe = jnp.where(r > 0, r, 1.0)
                cth = 1.0 + has * (a / rsafe - 1.0)
                sth = has * (b / rsafe)
                for k in range(pd):
                    Rjk = Rc[j][k]
                    Rc[j][k] = cth * Rjk + sth * rowc[k]
                    rowc[k] = -sth * Rjk + cth * rowc[k]
                for m in range(maxN):
                    e = 1.0 if m == j else 0.0
                    gvec[m] = cth * gvec[m] - sth * e
                ghat = cth * ghat
            rn2 = jnp.zeros((C, T), dtype)
            for k in range(pd):
                rn2 = rn2 + rowc[k] * rowc[k]
            below = f(N < pd)[None, :]
            rank_ok = (below * f(jnp.sqrt(rn2) > eps10)
                       + (1.0 - below)) > 0                    # (C, T) bool
        else:
            gvec = [jnp.zeros((C, T), dtype) for _ in range(maxN)]
            ghat = jnp.ones((C, T), dtype)
            rank_ok = jnp.ones((C, T), bool)

        # ---- tau^2 ingredients (static maxN contractions)
        Qg = [None] * maxN
        for i in range(maxN):
            acc = jnp.zeros((C, T), dtype)
            for m in range(maxN):
                acc = acc + Q[i, m, :][None, :] * gvec[m]
            Qg[i] = acc
        PhiQg = [None] * maxN
        for i in range(maxN):
            acc = jnp.zeros((C, T), dtype)
            for m in range(maxN):
                acc = acc + Phi[i, m, :][None, :] * Qg[m]
            PhiQg[i] = acc
        t = [PhiQg[i] + phi_xi[i] * ghat for i in range(maxN)]
        v = [None] * maxN
        for m in range(maxN):
            acc = jnp.zeros((C, T), dtype)
            for i in range(maxN):
                acc = acc + Z[i, m, :][None, :] * t[i]
            v[m] = acc * zmask[m][None, :]
        sigma = jnp.zeros((C, T), dtype)
        phiQg = jnp.zeros((C, T), dtype)
        for i in range(maxN):
            sigma = sigma + Qg[i] * PhiQg[i]
            phiQg = phiQg + phi_xi[i] * Qg[i]
        sigma = sigma + 2.0 * ghat * phiQg + ghat * ghat * phi0[None, :]
        Lv = [None] * maxN
        for m in range(maxN):
            acc = jnp.zeros((C, T), dtype)
            for k in range(maxN):
                acc = acc + Linv[m, k, :][None, :] * v[k]
            Lv[m] = acc * zmask[m][None, :]
        tau2 = sigma
        for m in range(maxN):
            tau2 = tau2 - Lv[m] * Lv[m]

        # ---- first passer in database order
        ok = ((cand_f > 0) & rank_ok & (tau2 > chol_pivot2)
              & (colsC >= cursor[None, :]))
        best = jnp.min(jnp.where(ok, colsC, _BIG), axis=0).astype(jnp.int32)
        any_ok = jnp.any(ok, axis=0) & (N < max_points) & (done == 0)
        onehot = f(colsC == best[None, :])                     # (C, T)

        def pick(slab):
            return jnp.sum(onehot * slab, axis=0)              # (T,)

        accf = f(any_ok)[None, :]                              # (1, T)
        tau2_b = pick(tau2)
        tau = jnp.sqrt(jnp.maximum(tau2_b, tiny))              # (T,)
        isN = f(rowsN == N[None, :]) * accf                    # (maxN, T)
        isZ = f(rowsN == zc[None, :]) * accf

        # sites[slotN] = xi
        xi = [pick(X[c]) for c in range(n)]                    # n x (T,)
        colsS = jax.lax.broadcasted_iota(jnp.int32, (maxN, n, T), 1)
        xi_rows = jnp.zeros((maxN, n, T), dtype)
        for c in range(n):
            xi_rows = xi_rows + jnp.where(colsS == c, xi[c][None, None, :],
                                          0.0)
        sites = sites + isN[:, None, :] * (xi_rows - sites)

        phi_b = [pick(phi_xi[i]) for i in range(maxN)]
        Qg_b = [pick(Qg[i]) for i in range(maxN)]
        Lv_b = [pick(Lv[m]) for m in range(maxN)]
        ghat_b = pick(ghat)

        if pd > 0:
            Rc_b = [[pick(Rc[j][k]) for k in range(pd)] for j in range(pd)]
            rowc_b = [pick(rowc[k]) for k in range(pd)]
            pi_b = [pick(p) for p in pi_c]
            # Q <- blkdiag(Q, 1) G' — replay the planes on the columns,
            # recomputing c/s from the state R (rbf_round4.py:205-227)
            Rg = [[R[j, k, :] for k in range(pd)] for j in range(pd)]
            rowg = [pi_b[k] for k in range(pd)]
            accv = accf[0]                                     # (T,)
            Npd = jnp.minimum(N, pd)
            for j in range(pd):
                act = f(Npd > j) * accv
                a = Rg[j][j]
                b = rowg[j]
                r = jnp.sqrt(a * a + b * b)
                has = jnp.where(r > 0, act, 0.0)
                rsafe = jnp.where(r > 0, r, 1.0)
                cth = 1.0 + has * (a / rsafe - 1.0)
                sth = has * (b / rsafe)
                for k in range(pd):
                    Rjk = Rg[j][k]
                    Rg[j][k] = cth * Rjk + sth * rowg[k]
                    rowg[k] = -sth * Rjk + cth * rowg[k]
                # rotate Q columns (j, slotN)
                colj = Q[:, j, :]                              # (maxN, T)
                colN = jnp.sum(isN[None, :, :] * Q, axis=1)    # (maxN, T)
                newj = cth[None, :] * colj + sth[None, :] * colN
                newN = -sth[None, :] * colj + cth[None, :] * colN
                colsQ = jax.lax.broadcasted_iota(jnp.int32, (maxN, maxN, T),
                                                 1)
                Q = jnp.where(colsQ == j,
                              (accv[None, :] * newj
                               + (1.0 - accv)[None, :] * colj)[:, None, :],
                              Q)
                Q = Q + isN[None, :, :] * (newN[:, None, :] - Q)
            # R rows j < pd <- rotated per-candidate copies; row slotN <-
            # rotated poly row (the slotN write wins when slotN < pd)
            colsR = jax.lax.broadcasted_iota(jnp.int32, (maxN, pd, T), 1)
            for j in range(pd):
                rowj = jnp.zeros((pd, T), dtype)
                for k in range(pd):
                    rowj = rowj + jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (pd, T), 0) == k,
                        Rc_b[j][k][None, :], 0.0)
                sel = f(jax.lax.broadcasted_iota(
                    jnp.int32, (maxN, T), 0) == j) * accf
                R = R + sel[:, None, :] * (rowj[None, :, :] - R)
            rown = jnp.zeros((pd, T), dtype)
            for k in range(pd):
                rown = rown + jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (pd, T), 0) == k,
                    rowc_b[k][None, :], 0.0)
            R = R + isN[:, None, :] * (rown[None, :, :] - R)

        # zcol = Qg_b with entry slotN = ghat_b; Z[:, zslot] = zcol
        zcol = jnp.zeros((maxN, T), dtype)
        for i in range(maxN):
            zcol = zcol + jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (maxN, T), 0) == i,
                Qg_b[i][None, :], 0.0)
        zcol = zcol + isN * (ghat_b[None, :] - zcol)
        Z = Z + isZ[None, :, :] * (zcol[:, None, :] - Z)
        # L[zslot] = [Lv (zc-masked); tau at diagonal]
        lrow = jnp.zeros((maxN, T), dtype)
        for k in range(maxN):
            lrow = lrow + jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (maxN, T), 0) == k,
                (Lv_b[k] * zmask[k])[None, :], 0.0)
        isdiag = f(rowsN == zc[None, :])                       # (maxN, T)
        lrow = lrow + isdiag * (tau[None, :] - lrow)
        L = L + isZ[:, None, :] * (lrow[None, :, :] - L)
        # Linv[zslot] = [-(Linv' Lv)/tau ; 1/tau at diagonal]
        linv_row = jnp.zeros((maxN, T), dtype)
        for k in range(maxN):
            s = jnp.zeros((T,), dtype)
            for m in range(maxN):
                s = s + Linv[m, k, :] * Lv_b[m]
            linv_row = linv_row + jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (maxN, T), 0) == k,
                ((-s / tau) * zmask[k])[None, :], 0.0)
        linv_row = linv_row + isdiag * (1.0 / tau[None, :] - linv_row)
        Linv = Linv + isZ[:, None, :] * (linv_row[None, :, :] - Linv)
        # Phi row/col slotN = phi_b, diag slotN = phi0
        prow = jnp.zeros((maxN, T), dtype)
        for j in range(maxN):
            prow = prow + jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (maxN, T), 0) == j,
                phi_b[j][None, :], 0.0)
        Phi = Phi + isN[:, None, :] * (prow[None, :, :] - Phi)
        Phi = Phi + isN[None, :, :] * (prow[:, None, :] - Phi)
        Phi = Phi + (isN[:, None, :] * isN[None, :, :]) * (
            phi0[None, None, :] - Phi)

        accepted = jnp.maximum(accepted,
                               (onehot * accf).astype(jnp.int32))
        N = N + any_ok.astype(jnp.int32)
        zc = zc + any_ok.astype(jnp.int32)
        cursor = jnp.where(any_ok, best + 1,
                           jnp.full((T,), C, jnp.int32))
        done = jnp.maximum(done, ((~any_ok) | (N >= max_points))
                           .astype(jnp.int32))
        return (sites, Phi, Q, R, Z, L, Linv, N, zc, accepted, cursor, done)

    def cond(wc):
        w, carry = wc
        return (w < max_points) & (jnp.min(carry[11]) == 0)

    def body(wc):
        w, carry = wc
        return w + 1, wave(carry)

    _, carry = jax.lax.while_loop(cond, body,
                                  (jnp.asarray(0, jnp.int32), carry0))
    return carry[9] > 0, carry[7]
