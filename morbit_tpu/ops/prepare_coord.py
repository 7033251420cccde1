"""Coordinate-sliced (batch-on-lanes) rounds-1-3 selection kernel body.

Hand-vectorized re-expression of ``rbf_selection_core`` for the Pallas TPU
kernel: the naive ``vmap(core)``-inside-the-kernel lowers the per-lane
``(cap, n)``/``(n, n)`` tensors with ``n`` on the 128-wide lane axis (64x
padding at n=2) and runs ~15x SLOWER than plain XLA (measured 42 ms at
B=1024 on v5e). Here every per-lane scalar is a ``(T,)`` vector (T lanes =
the batch tile), every per-lane ``(cap,)`` vector is a ``(T, cap)`` slab,
and the tiny ``(n, n)`` matrices are Python lists of ``(T,)`` vectors — all
operations vectorize fully across the batch tile on the VPU.

SEMANTICS: mirrors ``rbf_selection_core`` + ``affinely_independent_points``
+ ``intersect_box`` step for step (same reference citations apply:
``RbfModel.jl:518-655``, ``AffinelyIndependentPoints.jl``,
``utilities.jl:156-287``). Equivalence against the shared core is pinned by
tests/test_prepare_fused.py on random cases; float reductions may differ in
the last bits (different but valid summation orders), integer selections
agree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = float("inf")


def _iota_cols(T, cap):
    return jax.lax.broadcasted_iota(jnp.int32, (T, cap), 1)


def _ortho_complement_coord(Y, k, n, dtype):
    """Inf-norm-normalized orthogonal complement of the first ``k`` columns
    of the per-lane ``n x n`` matrix ``Y`` (lists of (T,) vectors).

    Mirrors ``householder_q`` + ``orthogonal_complement`` (ops/affine.py)
    with LAPACK sign conventions; ``k`` is a (T,) int vector."""
    A = [[Y[i][j] for j in range(n)] for i in range(n)]
    Q = [[jnp.full_like(Y[0][0], 1.0 if i == j else 0.0) for j in range(n)]
         for i in range(n)]
    zero = jnp.zeros_like(Y[0][0])
    for j in range(n):
        # x = column j with entries above the diagonal zeroed (static mask)
        x = [A[i][j] if i >= j else zero for i in range(n)]
        norm2 = zero
        for i in range(j, n):
            norm2 = norm2 + x[i] * x[i]
        normx = jnp.sqrt(norm2)
        x1 = A[j][j]
        sgn = jnp.where(x1 >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sgn * normx
        v = [x[i] - (alpha if i == j else zero) if i == j else x[i]
             for i in range(n)]
        vnorm2 = zero
        for i in range(n):
            vnorm2 = vnorm2 + v[i] * v[i]
        active = (j < k) & (vnorm2 > 0) & (normx > 0)
        beta = jnp.where(active,
                         2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0), 0.0)
        # A <- A - beta v (v' A);  Q <- Q - beta (Q v) v'
        for m in range(n):
            vA = zero
            for i in range(n):
                vA = vA + v[i] * A[i][m]
            for i in range(n):
                A[i][m] = A[i][m] - beta * v[i] * vA
        Qv = [zero] * n
        for i in range(n):
            acc = zero
            for m in range(n):
                acc = acc + Q[i][m] * v[m]
            Qv[i] = acc
        for i in range(n):
            for m in range(n):
                Q[i][m] = Q[i][m] - beta * Qv[i] * v[m]
    Z = [[None] * n for _ in range(n)]
    for m in range(n):
        nrm = zero
        for i in range(n):
            nrm = jnp.maximum(nrm, jnp.abs(Q[i][m]))
        safe = jnp.where(nrm > 0, nrm, 1.0)
        for i in range(n):
            Z[i][m] = Q[i][m] / safe
    return Z


def _affine_pick_coord(Xc, x_sc, cand, piv, n_pick, n, cap, dtype,
                       Y=None, k=None, Z=None):
    """Greedy affinely-independent selection on coordinate-sliced data.

    ``Xc``: list of n (T, cap) slabs; ``cand``: (T, cap) bool; ``piv``:
    (T,); ``n_pick``: (T,) int or static int. Returns (selected, order
    [list of n (T,) i32], n_picked, Y, k, Z)."""
    T = cand.shape[0]
    zero = jnp.zeros((T,), dtype)
    cand_f = cand.astype(dtype)
    shifted = [(Xc[i] - x_sc[i][:, None]) * cand_f for i in range(n)]
    if Y is None:
        Y = [[zero for _ in range(n)] for _ in range(n)]
        k = jnp.zeros((T,), jnp.int32)
        Z = _ortho_complement_coord(Y, k, n, dtype)
    selected = jnp.zeros((T, cap), bool)
    order = [jnp.full((T,), -1, jnp.int32) for _ in range(n)]
    n_picked = jnp.zeros((T,), jnp.int32)
    done = jnp.zeros((T,), bool)
    cols = _iota_cols(T, cap)
    n_pick_v = (jnp.full((T,), n_pick, jnp.int32)
                if isinstance(n_pick, int) else n_pick)

    for _ in range(n):
        avail = cand & (~selected)
        first = n_picked == 0
        # Zm = Z with columns < k zeroed
        Zm = [[Z[i][m] * (m >= k).astype(dtype) for m in range(n)]
              for i in range(n)]
        # scores
        score_proj = None
        for i in range(n):
            pb = None  # projback row i: sum_m (sum_c shifted_c Zm[c][m]) Zm[i][m]
            for m in range(n):
                proj_m = None
                for c in range(n):
                    t = shifted[c] * Zm[c][m][:, None]
                    proj_m = t if proj_m is None else proj_m + t
                t = proj_m * Zm[i][m][:, None]
                pb = t if pb is None else pb + t
            a = jnp.abs(pb)
            score_proj = a if score_proj is None else jnp.maximum(score_proj, a)
        score_norm = None
        for i in range(n):
            a = jnp.abs(shifted[i])
            score_norm = a if score_norm is None else jnp.maximum(score_norm, a)
        score = jnp.where(first[:, None], score_norm, score_proj)
        score = jnp.where(avail, score, -_INF)

        best = jnp.argmax(score, axis=1).astype(jnp.int32)
        best_val = jnp.max(score, axis=1)
        have_any = jnp.any(avail, axis=1)
        passes = have_any & (first | (best_val > piv))
        accept = passes & (~done) & (n_picked < n_pick_v) & (k < n)

        onehot = cols == best[:, None]
        best_row = [jnp.sum(jnp.where(onehot, shifted[i], 0.0), axis=1)
                    for i in range(n)]
        selected = selected | (onehot & accept[:, None])
        for s in range(n):
            order[s] = jnp.where((s == n_picked) & accept, best, order[s])
        for i in range(n):
            for m in range(n):
                Y[i][m] = jnp.where((m == k) & accept, best_row[i], Y[i][m])
        k = jnp.where(accept, k + 1, k)
        Z_new = _ortho_complement_coord(Y, k, n, dtype)
        for i in range(n):
            for m in range(n):
                Z[i][m] = jnp.where(accept, Z_new[i][m], Z[i][m])
        n_picked = jnp.where(accept, n_picked + 1, n_picked)
        done = done | (~accept)
    return selected, order, n_picked, Y, k, Z


def _intersect_absmax_coord(x, d, lb, ub, n, dtype):
    """``intersect_box(..., 'absmax')`` on (T,) coordinate lists
    (``_intersect_bounds``, ``src/utilities.jl:156-287``)."""
    zero = jnp.zeros_like(x[0])
    sigmas = []
    for i in range(n):
        for b, sense_lb in ((lb[i], True), (ub[i], False)):
            tmp = b - x[i]
            dir_nz = d[i] != 0
            tmp_z = tmp == 0
            safe_ad = jnp.where(dir_nz, d[i], 1.0)
            cross = tmp / safe_ad
            if sense_lb:
                onb = jnp.where(d[i] > 0, _INF, 0.0)
            else:
                onb = jnp.where(d[i] < 0, _INF, 0.0)
            s = jnp.where(tmp_z, onb, cross)
            sigmas.append(jnp.where(dir_nz | tmp_z, s, _INF))
    pos_min = None
    any_pos = None
    neg_max = None
    any_neg = None
    for s in sigmas:
        nonneg = s >= 0
        pv = jnp.where(nonneg, s, _INF)
        nv = jnp.where(~nonneg, s, -_INF)
        pos_min = pv if pos_min is None else jnp.minimum(pos_min, pv)
        neg_max = nv if neg_max is None else jnp.maximum(neg_max, nv)
        any_pos = nonneg if any_pos is None else (any_pos | nonneg)
        any_neg = (~nonneg) if any_neg is None else (any_neg | (~nonneg))
    sigma_pos = jnp.where(any_pos, pos_min, 0.0)
    sigma_neg = jnp.where(any_neg, neg_max, 0.0)
    d_zero = None
    for i in range(n):
        z = d[i] == 0
        d_zero = z if d_zero is None else (d_zero & z)
    sigma_pos = jnp.where(d_zero, _INF, sigma_pos)
    sigma_neg = jnp.where(d_zero, _INF, sigma_neg)
    return jnp.where(jnp.abs(sigma_pos) >= jnp.abs(sigma_neg),
                     sigma_pos, sigma_neg)


def selection_coord_batched(X_t, count, x_s, x_index, delta, lb_s, ub_s,
                            max_new, *, n, cap, dtype, theta_e1,
                            theta_e2_dmax, theta_pivot, delta_max,
                            skip2_same_theta, ensure_fully_linear):
    """Batched rounds-1-3 selection on a (T, n, cap) site block.

    Mirrors :func:`morbit_tpu.models.rbf_model.rbf_selection_core` lane for
    lane. Inputs: ``X_t`` (T, n, cap) transposed sites; the rest (T,) /
    (T, n). Returns the core's 10 outputs batched (ints as int32, bools as
    (T,)-bool).

    ``ensure_fully_linear`` may be static (bool) or a traced per-lane (T,)
    bool vector (the criticality micro-step rebuild flag): the traced
    variant computes round 2 and both round-3 proposals and masks per
    lane, matching the corresponding static variant's values exactly."""
    T = count.shape[0]
    Xc = [X_t[:, i, :] for i in range(n)]
    x_sc = [x_s[:, i] for i in range(n)]
    lbv = [lb_s[:, i] for i in range(n)]
    ubv = [ub_s[:, i] for i in range(n)]
    delta_1 = jnp.asarray(theta_e1, dtype) * delta
    lb1 = [jnp.maximum(lbv[i], x_sc[i] - delta_1) for i in range(n)]
    ub1 = [jnp.minimum(ubv[i], x_sc[i] + delta_1) for i in range(n)]
    piv1 = jnp.asarray(theta_pivot, dtype) * delta_1
    cols = _iota_cols(T, cap)
    valid = cols < count[:, None]
    not_center = cols != x_index[:, None]

    def inbox(lo, hi):
        m = None
        for i in range(n):
            t = (Xc[i] >= lo[i][:, None]) & (Xc[i] <= hi[i][:, None])
            m = t if m is None else (m & t)
        return m

    cand1 = valid & inbox(lb1, ub1) & not_center

    # ---- round 1
    _, r1_order, r1_cnt, Y, k1, Z1 = _affine_pick_coord(
        Xc, x_sc, cand1, piv1, n, n, cap, dtype)
    # improving directions: row r = Z column n-1-r
    dirs = [[Z1[i][n - 1 - r] for i in range(n)] for r in range(n)]
    dirs_count = (n - k1).astype(jnp.int32)
    n_missing1 = n - r1_cnt

    efl_static = isinstance(ensure_fully_linear, (bool, int))
    # ---- round 2
    if efl_static and ensure_fully_linear:
        r2_order = [jnp.full((T,), -1, jnp.int32) for _ in range(n)]
        r2_cnt = jnp.zeros((T,), jnp.int32)
        fl_after2 = jnp.ones((T,), bool)
    else:
        delta_2 = jnp.full((T,), theta_e2_dmax, dtype)
        lb2 = [jnp.maximum(lbv[i], x_sc[i] - delta_2) for i in range(n)]
        ub2 = [jnp.minimum(ubv[i], x_sc[i] + delta_2) for i in range(n)]
        cand2 = valid & inbox(lb2, ub2) & not_center & (~cand1)
        Y2 = [[Y[i][j] for j in range(n)] for i in range(n)]
        Z2 = [[Z1[i][j] for j in range(n)] for i in range(n)]
        _, r2_order, r2_picked, _, _, _ = _affine_pick_coord(
            Xc, x_sc, cand2, piv1, n_missing1, n, cap, dtype,
            Y=Y2, k=k1, Z=Z2)
        skip2 = n_missing1 == 0
        if skip2_same_theta:
            skip2 = skip2 | jnp.isclose(delta, jnp.asarray(delta_max, dtype))
        r2_cnt = jnp.where(skip2, 0, r2_picked)
        fl_after2 = skip2
        if not efl_static:
            efl = ensure_fully_linear  # (T,) bool
            r2_cnt = jnp.where(efl, 0, r2_cnt)
            r2_order = [jnp.where(efl, -1, r2_order[s]) for s in range(n)]
            fl_after2 = efl | fl_after2
    n_missing2 = n_missing1 - r2_cnt

    def round3(D, n_missing_, max_new_):
        n_new_ = jnp.clip(n_missing_, 0, jnp.maximum(max_new_, 0))
        sites = []
        oks = []
        for r in range(n):
            d = [D[r][i] for i in range(n)]
            ln = _intersect_absmax_coord(x_sc, d, lb1, ub1, n, dtype)
            off = [ln * d[i] for i in range(n)]
            mx = None
            for i in range(n):
                a = jnp.abs(off[i])
                mx = a if mx is None else jnp.maximum(mx, a)
            oks.append(mx > piv1)
            sites.append([x_sc[i] + off[i] for i in range(n)])
        active = [r < n_new_ for r in range(n)]
        any_fail = None
        for r in range(n):
            t = active[r] & (~oks[r])
            any_fail = t if any_fail is None else (any_fail | t)
        covers = n_new_ >= n_missing_
        return sites, active, oks, any_fail, covers, n_new_

    s3, act3, ok3, fail3, covers3, n_new3 = round3(dirs, n_missing2, max_new)

    if (not efl_static) or ensure_fully_linear:
        eyeD = [[jnp.full((T,), 1.0 if r == i else 0.0, dtype)
                 for i in range(n)] for r in range(n)]
        s3c, act3c, ok3c, _, covers3c, n_new3c = round3(
            eyeD, jnp.full((T,), n, jnp.int32), max_new)
        rebuild = (fail3 if efl_static else (ensure_fully_linear & fail3))
        r1_cnt = jnp.where(rebuild, 0, r1_cnt)
        r2_cnt = jnp.where(rebuild, 0, r2_cnt)
        sites3 = [[jnp.where(rebuild, s3c[r][i], s3[r][i])
                   for i in range(n)] for r in range(n)]
        active3 = [(rebuild & act3c[r]) | ((~rebuild) & act3[r])
                   for r in range(n)]
        ok3v = [(rebuild & ok3c[r]) | ((~rebuild) & ok3[r]) for r in range(n)]
        n_new = jnp.where(rebuild, n_new3c, n_new3)
        dirs = [[jnp.where(rebuild, eyeD[r][i], dirs[r][i])
                 for i in range(n)] for r in range(n)]
        dirs_count = jnp.where(rebuild, n, dirs_count)
        round3_ran = rebuild | (n_missing2 > 0)
        all_ok = None
        for r in range(n):
            t = ok3v[r] | (~active3[r])
            all_ok = t if all_ok is None else (all_ok & t)
        fl3 = ((rebuild & covers3c) | ((~rebuild) & covers3)) & all_ok
    else:
        sites3, active3, n_new = s3, act3, n_new3
        round3_ran = n_missing2 > 0
        all_ok = None
        for r in range(n):
            t = ok3[r] | (~act3[r])
            all_ok = t if all_ok is None else (all_ok & t)
        fl3 = covers3 & all_ok
    fully_linear = ((round3_ran & fl3 & (r2_cnt == 0))
                    | ((~round3_ran) & fl_after2))

    return (r1_order, r1_cnt, r2_order, r2_cnt, sites3, active3,
            n_new.astype(jnp.int32), dirs, dirs_count, fully_linear)
