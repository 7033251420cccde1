"""RBF round 4: Cholesky-bounded additional training points.

Reference: ``_rbf_round4`` (``src/models/RbfModel.jl:352-499``), implementing
Wild's scheme: starting from the affinely independent set of rounds 1-3,
additional database points inside the wide box are accepted one by one while
the Cholesky factor of ``Z' Phi Z`` stays bounded — the acceptance pivot is

    tau_xi^2 = sigma_xi - ||L^-1 v_xi||^2  >  theta_pivot_cholesky^4

with the incremental QR/Givens update of the polynomial-tail factor and
rank-1 updates of ``L``/``L^-1`` (``:429-494``).

TPU-first restructuring: instead of the reference's candidate-by-candidate
scan (a long sequential chain), acceptance proceeds in *waves*: every wave
evaluates ``tau^2`` for **all** remaining candidates against the current
state in one vmapped batch (MXU-friendly batched GEMMs) and accepts the
first passer in database order. Because the state only changes at an
acceptance, this is exactly the reference's sequential semantics — rejected
candidates before the accepted one saw the same state — but the sequential
chain length drops from #candidates to #acceptances.

``Q``/``R``/``Z``/``L``/``L^-1``/``Phi`` live in identity/zero-padded
``(max_pts, max_pts)`` buffers with dynamic counts; the Givens pass tracks
the last row of the rotation product in closed form (each plane ``(j, new)``
is used once, so row ``new`` evolves as ``g <- c*g - s*e_j``).

Like the reference's code path, ``Z``/``L`` start *empty* after rounds 1-3
and grow one column per accepted point. The ``use_max_points`` random-point
fallback (``:408-417``) is implemented in
``rbf_model.py`` (random in-box candidates appended after the database
rows, ``rbf_model.py:317-359``) using the per-iteration PRNG key threaded
through ``ModelContext``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from morbit_tpu.ops.rbf import apply_kernel, poly_basis, poly_dim


class Round4State(NamedTuple):
    sites: jax.Array   # (maxN, n) accepted sites
    N: jax.Array       # int32 accepted count
    Q: jax.Array       # (maxN, maxN) orthogonal factor (identity beyond N)
    R: jax.Array       # (maxN, pd)
    Z: jax.Array       # (maxN, maxN) null-space columns (zc valid)
    zc: jax.Array      # int32 valid Z columns
    L: jax.Array       # (maxN, maxN) lower Cholesky (identity beyond zc)
    Linv: jax.Array    # (maxN, maxN)
    Phi: jax.Array     # (maxN, maxN) kernel Gram (identity beyond N)
    accepted: jax.Array  # (cap_db,) bool — which candidate rows were taken


def _masked_householder_qr(Pi):
    """QR of the zero-row-padded (maxN, pd) polynomial block.

    Zero rows never enter the reflections, so Q is identity there.
    Returns (Q (maxN, maxN), R (maxN, pd))."""
    maxN, pd = Pi.shape
    dtype = Pi.dtype
    Q = jnp.eye(maxN, dtype=dtype)
    A = Pi

    def body(j, carry):
        A, Q = carry
        col = A[:, j]
        idx = jnp.arange(maxN)
        x = jnp.where(idx >= j, col, 0.0)
        normx = jnp.linalg.norm(x)
        sgn = jnp.where(col[j] >= 0, 1.0, -1.0).astype(dtype)
        alpha = -sgn * normx
        v = x - alpha * (idx == j).astype(dtype)
        vnorm2 = v @ v
        active = (normx > 0) & (vnorm2 > 0)
        beta = jnp.where(active, 2.0 / jnp.where(vnorm2 > 0, vnorm2, 1.0), 0.0)
        A = A - beta * jnp.outer(v, v @ A)
        Q = Q - beta * jnp.outer(Q @ v, v)
        return A, Q

    # pd is tiny and static: full unroll removes while-trip overhead
    A, Q = jax.lax.fori_loop(0, pd, body, (A, Q), unroll=True)
    return Q, A


def run_round4(
    db_X: jax.Array,
    cand_mask: jax.Array,
    init_sites: jax.Array,   # (maxN, n) rounds-1-3 sites (zero-padded)
    n_init,
    kernel: str,
    param,
    poly_deg: int,
    max_points: int,
    chol_pivot,              # theta_pivot_cholesky^2 (tested against its square)
    max_candidates: int | None = None,
):
    """Accept extra candidates in database order; returns Round4State."""
    maxN, n = init_sites.shape
    dtype = init_sites.dtype
    pd = poly_dim(n, poly_deg)
    cap = db_X.shape[0]
    rank_bound = pd

    row_mask0 = jnp.arange(maxN) < n_init
    d0 = init_sites[:, None, :] - init_sites[None, :, :]
    Phi0 = apply_kernel(kernel, jnp.sum(d0 * d0, axis=-1), param)
    mm = row_mask0[:, None] & row_mask0[None, :]
    Phi0 = jnp.where(mm, Phi0, jnp.eye(maxN, dtype=dtype))
    phi0 = apply_kernel(kernel, jnp.zeros((), dtype), param)

    if pd > 0:
        Pi0 = jax.vmap(lambda s: poly_basis(s, poly_deg))(init_sites)
        Pi0 = jnp.where(row_mask0[:, None], Pi0, 0.0)
        Q0, R0 = _masked_householder_qr(Pi0)
    else:
        Q0 = jnp.eye(maxN, dtype=dtype)
        R0 = jnp.zeros((maxN, 0), dtype)

    st0 = Round4State(
        sites=init_sites, N=jnp.asarray(n_init, jnp.int32),
        Q=Q0, R=R0,
        Z=jnp.zeros((maxN, maxN), dtype), zc=jnp.asarray(0, jnp.int32),
        L=jnp.eye(maxN, dtype=dtype), Linv=jnp.eye(maxN, dtype=dtype),
        Phi=Phi0,
        accepted=jnp.zeros((cap,), bool),
    )

    scan_cap = cap if max_candidates is None else min(cap, max_candidates)
    idxN = jnp.arange(maxN)

    def givens_pass(st, xi):
        """Rotate the appended poly row into R (``nullify_last_row``,
        ``utilities.jl:437-448``); returns (R_rot, row_rot, gvec, ghat)."""
        N = st.N
        pi_xi = poly_basis(xi, poly_deg)

        def giv(j, carry):
            R, row, gvec, ghat = carry
            active = j < jnp.minimum(N, pd)
            a = R[j, j]
            b = row[j]
            r = jnp.sqrt(a * a + b * b)
            has = (r > 0) & active
            cth = jnp.where(has, a / jnp.where(r > 0, r, 1.0), 1.0)
            sth = jnp.where(has, b / jnp.where(r > 0, r, 1.0), 0.0)
            Rj = R[j]
            R = R.at[j].set(cth * Rj + sth * row)
            row = -sth * Rj + cth * row
            # row `new` of the rotation product: each plane (j, new) is used
            # once, so rows j are still e_j when consumed
            gvec = cth * gvec - sth * (idxN == j).astype(dtype)
            ghat = cth * ghat
            return R, row, gvec, ghat

        return jax.lax.fori_loop(
            0, pd, giv,
            (st.R, pi_xi, jnp.zeros((maxN,), dtype), jnp.asarray(1.0, dtype)),
            unroll=True)

    def candidate_quantities(st, xi):
        """tau^2 test ingredients for one candidate vs the current state."""
        rmask = idxN < st.N
        diff = st.sites - xi[None, :]
        phi_xi = apply_kernel(kernel, jnp.sum(diff * diff, axis=-1), param)
        phi_xi = jnp.where(rmask, phi_xi, 0.0)

        if pd > 0:
            R_rot, row_rot, gvec, ghat = givens_pass(st, xi)
            rank_ok = jnp.where(
                st.N < rank_bound,
                jnp.linalg.norm(row_rot) > 10 * jnp.finfo(dtype).eps,
                True)
        else:
            R_rot = st.R
            row_rot = jnp.zeros((0,), dtype)
            gvec = jnp.zeros((maxN,), dtype)
            ghat = jnp.asarray(1.0, dtype)
            rank_ok = jnp.asarray(True)

        Qg = st.Q @ gvec
        zmask = idxN < st.zc
        v = jnp.where(zmask, st.Z.T @ (st.Phi @ Qg + phi_xi * ghat), 0.0)
        sigma = Qg @ (st.Phi @ Qg) + 2.0 * ghat * (phi_xi @ Qg) + ghat ** 2 * phi0
        Lv = jnp.where(zmask, st.Linv @ v, 0.0)
        tau2 = sigma - Lv @ Lv
        return tau2, rank_ok, phi_xi, R_rot, row_rot, gvec, ghat, Qg, Lv, zmask

    def accept(st, c):
        """Accept candidate row c (all quantities recomputed once)."""
        xi = db_X[c]
        (tau2, _, phi_xi, R_rot, row_rot, gvec, ghat, Qg, Lv, zmask
         ) = candidate_quantities(st, xi)
        tau = jnp.sqrt(jnp.maximum(tau2, jnp.finfo(dtype).tiny))
        N = st.N
        slotN = jnp.clip(N, 0, maxN - 1)
        zslot = jnp.clip(st.zc, 0, maxN - 1)
        sites = st.sites.at[slotN].set(xi)

        # Q <- blkdiag(Q, 1) G' — apply each plane (j, slotN) rotation to the
        # columns, recomputing the same c/s sequence
        if pd > 0:
            def givq(j, carry):
                Q, R, row = carry
                active = j < jnp.minimum(N, pd)
                a = R[j, j]
                b = row[j]
                r = jnp.sqrt(a * a + b * b)
                has = (r > 0) & active
                cth = jnp.where(has, a / jnp.where(r > 0, r, 1.0), 1.0)
                sth = jnp.where(has, b / jnp.where(r > 0, r, 1.0), 0.0)
                Rj = R[j]
                R = R.at[j].set(cth * Rj + sth * row)
                row = -sth * Rj + cth * row
                colj = Q[:, j]
                colN = Q[:, slotN]
                Q = Q.at[:, j].set(cth * colj + sth * colN)
                Q = Q.at[:, slotN].set(-sth * colj + cth * colN)
                return Q, R, row

            Qn, _, _ = jax.lax.fori_loop(
                0, pd, givq, (st.Q, st.R, poly_basis(xi, poly_deg)),
                unroll=True)
            Rn = R_rot.at[slotN].set(row_rot)
        else:
            Qn = st.Q
            Rn = st.R

        zcol = Qg.at[slotN].set(ghat)
        Z = st.Z.at[:, zslot].set(zcol)
        L = st.L.at[zslot].set(jnp.where(zmask, Lv, 0.0))
        L = L.at[zslot, zslot].set(tau)
        linv_row = -(st.Linv.T @ Lv) / tau
        Linv = st.Linv.at[zslot].set(jnp.where(zmask, linv_row, 0.0))
        Linv = Linv.at[zslot, zslot].set(1.0 / tau)

        Phi = st.Phi.at[slotN, :].set(phi_xi)
        Phi = Phi.at[:, slotN].set(phi_xi)
        Phi = Phi.at[slotN, slotN].set(phi0)

        return Round4State(
            sites=sites, N=N + 1, Q=Qn, R=Rn, Z=Z, zc=st.zc + 1,
            L=L, Linv=Linv, Phi=Phi,
            accepted=st.accepted.at[c].set(True))

    # One acceptance per wave, evaluated over a candidate *chunk* at the
    # cursor: tau^2 is only valid against the current state, so after an
    # acceptance the remaining candidates must be re-tested anyway — testing
    # a chunk of K at a time does (accepts + C/K) waves of K tau^2 each
    # instead of accepts waves of C each (~9x less tau^2 work at ZDT n=10),
    # with identical accept-first-in-order semantics.
    # tiny point budgets: full-width chunks + a fixed fori fuse best
    chunk = scan_cap if max_points <= 8 else min(scan_cap, 32)

    def tau2_chunk(st, cursor):
        if chunk == scan_cap:
            Xc = db_X[:scan_cap]
            idx = jnp.arange(scan_cap)
        else:
            start = jnp.clip(cursor, 0, max(scan_cap - chunk, 0))
            Xc = jax.lax.dynamic_slice_in_dim(db_X[:scan_cap], start, chunk,
                                              axis=0)
            idx = start + jnp.arange(chunk)

        def one(c):
            out = candidate_quantities(st, Xc[c])
            return out[0], out[1]

        tau2s, rank_oks = jax.vmap(one)(jnp.arange(chunk))
        ok = (cand_mask[idx] & rank_oks & (tau2s > chol_pivot ** 2)
              & (idx >= cursor))
        return ok, idx

    # A while_loop (not fori+cond) is essential: under vmap a cond lowers to
    # a select executing both branches for the whole batch, while while_loop
    # stops once every batch element is done.
    def wave_body(carry):
        st, cursor, done = carry
        ok, idx = tau2_chunk(st, cursor)
        any_ok = jnp.any(ok) & (st.N < max_points) & (~done)
        first = idx[jnp.argmax(ok)].astype(jnp.int32)
        st2 = jax.lax.cond(any_ok, lambda s: accept(s, first), lambda s: s, st)
        # advance past the accepted candidate, or past the whole chunk
        chunk_end = jnp.minimum(
            jnp.clip(cursor, 0, max(scan_cap - chunk, 0)) + chunk, scan_cap)
        cursor2 = jnp.where(any_ok, first + 1, chunk_end)
        exhausted = (cursor2 >= scan_cap) & (~any_ok)
        full = st2.N >= max_points
        return st2, cursor2, done | exhausted | full

    carry0 = (st0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    # Early-stopping while_loop for every budget: with the tiny-loop unrolls
    # the per-wave body is cheap and typical acceptance runs finish in
    # count..max_points waves, so stopping early beats the fused fixed fori
    # that kept computing tau^2 chunks after all lanes were done (measured
    # round 2: pass cost 5.3 -> see tools/profile_pass.py).
    st, _, _ = jax.lax.while_loop(lambda c: ~c[2], wave_body, carry0)
    return st
