"""RBF round 4: Cholesky-bounded additional training points.

Reference: ``_rbf_round4`` (``src/models/RbfModel.jl:352-499``), implementing
Wild's scheme: starting from the affinely independent set of rounds 1-3,
additional database points inside the wide box are accepted one by one while
the Cholesky factor of ``Z' Phi Z`` stays bounded — the acceptance pivot is

    tau_xi^2 = sigma_xi - ||L^-1 v_xi||^2  >  theta_pivot_cholesky^4

with the incremental QR/Givens update of the polynomial-tail factor and
rank-1 updates of ``L``/``L^-1`` (``:429-494``).

Here the whole loop is a fixed-shape ``lax.fori_loop`` over candidate rows:
``Q``/``R``/``Z``/``L``/``L^-1``/``Phi`` live in identity/zero-padded
``(max_pts, max_pts)`` buffers with dynamic counts, every update is a masked
matrix operation, and the Givens pass tracks the last row of the rotation
product ``G`` in closed form (each plane ``(j, new)`` is used once, so row
``new`` evolves as ``g <- c*g - s*e_j``).

Like the reference's code path, ``Z``/``L`` start *empty* after rounds 1-3
and grow one column per accepted point. The ``use_max_points`` random-point
fallback (``:408-417``) is deferred (needs PRNG state plumbing).
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


def _masked_householder_qr(Pi, n_valid_rows):
    """QR of the zero-row-padded (maxN, pd) polynomial block.

    Zero rows beyond ``n_valid_rows`` never enter the reflections, so Q is
    identity there. Returns (Q (maxN, maxN), R (maxN, pd))."""
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

    A, Q = jax.lax.fori_loop(0, pd, body, (A, Q))
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
    """Scan candidate database rows in insertion order; return Round4State."""
    maxN, n = init_sites.shape
    dtype = init_sites.dtype
    pd = poly_dim(n, poly_deg)
    cap = db_X.shape[0]
    rank_bound = pd  # binomial(n + deg, n) == dim of the poly space

    row_mask = jnp.arange(maxN) < n_init
    d = init_sites[:, None, :] - init_sites[None, :, :]
    Phi = apply_kernel(kernel, jnp.sum(d * d, axis=-1), param)
    mm = row_mask[:, None] & row_mask[None, :]
    Phi = jnp.where(mm, Phi, jnp.eye(maxN, dtype=dtype))
    phi0 = apply_kernel(kernel, jnp.zeros((), dtype), param)

    if pd > 0:
        Pi = jax.vmap(lambda s: poly_basis(s, poly_deg))(init_sites)
        Pi = jnp.where(row_mask[:, None], Pi, 0.0)
        Q, R = _masked_householder_qr(Pi, n_init)
    else:
        Pi = jnp.zeros((maxN, 0), dtype)
        Q = jnp.eye(maxN, dtype=dtype)
        R = jnp.zeros((maxN, 0), dtype)

    st = Round4State(
        sites=init_sites,
        N=jnp.asarray(n_init, jnp.int32),
        Q=Q, R=R,
        Z=jnp.zeros((maxN, maxN), dtype),
        zc=jnp.asarray(0, jnp.int32),
        L=jnp.eye(maxN, dtype=dtype),
        Linv=jnp.eye(maxN, dtype=dtype),
        Phi=Phi,
        accepted=jnp.zeros((cap,), bool),
    )

    scan_cap = cap if max_candidates is None else min(cap, max_candidates)

    def consider(c, st):
        xi = db_X[c]
        valid = cand_mask[c] & (st.N < max_points)
        N = st.N
        idxN = jnp.arange(maxN)
        rmask = idxN < N

        # kernel column against accepted sites
        diff = st.sites - xi[None, :]
        phi_xi = apply_kernel(kernel, jnp.sum(diff * diff, axis=-1), param)
        phi_xi = jnp.where(rmask, phi_xi, 0.0)

        if pd > 0:
            pi_xi = poly_basis(xi, poly_deg)
            # Givens pass: rotate the appended row into R
            # (``nullify_last_row``, ``utilities.jl:437-448``)
            def giv(j, carry):
                R, row, gvec, ghat = carry
                active = j < jnp.minimum(N, pd)
                a = R[j, j]
                b = row[j]
                r = jnp.sqrt(a * a + b * b)
                has = r > 0
                cth = jnp.where(has, a / jnp.where(has, r, 1.0), 1.0)
                sth = jnp.where(has, b / jnp.where(has, r, 1.0), 0.0)
                cth = jnp.where(active, cth, 1.0)
                sth = jnp.where(active, sth, 0.0)
                Rj = R[j]
                R = R.at[j].set(cth * Rj + sth * row)
                row = -sth * Rj + cth * row
                # row `new` of the rotation product: each plane (j, new) is
                # used once, so rows j are still e_j when consumed
                gvec = cth * gvec - sth * (idxN == j).astype(dtype)
                ghat = cth * ghat
                return R, row, gvec, ghat

            gvec0 = jnp.zeros((maxN,), dtype)
            R_rot, row_rot, gvec, ghat = jax.lax.fori_loop(
                0, pd, giv, (st.R, pi_xi, gvec0, jnp.asarray(1.0, dtype)))

            # rank-augmentation test (``RbfModel.jl:433-438``)
            need_rank = N < rank_bound
            rank_ok = jnp.where(
                need_rank,
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
        v = st.Z.T @ (st.Phi @ Qg + phi_xi * ghat)
        v = jnp.where(zmask, v, 0.0)
        sigma = Qg @ (st.Phi @ Qg) + 2.0 * ghat * (phi_xi @ Qg) + ghat ** 2 * phi0
        Lv = jnp.where(zmask, st.Linv @ v, 0.0)
        tau2 = sigma - Lv @ Lv

        accept = valid & rank_ok & (tau2 > chol_pivot ** 2)
        tau = jnp.sqrt(jnp.maximum(tau2, jnp.finfo(dtype).tiny))

        def do_accept(st):
            N = st.N
            slotN = jnp.clip(N, 0, maxN - 1)
            zslot = jnp.clip(st.zc, 0, maxN - 1)
            sites = st.sites.at[slotN].set(xi)

            # Q <- blkdiag(Q, 1) G'  — apply each plane (j, slotN) rotation
            # to the columns; recompute the same c/s sequence
            if pd > 0:
                def givq(j, carry):
                    Q, R, row = carry
                    active = j < jnp.minimum(N, pd)
                    a = R[j, j]
                    b = row[j]
                    r = jnp.sqrt(a * a + b * b)
                    has = r > 0
                    cth = jnp.where(active & has, a / jnp.where(has, r, 1.0), 1.0)
                    sth = jnp.where(active & has, b / jnp.where(has, r, 1.0), 0.0)
                    Rj = R[j]
                    R = R.at[j].set(cth * Rj + sth * row)
                    row = -sth * Rj + cth * row
                    colj = Q[:, j]
                    colN = Q[:, slotN]
                    Q = Q.at[:, j].set(cth * colj + sth * colN)
                    Q = Q.at[:, slotN].set(-sth * colj + cth * colN)
                    return Q, R, row

                Qn, _, _ = jax.lax.fori_loop(
                    0, pd, givq, (st.Q, st.R, poly_basis(xi, poly_deg)))
            else:
                Qn = st.Q

            zcol = Qg.at[slotN].set(ghat)
            Z = st.Z.at[:, zslot].set(zcol)

            L = st.L.at[zslot].set(jnp.where(zmask, Lv, 0.0))
            L = L.at[zslot, zslot].set(tau)
            linv_row = -(st.Linv.T @ Lv) / tau
            Linv = st.Linv.at[zslot].set(jnp.where(zmask, linv_row, 0.0))
            Linv = Linv.at[zslot, zslot].set(1.0 / tau)

            Rn = R_rot.at[slotN].set(row_rot) if pd > 0 else st.R

            Phi = st.Phi.at[slotN, :].set(phi_xi)
            Phi = Phi.at[:, slotN].set(phi_xi)
            Phi = Phi.at[slotN, slotN].set(phi0)

            return Round4State(
                sites=sites, N=N + 1, Q=Qn, R=Rn, Z=Z, zc=st.zc + 1,
                L=L, Linv=Linv, Phi=Phi,
                accepted=st.accepted.at[c].set(True))

        return jax.lax.cond(accept, do_accept, lambda s: s, st)

    return jax.lax.fori_loop(0, scan_cap, consider, st)
