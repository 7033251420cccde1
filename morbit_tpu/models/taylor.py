"""Taylor polynomial surrogates (degree 1/2).

Reference: ``src/models/TaylorModel.jl``. Two construction paths:

* ``mode='callback'`` — gradients/Hessians from user callbacks or autodiff
  (``TaylorCallbackConfig``, ``TaylorModel.jl:293-360``); derivative matrices
  are pulled back to scaled space via the unscaling Jacobian.
* ``mode='fd'`` — finite differences through the evaluation database
  (``TaylorConfig`` with RFD stamps, ``TaylorModel.jl:163-276``). The
  reference builds a recursion tree of stencil leaves
  (``RecursiveFiniteDifferences.jl``); here the same stamp semantics are
  compiled into *flat static coefficient tensors* once at trace time, so the
  fit is two dense contractions (MXU-friendly):

      g  = G_coef @ Y / h          (n, m)
      H  = einsum('ijs,sm->mij', H_coef, Y) / h^2

  Stencil sites are projected into the scaled box like the reference
  (``TaylorModel.jl:190``).

Model: ``m_l(x) = f_l(x0) + g_l' h + 0.5 h' H_l h`` with ``h = x - x0``
(``TaylorModel.jl:372-408``); always fully linear (``TaylorModel.jl:45``).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.core import database as dbm
from morbit_tpu.core import scaling
from morbit_tpu.models.base import ModelContext, SurrogateOps
from morbit_tpu.ops.geometry import project_into_box

# First-order stamps: (grid, coefficients) with derivative ~ sum c_a f(x + h g_a e_i) / h
# (coefficient tables mirror ``RecursiveFiniteDifferences.jl:55-182``:
# CFDStamp(1, acc) / FFDStamp(1, acc) / BFDStamp(1, acc))
STAMPS = {
    "cfd1": (np.array([-1, 0, 1]), np.array([-0.5, 0.0, 0.5])),            # CFD(1,2)
    "cfd1_4": (np.arange(-2, 3),
               np.array([1 / 12, -2 / 3, 0.0, 2 / 3, -1 / 12])),           # CFD(1,4)
    "cfd1_6": (np.arange(-3, 4),
               np.array([-1 / 60, 3 / 20, -3 / 4, 0.0, 3 / 4, -3 / 20, 1 / 60])),  # CFD(1,6)
    "ffd1": (np.array([0, 1]), np.array([-1.0, 1.0])),                     # FFD(1,1)
    "ffd1_2": (np.array([0, 1, 2]), np.array([-1.5, 2.0, -0.5])),          # FFD(1,2)
    "ffd1_3": (np.array([0, 1, 2, 3]),
               np.array([-11 / 6, 3.0, -1.5, 1 / 3])),                     # FFD(1,3)
    "bfd1": (np.array([0, -1]), np.array([1.0, -1.0])),                    # BFD(1,1)
    "bfd1_2": (np.array([0, -1, -2]), np.array([1.5, -2.0, 0.5])),         # BFD(1,2)
    "bfd1_3": (np.array([0, -1, -2, -3]),
               np.array([11 / 6, -3.0, 1.5, -1 / 3])),                     # BFD(1,3)
}


# Direct second-derivative stamps for the Hessian DIAGONAL (an extension
# beyond the reference, whose RecursiveFiniteDifferences constructs only
# order-1 stamps, ``RecursiveFiniteDifferences.jl:73-182``): d2f/dx_i^2 ~
# sum c_a f(x + h g_a e_i) / h^2. Mixed partials keep the first-order
# tensor-product recursion (identical sites either way); the direct
# diagonal uses +-1h instead of the composed +-2h — fewer sites, O(h^2)
# accuracy on a tighter stencil.
STAMPS2 = {
    "cfd2": (np.array([-1, 0, 1]), np.array([1.0, -2.0, 1.0])),           # CFD(2,2)
    "cfd2_4": (np.arange(-2, 3),
               np.array([-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12])),       # CFD(2,4)
}


def _build_stencil(n: int, degree: int, stamp: str, hess_stamp: str = "compose"):
    """Static stencil: unique integer offset rows O (S, n), gradient
    coefficients G (n, S), Hessian coefficients H (n, n, S) (or None).

    Hessian-of-FD recursion: H_ij = sum_a sum_b c_a c_b f(x + h(g_a e_i + g_b e_j));
    with ``hess_stamp`` in :data:`STAMPS2`, the diagonal uses the direct
    second-derivative stamp instead.
    """
    grid, coef = STAMPS[stamp]
    offsets = {}

    def site_id(off):
        key = tuple(off)
        if key not in offsets:
            offsets[key] = len(offsets)
        return offsets[key]

    site_id(tuple([0] * n))  # center first

    G_entries = []  # (i, site, coeff)
    for i in range(n):
        for a, ca in zip(grid, coef):
            if ca == 0.0:
                continue
            off = [0] * n
            off[i] = int(a)
            G_entries.append((i, site_id(off), ca))

    H_entries = []
    if degree >= 2:
        direct = hess_stamp != "compose"
        if direct:
            grid2, coef2 = STAMPS2[hess_stamp]
        for i in range(n):
            for j in range(n):
                if direct and i == j:
                    for a, ca in zip(grid2, coef2):
                        if ca == 0.0:
                            continue
                        off = [0] * n
                        off[i] = int(a)
                        H_entries.append((i, i, site_id(tuple(off)), ca))
                    continue
                for (a, ca), (b, cb) in itertools.product(zip(grid, coef), repeat=2):
                    c = ca * cb
                    if c == 0.0:
                        continue
                    off = [0] * n
                    off[i] += int(a)
                    off[j] += int(b)
                    H_entries.append((i, j, site_id(tuple(off)), c))

    S = len(offsets)
    O = np.zeros((S, n))
    for key, s in offsets.items():
        O[s] = key
    G = np.zeros((n, S))
    for i, s, c in G_entries:
        G[i, s] += c
    H = None
    if degree >= 2:
        H = np.zeros((n, n, S))
        for i, j, s, c in H_entries:
            H[i, j, s] += c
    return O, G, H


class TaylorState(NamedTuple):
    x0: jax.Array       # (n,) scaled expansion point
    fx0: jax.Array      # (m,)
    g: jax.Array        # (m, n) gradients in scaled coords
    H: jax.Array        # (m, n, n) Hessians (zeros when degree 1)
    site_idx: jax.Array  # (S,) int32 db rows of stencil sites (fd mode; else (0,))


class TaylorOps(SurrogateOps):
    def __init__(self, group, n_vars, dtype, ac, scal):
        super().__init__(group, n_vars, dtype, ac, scal)
        cfg = self.cfg
        self.degree = cfg.degree
        if cfg.mode == "fd":
            O, G, H = _build_stencil(n_vars, cfg.degree, cfg.fd_stamp,
                                     getattr(cfg, "hess_stamp", "compose"))
            self.O = O
            self.G = G
            self.Hc = H
            self.n_sites = O.shape[0]
            self.h = cfg.fd_stepsize
            self.eval_window = self.n_sites
        else:
            self.n_sites = 1

    def init_state(self):
        n, m = self.n_vars, self.group.m
        dt = self.dtype
        return TaylorState(
            x0=jnp.full((n,), jnp.nan, dt),
            fx0=jnp.zeros((m,), dt),
            g=jnp.zeros((m, n), dt),
            H=jnp.zeros((m, n, n), dt),
            site_idx=jnp.zeros((self.n_sites,), jnp.int32),
        )

    # -- phase 1 --------------------------------------------------------------
    def prepare(self, state, db, ctx: ModelContext, ensure_fully_linear: bool):
        if self.cfg.mode != "fd":
            return state, db
        x = ctx.x_s
        lb, ub = ctx.scal.lb_scaled, ctx.scal.ub_scaled
        sites = x[None, :] + self.h * jnp.asarray(self.O, self.dtype)
        sites = jax.vmap(lambda s: project_into_box(s, lb, ub))(sites)

        # the reference rebuilds the stencil only when the iterate moved
        # (``TaylorModel.jl:update_model`` checks x != mod.x0)
        moved = ~jnp.all(ctx.x_s == state.x0)

        idx = jnp.zeros((self.n_sites,), jnp.int32)
        idx = idx.at[0].set(ctx.x_index)

        def add_one(i, carry):
            db, idx = carry
            db, new_id = dbm.add_site(db, sites[i], do_add=moved)
            idx = idx.at[i].set(jnp.where(moved, new_id, idx[i]))
            return db, idx

        db, idx = jax.lax.fori_loop(1, self.n_sites, add_one, (db, idx))
        idx = jnp.where(moved, idx, state.site_idx)
        return state._replace(site_idx=idx), db

    # -- phase 2 --------------------------------------------------------------
    def fit(self, state, db, ctx: ModelContext):
        x = ctx.x_s
        moved = ~jnp.all(x == state.x0)
        fx0 = db.Y[ctx.x_index]
        if self.cfg.mode == "fd":
            _, Y = dbm.get_rows(db, state.site_idx)      # (S, m)
            h = jnp.asarray(self.h, self.dtype)
            g = (jnp.asarray(self.G, self.dtype) @ Y / h).T      # (m, n)
            if self.degree >= 2:
                H = jnp.einsum("ijs,sm->mij", jnp.asarray(self.Hc, self.dtype), Y) / h ** 2
            else:
                H = jnp.zeros_like(state.H)
        else:
            xu = scaling.untransform(ctx.scal, x)
            Ju = self.group.jac_unscaled(xu)             # (m, n) wrt unscaled
            inv_s = 1.0 / ctx.scal.scale
            g = Ju * inv_s[None, :]
            if self.degree >= 2:
                Hu = self.group.hess_unscaled(xu)        # (m, n, n)
                H = Hu * inv_s[None, :, None] * inv_s[None, None, :]
            else:
                H = jnp.zeros_like(state.H)

        new = TaylorState(x0=x, fx0=fx0, g=g, H=H, site_idx=state.site_idx)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(moved, a, b), new,
            state._replace(site_idx=new.site_idx))

    # -- evaluation ------------------------------------------------------------
    def eval(self, state, x_s, scal=None):
        h = x_s - state.x0
        out = state.fx0 + state.g @ h
        if self.degree >= 2:
            out = out + 0.5 * jnp.einsum("i,mij,j->m", h, state.H, h)
        return out

    def jac(self, state, x_s, scal=None):
        if self.degree >= 2:
            h = x_s - state.x0
            # 0.5*(H + H') h  (``TaylorModel.jl`` get_gradient)
            return state.g + 0.5 * jnp.einsum(
                "mij,j->mi", state.H + jnp.swapaxes(state.H, 1, 2), h)
        return state.g

    def fully_linear(self, state):
        return jnp.asarray(True)
