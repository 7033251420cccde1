"""RBF surrogate models: training-set selection (Wild's ORBIT rounds) + fit.

Reference: ``src/models/RbfModel.jl`` — the core model family of the package.
The 4-round training-set construction (``RbfModel.jl:518-655``) is re-expressed
with static shapes:

* Round 1 (``:242-248``): affinely-independent database points inside the
  ``theta_1 * Delta`` box — masked greedy QR filter over the whole database
  array.
* Round 2 (``:251-265``): same in the wider ``theta_2 * Delta_max`` box,
  warm-started with round 1's span, skipped under the reference's exact
  condition (``:588``) via masking.
* Round 3 (``:269-307``): sample along the improving directions (reversed
  orthogonal-complement columns); pivot-failing offsets trigger the
  coordinate-axis rebuild (``:633-637``) — both proposals are computed and
  selected with ``where`` instead of the reference's ``@goto`` recursion.
* Round 4 (Cholesky-bounded extra points, ``:352-499``) is the
  ``optimized_sampling`` enrichment — implemented separately in
  :mod:`morbit_tpu.models.rbf_round4`.

Model improvement steps (``:699-732``) consume one stored improving
direction per call. Fitting replaces ``RBF.RBFInterpolationModel``
(``:759-767``) with the masked batched KKT solve in
:mod:`morbit_tpu.ops.rbf`.
"""

from __future__ import annotations

import dataclasses
import math
import os

import jax
import jax.numpy as jnp

from morbit_tpu.core import database as dbm
from morbit_tpu.models.base import ModelContext, SurrogateOps
#: PROFILING ONLY (chunked-pricing headroom bound, round-5 roadmap
#: item 2): clamp the capacity-sized selection/round-4 scans to the
#: first N db rows. Results are WRONG when the db fills past N —
#: never set outside profiling runs.
_SEL_CLAMP = int(os.environ.get("MORBIT_SEL_CLAMP", "0"))

from morbit_tpu.ops.affine import (
    affinely_independent_points,
    improving_directions_from,
)
from morbit_tpu.ops.geometry import intersect_box, local_bounds
from morbit_tpu.ops.rbf import (
    RbfFit,
    eval_rbf,
    fit_rbf,
    kernel_default_param,
    poly_dim,
    rbf_jacobian,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RbfState:
    """RBF model state.

    Int bookkeeping is PACKED into one ``meta`` vector (TPU perf: every
    while-loop-carried buffer pays a fixed alternate-memory copy stall —
    tools/profile_trace.py); layout ``[idx (cap_train,) | n_train |
    fully_linear | dirs_head | dirs_count]``. Named views + ``_replace``
    keep the logical field API."""

    meta: jax.Array   # (cap_train + 4,) int32
    dirs: jax.Array   # (n, n) improving directions (rows, consumption order)
    fit: RbfFit | None
    cap_train: int

    _INT_COLS = {"n_train": 0, "fully_linear": 1, "dirs_head": 2,
                 "dirs_count": 3}

    def tree_flatten(self):
        return (self.meta, self.dirs, self.fit), (self.cap_train,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])

    @property
    def idx(self):
        return self.meta[..., : self.cap_train]

    @property
    def n_train(self):
        return self.meta[..., self.cap_train + 0]

    @property
    def fully_linear(self):
        return self.meta[..., self.cap_train + 1] > 0

    @property
    def dirs_head(self):
        return self.meta[..., self.cap_train + 2]

    @property
    def dirs_count(self):
        return self.meta[..., self.cap_train + 3]

    def _replace(self, **kw):
        meta = kw.pop("meta", self.meta)
        if "idx" in kw:
            meta = meta.at[..., : self.cap_train].set(
                jnp.asarray(kw.pop("idx"), jnp.int32))
        for name, col in self._INT_COLS.items():
            if name in kw:
                meta = meta.at[..., self.cap_train + col].set(
                    jnp.asarray(kw.pop(name), jnp.int32))
        return dataclasses.replace(self, meta=meta, **kw)


def _masked_append(buf, count, src, src_count):
    """Place ``src[:src_count]`` at ``buf[count:count+src_count]`` (static caps).

    Gather formulation (slot j reads ``src[j - count]``): batched scatters
    lower to slow fusions on TPU, broadcast-select is ~free at these sizes."""
    slots = jnp.arange(buf.shape[0])
    k = slots - count
    take = (k >= 0) & (k < src_count)
    sel = take[:, None] & (k[:, None] == jnp.arange(src.shape[0])[None, :])
    vals = jnp.sum(jnp.where(sel, src[None, :], 0), axis=1).astype(buf.dtype)
    return jnp.where(take, vals, buf), count + src_count


def rbf_selection_core(X, count, x_s, x_index, delta, lb_s, ub_s, max_new, *,
                       n, theta_e1, theta_e2_dmax, theta_pivot,
                       delta_max, skip2_same_theta, ensure_fully_linear):
    """Rounds 1-3 training-set SELECTION (pure, single-lane).

    The data-flow-heavy part of :meth:`RbfOps.prepare` — everything except
    database writes, index assembly, and round 4 — extracted so the batched
    path can run it as ONE fused Pallas kernel over lane tiles (the ~50
    sequential micro-kernels this lowers to under plain vmap are
    launch-latency-bound: ~2.9 ms/pass at B=1024 on v5e,
    tools/profile_pass.py). Both the plain-XLA and the Pallas path execute
    THIS function, so there is no duplicate logic to drift.

    Returns (r1_idx, r1_cnt, r2_idx, r2_cnt, sites3, active3, n_new, dirs,
    dirs_count, fully_linear).

    ``ensure_fully_linear`` may be a static bool (two compiled variants,
    round 2 / the coordinate rebuild skipped structurally) or a TRACED
    bool scalar: the unified variant computes round 2 and both round-3
    proposals and masks per the flag — output values are bit-identical to
    the matching static variant (every select picks the exact value the
    static structure would have computed), which lets the solver pass the
    criticality-rebuild flag per lane per trip (the criticality
    micro-step restructure, ``algorithm.jl:523-613``)."""
    dt = X.dtype
    cap = X.shape[0]
    delta_1 = jnp.asarray(theta_e1, dt) * delta
    lb1 = jnp.maximum(lb_s, x_s - delta_1)
    ub1 = jnp.minimum(ub_s, x_s + delta_1)
    piv1 = jnp.asarray(theta_pivot, dt) * delta_1

    rows = jnp.arange(cap)
    valid = rows < count
    in1 = jnp.all((X >= lb1[None, :]) & (X <= ub1[None, :]), axis=1)
    cand1 = valid & in1 & (rows != x_index)

    # ---- round 1
    sel1 = affinely_independent_points(x_s, X, cand1, piv1, n)
    dirs, dirs_count = improving_directions_from(sel1.Z, sel1.k)
    r1_idx, r1_cnt = sel1.order, sel1.n_picked
    n_missing1 = n - r1_cnt

    efl_static = isinstance(ensure_fully_linear, (bool, int))
    # ---- round 2 (skipped statically under ensure_fully_linear, ``:588``;
    # computed-and-masked when the flag is traced)
    if efl_static and ensure_fully_linear:
        r2_cnt = jnp.asarray(0, jnp.int32)
        r2_idx = -jnp.ones((n,), jnp.int32)
        fl_after2 = jnp.asarray(True)
    else:
        delta_2 = jnp.asarray(theta_e2_dmax, dt)
        lb2 = jnp.maximum(lb_s, x_s - delta_2)
        ub2 = jnp.minimum(ub_s, x_s + delta_2)
        in2 = jnp.all((X >= lb2[None, :]) & (X <= ub2[None, :]), axis=1)
        cand2 = valid & in2 & (rows != x_index) & (~cand1)
        sel2 = affinely_independent_points(
            x_s, X, cand2, piv1, n_missing1, Y_init=sel1.Y, k_init=sel1.k)
        skip2 = n_missing1 == 0
        if skip2_same_theta:
            skip2 = skip2 | jnp.isclose(delta, jnp.asarray(delta_max, dt))
        r2_cnt = jnp.where(skip2, 0, sel2.n_picked)
        r2_idx = sel2.order
        fl_after2 = skip2
        if not efl_static:
            efl = ensure_fully_linear
            r2_cnt = jnp.where(efl, 0, r2_cnt)
            r2_idx = jnp.where(efl, -jnp.ones((n,), jnp.int32), r2_idx)
            fl_after2 = efl | fl_after2
    n_missing2 = n_missing1 - r2_cnt

    def round3_proposal(dirs_, dirs_count_, n_missing_, max_new_):
        n_new_ = jnp.clip(n_missing_, 0, jnp.maximum(max_new_, 0))

        def per_slot(d):
            # vmapped over the direction ROWS (no traced-index gather —
            # Pallas-lowerable; slot i maps to row i exactly as before)
            ln = intersect_box(x_s, d, lb1, ub1, ret_mode="absmax")
            offset = ln * d
            ok = jnp.max(jnp.abs(offset)) > piv1
            return x_s + offset, ok

        sites, ok = jax.vmap(per_slot)(dirs_)
        active = jnp.arange(n) < n_new_
        any_fail = jnp.any(active & (~ok))
        covers = n_new_ >= n_missing_
        return sites, active, ok, any_fail, covers, n_new_

    # ---- round 3 normal proposal
    (s3, act3, ok3, fail3, covers3, n_new3) = round3_proposal(
        dirs, dirs_count, n_missing2, max_new)

    if (not efl_static) or ensure_fully_linear:
        # coordinate-axis rebuild proposal (``:564-570`` + recursion ``:633``)
        from morbit_tpu.ops.affine import _eye
        dirs_cb = _eye(n, dt)
        (s3c, act3c, ok3c, _, covers3c, n_new3c) = round3_proposal(
            dirs_cb, jnp.asarray(n, jnp.int32), jnp.asarray(n, jnp.int32),
            max_new)

        rebuild = (fail3 if efl_static else (ensure_fully_linear & fail3))
        pick = lambda a, b: jnp.where(rebuild, a, b)
        # boolean selects via algebra, not where-on-bools (Mosaic cannot
        # select i1 vectors in the fused Pallas prepare kernel)
        bpick = lambda a, b: (rebuild & a) | ((~rebuild) & b)
        r1_cnt = pick(0, r1_cnt)
        r2_cnt = pick(0, r2_cnt)
        sites3 = jnp.where(rebuild, s3c, s3)
        active3 = bpick(act3c, act3)
        ok3 = bpick(ok3c, ok3)
        n_new = pick(n_new3c, n_new3)
        dirs = pick(dirs_cb, dirs)
        dirs_count = pick(n, dirs_count)
        round3_ran = rebuild | (n_missing2 > 0)
        fl3 = bpick(covers3c, covers3) & jnp.all(ok3 | (~active3))
    else:
        sites3, active3, n_new = s3, act3, n_new3
        round3_ran = n_missing2 > 0
        fl3 = covers3 & jnp.all(ok3 | (~act3))
    fully_linear = ((round3_ran & fl3 & (r2_cnt == 0))
                    | ((~round3_ran) & fl_after2))

    return (r1_idx, r1_cnt.astype(jnp.int32), r2_idx,
            jnp.asarray(r2_cnt, jnp.int32), sites3, active3,
            jnp.asarray(n_new, jnp.int32), dirs,
            jnp.asarray(dirs_count, jnp.int32), fully_linear)


class RbfOps(SurrogateOps):
    def __init__(self, group, n_vars, dtype, ac, scal):
        super().__init__(group, n_vars, dtype, ac, scal)
        cfg = self.cfg
        self.max_points = cfg.resolved_max_points(n_vars)
        # training-buffer capacity: rounds 1-4 fill at most
        # ``max(max_points, n+1)`` rows, and up to ``n`` improvement steps
        # (one per remaining improving direction, ``RbfModel.jl:699-732``)
        # may APPEND before the next prepare resets the set — the reference
        # has no cap there, and a buffer sized to max_points alone made the
        # improve insert silently OVERWRITE the last training row once full
        # (round-4 full-oracle finding: divergence on the first
        # MODELIMPROVING iteration with max_model_points = n+1)
        self.cap_train = max(self.max_points, n_vars + 1) + n_vars
        self.train_stamp_len = self.cap_train + 1
        self.eval_window = n_vars + 1 + (
            10 * self.max_points if cfg.use_max_points else 0)
        self.kernel = cfg.kernel
        self.poly_deg = cfg.polynomial_degree
        sp = cfg.shape_parameter
        if callable(sp):
            self._param_fn = sp
            self._static_param = None
        elif isinstance(sp, float) and math.isnan(sp):
            self._param_fn = None
            self._static_param = kernel_default_param(cfg.kernel)
        else:
            self._param_fn = None
            self._static_param = sp
        #: batched rounds-1-3 selection as one fused Pallas kernel (f32 TPU
        #: multistart path); plain vmap of the same core otherwise
        self._selection = {}
        if cfg.optimized_sampling:
            from morbit_tpu.ops.prepare_fused import make_batched_selection

            # static False/True variants (initialize, golden paths) plus the
            # traced-flag variant for the solver's per-trip merged update
            # (criticality micro-steps pass the rebuild flag per lane)
            for efl in (False, True, "traced"):
                self._selection[efl] = make_batched_selection(
                    n_vars, dtype, ac, cfg, efl)

    def _resolve_param(self, delta):
        """Shape parameter, possibly Delta-dependent (``RbfModel.jl:665-690``)."""
        if self._param_fn is not None:
            return self._param_fn(delta)
        return self._static_param

    def _round4_callable(self, scan_cap):
        """Routed round-4 acceptance (cached per candidate width)."""
        key = ("r4", scan_cap)
        fn = self._selection.get(key)
        if fn is None:
            from morbit_tpu.ops.prepare_fused import make_batched_round4

            static_param = (self._static_param
                            if self.kernel in ("cubic", "thin_plate_spline")
                            else None)
            fn = make_batched_round4(
                n_vars=self.n_vars, C=scan_cap, dtype=self.dtype,
                kernel=self.kernel, static_param=static_param,
                poly_deg=self.poly_deg, max_points=self.max_points,
                # run_round4 takes chol_pivot = theta^2 and tests
                # tau2 > chol_pivot**2 (rbf_round4.py:98)
                chol_pivot=self.cfg.theta_pivot_cholesky ** 2,
            )
            self._selection[key] = fn
        return fn

    def init_state(self):
        n, m = self.n_vars, self.group.m
        dt = self.dtype
        pd = poly_dim(n, self.poly_deg)
        cap = self.cap_train
        return RbfState(
            meta=jnp.zeros((cap + 4,), jnp.int32),
            dirs=jnp.zeros((n, n), dt),
            fit=RbfFit(
                fdata=jnp.zeros((cap, n + m + 1), dt),
                flam=jnp.zeros((pd + 1, m), dt),
                n=n, m=m,
            ),
            cap_train=cap,
        )

    # ------------------------------------------------------------------ phase 1
    def _round3_proposal(self, x, dirs, dirs_count, n_missing, max_new, lb1, ub1, piv1):
        """Per-slot round-3 sites along improving directions (``:269-307``)."""
        n = self.n_vars
        n_new = jnp.clip(n_missing, 0, jnp.maximum(max_new, 0))

        def per_slot(i):
            d = dirs[jnp.clip(i, 0, n - 1)]
            ln = intersect_box(x, d, lb1, ub1, ret_mode="absmax")
            offset = ln * d
            ok = jnp.max(jnp.abs(offset)) > piv1
            return x + offset, ok

        sites, ok = jax.vmap(per_slot)(jnp.arange(n))
        active = jnp.arange(n) < n_new
        any_fail = jnp.any(active & (~ok))
        covers = n_new >= n_missing
        return sites, active, ok, any_fail, covers, n_new

    def prepare_with_reuse(self, state, db, ctx: ModelContext,
                           other_state, other_db):
        """Transfer the geometry-only rounds 1-3 point set from another RBF
        group with the same signature (``_exploit_other_rbf_metas!``,
        ``RbfModel.jl:311-342``), then run round 4 on our own database.

        Rounds 1-3 depend only on (theta_pivot, theta_enlarge_1/2,
        optimized_sampling) — the signature — so the other group's training
        sites are valid here. Each transferred site is located in (or added
        to) this group's database by exact site match."""
        cfg = self.cfg
        cap = db.X.shape[0]

        idx = jnp.zeros((self.cap_train,), jnp.int32)
        idx = idx.at[0].set(ctx.x_index)

        # transfer only the rounds-1-3 part (<= n+1 sites); round 4 points
        # are kernel-dependent and recomputed below
        n_13 = jnp.minimum(other_state.n_train, self.n_vars + 1)

        def transfer(i, carry):
            db, idx = carry
            do = (i < n_13) & (i >= 1)
            site = other_db.X[jnp.clip(other_state.idx[i], 0, cap - 1)]
            # exact-match lookup in our own db (``ensure_contains_res_with_site!``)
            hits = jnp.all(db.X == site[None, :], axis=1) & dbm.valid_mask(db)
            found = jnp.any(hits)
            found_id = jnp.argmax(hits).astype(jnp.int32)
            db, new_id = dbm.add_site(db, site, do_add=do & (~found))
            use_id = jnp.where(found, found_id, new_id)
            idx = idx.at[jnp.clip(i, 0, self.cap_train - 1)].set(
                jnp.where(do, use_id, idx[jnp.clip(i, 0, self.cap_train - 1)]))
            return db, idx

        db, idx = jax.lax.fori_loop(1, self.n_vars + 1, transfer, (db, idx),
                                    unroll=True)
        count = n_13

        state = state._replace(
            idx=idx, n_train=count,
            fully_linear=other_state.fully_linear,
            dirs=other_state.dirs,
            dirs_head=other_state.dirs_head,
            dirs_count=other_state.dirs_count,
        )

        if cfg.optimized_sampling and self.max_points > self.n_vars + 1:
            x = ctx.x_s
            dt = self.dtype
            delta_2 = jnp.asarray(cfg.theta_enlarge_2 * self.ac.delta_max, dt)
            lb2, ub2 = local_bounds(x, delta_2, ctx.scal.lb_scaled,
                                    ctx.scal.ub_scaled)
            db, idx, count = self._round4(db, state.idx, state.n_train, lb2, ub2, ctx)
            state = state._replace(idx=idx, n_train=count)
        return state, db

    def prepare(self, state, db, ctx: ModelContext, ensure_fully_linear: bool):
        cfg = self.cfg
        n = self.n_vars
        dt = self.dtype
        x = ctx.x_s
        delta = ctx.delta

        delta_1 = jnp.asarray(cfg.theta_enlarge_1, dt) * delta
        lb1, ub1 = local_bounds(x, delta_1, ctx.scal.lb_scaled, ctx.scal.ub_scaled)
        piv1 = jnp.asarray(cfg.theta_pivot, dt) * delta_1
        delta_2 = jnp.asarray(cfg.theta_enlarge_2 * self.ac.delta_max, dt)
        lb2, ub2 = local_bounds(x, delta_2, ctx.scal.lb_scaled, ctx.scal.ub_scaled)

        num_unevaluated = jnp.sum(dbm.valid_mask(db) & (~db.evaluated)).astype(jnp.int32)
        budget = min(self.ac.max_evals, self.group.max_evals)
        max_new = jnp.asarray(budget, jnp.int32) - 1 - ctx.n_evals - num_unevaluated

        if cfg.optimized_sampling:
            # rounds 1-3 selection — one fused call (Pallas-tiled when the
            # solve is vmapped on the f32 TPU path; plain XLA otherwise)
            if isinstance(ensure_fully_linear, (bool, int)):
                sel_fn = self._selection[bool(ensure_fully_linear)]
                sel_args = ()
            else:  # traced per-trip flag (criticality micro-step rebuild)
                sel_fn = self._selection["traced"]
                sel_args = (ensure_fully_linear,)
            X_sel, cnt_sel = db.X, db.count
            if _SEL_CLAMP:  # PROFILING ONLY: chunked-pricing headroom bound
                X_sel = db.X[:_SEL_CLAMP]
                cnt_sel = jnp.minimum(db.count, _SEL_CLAMP)
            (r1_idx, r1_cnt, r2_idx, r2_cnt, sites3, active3, n_new, dirs,
             dirs_count, fully_linear) = sel_fn(
                X_sel, cnt_sel, x, ctx.x_index, delta,
                ctx.scal.lb_scaled, ctx.scal.ub_scaled, max_new, *sel_args)
        else:
            # non-optimized sampling: always rebuild along coordinate axes
            # (``RbfModel.jl:564-570``; round 2 skipped, round 4 skipped)
            r1_idx = -jnp.ones((n,), jnp.int32)
            r1_cnt = jnp.asarray(0, jnp.int32)
            r2_idx = -jnp.ones((n,), jnp.int32)
            r2_cnt = jnp.asarray(0, jnp.int32)
            dirs = jnp.eye(n, dtype=dt)
            dirs_count = jnp.asarray(n, jnp.int32)
            (sites3, active3, ok3, _, covers3, n_new) = self._round3_proposal(
                x, dirs, dirs_count, jnp.asarray(n, jnp.int32), max_new,
                lb1, ub1, piv1)
            fully_linear = covers3 & jnp.all(ok3 | (~active3))

        # ---- add round-3 sites to the database (masked)
        r3_idx = -jnp.ones((n,), jnp.int32)

        def add_one(i, carry):
            db, r3_idx = carry
            db, new_id = dbm.add_site(db, sites3[i], do_add=active3[i])
            return db, r3_idx.at[i].set(new_id)

        db, r3_idx = jax.lax.fori_loop(0, n, add_one, (db, r3_idx),
                                       unroll=True)

        # ---- assemble training indices: [center; r1; r2; r3]
        idx = jnp.zeros((self.cap_train,), jnp.int32)
        idx = idx.at[0].set(ctx.x_index)
        count = jnp.asarray(1, jnp.int32)
        idx, count = _masked_append(idx, count, r1_idx, r1_cnt)
        idx, count = _masked_append(idx, count, r2_idx, r2_cnt)
        idx, count = _masked_append(idx, count, r3_idx, n_new)

        # ---- round 4: Cholesky-bounded extra points (``:641-652``)
        if cfg.optimized_sampling and self.max_points > n + 1:
            db, idx, count = self._round4(db, idx, count, lb2, ub2, ctx)

        state = state._replace(
            idx=idx,
            n_train=count,
            fully_linear=fully_linear,
            dirs=dirs,
            dirs_head=n_new.astype(jnp.int32),
            dirs_count=dirs_count.astype(jnp.int32),
        )
        return state, db

    def _round4(self, db, idx, count, lb2, ub2, ctx):
        """Accept extra in-box database points while the Cholesky factor of
        ``Z' Phi Z`` stays bounded (``_rbf_round4``, ``RbfModel.jl:352-499``)."""
        cap = db.X.shape[0]
        if _SEL_CLAMP:  # PROFILING ONLY: chunked-pricing headroom bound
            cap = min(cap, _SEL_CLAMP)
            db_v = dataclasses.replace(
                db, data=db.data[:cap], count=jnp.minimum(db.count, cap))
            in_box = dbm.results_in_box(db_v, lb2, ub2)
            in_box = jnp.zeros((db.X.shape[0],), bool).at[:cap].set(in_box)
            cap = db.X.shape[0]
        else:
            in_box = dbm.results_in_box(db, lb2, ub2)
        in_training = jnp.any(
            (jnp.arange(cap)[:, None] == idx[None, :])
            & (jnp.arange(self.cap_train)[None, :] < count), axis=1)
        cand = in_box & (~in_training)

        # use_max_points: append random in-box candidates after the database
        # rows (``RbfModel.jl:408-417``: tried only once the db is exhausted,
        # which candidate ordering preserves; max_tries = 10*max_points)
        n_rand = 10 * self.max_points if self.cfg.use_max_points else 0
        X_all = db.X
        cand_all = cand
        if n_rand:
            u = jax.random.uniform(ctx.key, (n_rand, self.n_vars),
                                   dtype=self.dtype)
            rand_pts = lb2[None, :] + (ub2 - lb2)[None, :] * u
            X_all = jnp.concatenate([db.X, rand_pts], axis=0)
            cand_all = jnp.concatenate([cand, jnp.ones((n_rand,), bool)])

        # Pass the FULL cap_train buffer as the round-4 init sites. Round 5
        # re-measured the round-4 ``idx[:r4_cap]`` slice with an interleaved
        # same-session bisect (tools/ab_tips.py, 3 repeats x 3 invocations
        # per variant) and the slice WAS the r3->r4 headline regression:
        # full buffer 73.4-74.0k runs/s vs sliced 59-61k at the bench
        # config, 9.5k vs 8.9k at the ref budget. The round-4 session
        # measurement that motivated it (46.6k vs 63.0k) was a session
        # artifact (that day's tunnel swung 58.3->48.1k on identical runs —
        # f8815a4's own commit message). Rows past ``count`` are masked by
        # the kernel, so buffer width only sets state size — results are
        # bit-identical either way (golden + oracle locks).
        init_sites, _ = dbm.get_rows(db, idx)
        param = self._resolve_param(ctx.delta)
        # scan only the first max_candidates rows (matching run_round4's
        # ``max_candidates`` bound) and route through the fused-kernel
        # primitive: plain run_round4 single-lane / f64, one lane-batched
        # Pallas kernel for vmapped f32 TPU solves (ops/round4_lane.py)
        scan_cap = min(X_all.shape[0],
                       min(cap, 10 * self.max_points) + n_rand)
        r4 = self._round4_callable(scan_cap)
        accepted_scan, _ = r4(X_all[:scan_cap], cand_all[:scan_cap],
                              init_sites, count,
                              jnp.asarray(param, self.dtype))
        accepted = jnp.zeros((X_all.shape[0],), bool
                             ).at[:scan_cap].set(accepted_scan)
        # append accepted db rows in database (insertion) order — gather
        # formulation: slot j takes the row whose acceptance rank lands on j
        # (a scatter here lowered to a ~0.8 ms batched fusion on v5e;
        # broadcast+argmax is ~free)
        acc_db = accepted[:cap]
        pos = count + jnp.cumsum(acc_db.astype(jnp.int32)) - 1
        slots = jnp.arange(self.cap_train, dtype=jnp.int32)
        match = acc_db[None, :] & (pos[None, :] == slots[:, None])  # (cap_train, cap)
        row_for_slot = jnp.argmax(match, axis=1).astype(jnp.int32)
        idx = jnp.where(jnp.any(match, axis=1), row_for_slot, idx)
        count = count + jnp.sum(acc_db).astype(jnp.int32)
        # accepted random points become new unevaluated database sites
        if n_rand:
            acc_r = accepted[cap:]

            def add_rand(i, carry):
                db, idx, count = carry
                do = acc_r[i]
                db, new_id = dbm.add_site(db, X_all[cap + i], do_add=do)
                # one-hot select at the traced per-lane slot (scatter
                # serializes as a lane loop under vmap — dbm._onehot_write)
                hit = do & (jnp.arange(self.cap_train)
                            == jnp.clip(count, 0, self.cap_train - 1))
                idx = jnp.where(hit, new_id, idx)
                count = jnp.where(do, count + 1, count)
                return db, idx, count

            db, idx, count = jax.lax.fori_loop(
                0, n_rand, add_rand, (db, idx, count))
        return db, idx, count

    # ------------------------------------------------------------------ improve
    def prepare_improve(self, state, db, ctx: ModelContext):
        """One new site along the next improving direction (``:699-732``).

        The direction is consumed even when the pivot test fails, matching
        the reference's ``popfirst!`` before the test."""
        cfg = self.cfg
        dt = self.dtype
        x = ctx.x_s
        do = (~state.fully_linear) & (state.dirs_head < state.dirs_count)

        delta_1 = jnp.asarray(cfg.theta_enlarge_1, dt) * ctx.delta
        lb1, ub1 = local_bounds(x, delta_1, ctx.scal.lb_scaled, ctx.scal.ub_scaled)
        piv1 = jnp.asarray(cfg.theta_pivot, dt) * delta_1

        d = state.dirs[jnp.clip(state.dirs_head, 0, self.n_vars - 1)]
        ln = intersect_box(x, d, lb1, ub1, ret_mode="absmax")
        offset = ln * d
        success = do & (jnp.max(jnp.abs(offset)) > piv1)

        db, new_id = dbm.add_site(db, x + offset, do_add=success)
        hit = success & (jnp.arange(self.cap_train)
                         == jnp.clip(state.n_train, 0, self.cap_train - 1))
        idx = jnp.where(hit, new_id, state.idx)
        n_train = jnp.where(success, state.n_train + 1, state.n_train)
        head = jnp.where(do, state.dirs_head + 1, state.dirs_head)
        fl = jnp.where(success & (head >= state.dirs_count), True, state.fully_linear)
        return state._replace(idx=idx, n_train=n_train, dirs_head=head,
                              fully_linear=fl), db

    # ------------------------------------------------------------------ phase 2
    def fit(self, state, db, ctx: ModelContext):
        mask = jnp.arange(self.cap_train) < state.n_train
        sites, values = dbm.get_rows(db, state.idx)
        param = self._resolve_param(ctx.delta)
        # singular/degenerate KKT systems (fewer valid points than the poly
        # tail needs) are covered by fit_rbf's internal residual-checked
        # ridge fallback — no second fit here (it doubled the batched KKT
        # solve cost on the criticality-loop hot path)
        fit = fit_rbf(sites, values, mask, kernel=self.kernel, param=param,
                      poly_deg=self.poly_deg)
        return state._replace(fit=fit)

    # ------------------------------------------------------------------ eval
    def _eval_param(self, state):
        if self.kernel in ("cubic", "thin_plate_spline"):
            return self._static_param
        return state.fit.param

    def eval(self, state, x_s, scal=None):
        return eval_rbf(state.fit, x_s, self.kernel, self.poly_deg,
                        param=self._eval_param(state))

    def jac(self, state, x_s, scal=None):
        return rbf_jacobian(state.fit, x_s, self.kernel, self.poly_deg,
                            param=self._eval_param(state))

    def fully_linear(self, state):
        return state.fully_linear

    def set_fully_linear(self, state, val):
        return state._replace(fully_linear=jnp.asarray(val))

    def train_stamp(self, state):
        """``[n_train, idx...]`` — which db rows built this model
        (``RbfModel.jl:162-175`` meta content)."""
        return jnp.concatenate([
            jnp.asarray(state.n_train, jnp.int32)[None],
            jnp.asarray(state.idx, jnp.int32),
        ])

    # ---- criticality-loop carry splitting: ``fit`` is a pure function of
    # (idx, n_train, db, ctx), so the 5 RbfFit buffers (sites/mask/w/lam/
    # param) stay out of the while-loop carry (``None`` is an empty pytree
    # subtree — the carried structure simply lacks those leaves)
    def split_fit(self, state):
        return state._replace(fit=None), state.fit

    def with_placeholder_fit(self, meta):
        return meta._replace(fit=self.init_state().fit)

    def attach_fit(self, meta, fitted):
        return meta._replace(fit=fitted)
