"""Surrogate container: grouped vector models + role-indexed evaluation.

Reference: ``src/SurrogateContainer.jl``. Holds one surrogate per group and
maps group outputs into objective / nl-constraint vectors; orchestrates the
2-phase init/update/improve across groups (``SurrogateContainer.jl:272-296,
334-391``) with the batched ``eval_missing`` step in between.

Evaluation-count bookkeeping lives here: each group carries an ``n_evals``
counter (the ``CountedFunc`` analogue, ``src/globals.jl:74-112``); exact-model
groups also count on *model* evaluation, because their model is the counted
true function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from morbit_tpu.core import database as dbm
from morbit_tpu.core import scaling
from morbit_tpu.core.mop import NL_EQ, NL_INEQ, OBJECTIVE, CompiledMOP
from morbit_tpu.models.base import ModelContext
from morbit_tpu.models.configs import (
    ExactConfig,
    LagrangeConfig,
    RbfConfig,
    TaylorConfig,
)


class GroupState(NamedTuple):
    db: dbm.Database
    model: object        # model-family-specific pytree
    n_evals: jax.Array   # int32


def make_ops(group, n_vars, dtype, ac, scal):
    from morbit_tpu.models.exact import ExactOps
    from morbit_tpu.models.rbf_model import RbfOps
    from morbit_tpu.models.taylor import TaylorOps
    from morbit_tpu.models.lagrange import LagrangeOps

    cfg = group.cfg
    if isinstance(cfg, ExactConfig):
        return ExactOps(group, n_vars, dtype, ac, scal)
    if isinstance(cfg, RbfConfig):
        return RbfOps(group, n_vars, dtype, ac, scal)
    if isinstance(cfg, TaylorConfig):
        return TaylorOps(group, n_vars, dtype, ac, scal)
    if isinstance(cfg, LagrangeConfig):
        return LagrangeOps(group, n_vars, dtype, ac, scal)
    raise TypeError(f"unknown surrogate config {type(cfg)}")


class SurrogateContainer:
    """Static container built once at compile time."""

    def __init__(self, mop: CompiledMOP, dtype, ac, scal, db_capacity: int,
                 log_level: int = 0):
        self.mop = mop
        self.dtype = dtype
        self.ac = ac
        self.scal = scal
        self.db_capacity = db_capacity
        #: >= 5 prints model-build internals from inside the jitted loop
        #: (the loglevel3/4-grade messages of ``RbfModel.jl`` round logging)
        self.log_level = log_level
        self.ops = tuple(
            make_ops(g, mop.n_vars, dtype, ac, scal) for g in mop.groups
        )
        # cross-group RBF meta reuse: an RBF group inherits the rounds-1-3
        # point set of an earlier RBF group with equal geometry signature
        # (``_exploit_other_rbf_metas!``, ``RbfModel.jl:311-342``)
        self.reuse_from = []
        for i, g in enumerate(mop.groups):
            src = None
            if isinstance(g.cfg, RbfConfig):
                for j in range(i):
                    cj = mop.groups[j].cfg
                    if isinstance(cj, RbfConfig) and cj.signature() == g.cfg.signature():
                        src = j
                        break
            self.reuse_from.append(src)

    # ------------------------------------------------------------- state init
    def init_group_states(self):
        states = []
        for g in self.mop.groups:
            db = dbm.init_database(self.db_capacity, self.mop.n_vars, g.m, self.dtype)
            states.append(GroupState(db=db, model=self.ops[g.index].init_state(),
                                     n_evals=jnp.asarray(0, jnp.int32)))
        return tuple(states)

    # --------------------------------------------------------- true evaluation
    def evaluate_true(self, states, x_s, scal=None):
        """Evaluate all groups' true functions at one scaled site, insert the
        results into each group database, and bump the counters — the
        ``evaluate_at_unscaled_site`` + ``put_eval_result_into_db!`` pair
        (``algorithm.jl:760-764``).

        Returns (fx, c_e, c_i, new_states, x_indices)."""
        scal = scal if scal is not None else self.scal
        x = scaling.untransform(scal, x_s)
        group_vals = []
        new_states = []
        x_indices = []
        for g, st in zip(self.mop.groups, states):
            vals = g.eval_unscaled(x)
            db, idx = dbm.add_evaluated(st.db, x_s, vals)
            group_vals.append(vals)
            x_indices.append(idx)
            new_states.append(st._replace(db=db, n_evals=st.n_evals + 1))
        fx, c_e, c_i = self.mop.scatter_role_vectors(group_vals, self.dtype, x)
        return fx, c_e, c_i, tuple(new_states), jnp.stack(x_indices)

    def ensure_evaluated(self, states, x_s, scal=None):
        """Like :meth:`evaluate_true`, but reuse an existing database row with
        the same site instead of re-evaluating (``ensure_contains_values!``,
        used when recycling a populated database; ``algorithm.jl:289-295``)."""
        from morbit_tpu.core import scaling as _sc

        scal = scal if scal is not None else self.scal
        x = _sc.untransform(scal, x_s)
        group_vals = []
        new_states = []
        x_indices = []
        for g, st in zip(self.mop.groups, states):
            db = st.db
            hits = (jnp.all(db.X == x_s[None, :], axis=1)
                    & dbm.valid_mask(db) & db.evaluated)
            found = jnp.any(hits)
            found_id = jnp.argmax(hits).astype(jnp.int32)
            vals_new = g.eval_unscaled(x)
            vals = jnp.where(found, db.Y[found_id], vals_new)
            db, add_id = dbm.add_evaluated(db, x_s, vals, do_add=~found)
            idx = jnp.where(found, found_id, add_id)
            n_evals = st.n_evals + jnp.where(found, 0, 1)
            group_vals.append(vals)
            x_indices.append(idx)
            new_states.append(st._replace(db=db, n_evals=n_evals))
        fx, c_e, c_i = self.mop.scatter_role_vectors(group_vals, self.dtype, x)
        return fx, c_e, c_i, tuple(new_states), jnp.stack(x_indices)

    # ------------------------------------------------------------ model update
    def _contexts(self, states, x_s, x_indices, delta, scal, key=None):
        scal = scal if scal is not None else self.scal
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, len(states))
        return [
            ModelContext(x_s=x_s, x_index=x_indices[i], delta=delta,
                         n_evals=states[i].n_evals, scal=scal, key=keys[i])
            for i in range(len(states))
        ]

    def update(self, states, x_s, x_indices, delta, ensure_fully_linear: bool,
               scal=None, key=None):
        """``update_surrogates!`` (``SurrogateContainer.jl:334-391``):
        prepare all groups, batch-evaluate missing sites, fit."""
        ctxs = self._contexts(states, x_s, x_indices, delta, scal, key)
        return self._two_phase(states, ctxs, ensure_fully_linear, improve=False)

    def improve(self, states, x_s, x_indices, delta, scal=None, key=None):
        """``improve_surrogates!`` — one improvement step per non-fully-linear
        group, then re-fit."""
        ctxs = self._contexts(states, x_s, x_indices, delta, scal, key)
        return self._two_phase(states, ctxs, False, improve=True)

    def update_or_improve(self, states, x_s, x_indices, delta, improve_flag,
                          scal=None, key=None, efl_flag=None):
        """Update or improve selected by a *traced* flag (``algorithm.jl:682-688``).

        Under vmap a cond between the two would execute both full two-phase
        pipelines (incl. eval_missing and the fits) for every batch element;
        here only the cheap phase-1 runs twice and is selected per leaf,
        then evaluation + fitting run once.

        ``efl_flag`` (optional, traced bool): ensure-fully-linear rebuild
        flag threaded into the update-path ``prepare`` — the criticality
        micro-step restructure shares THIS call between normal surrogate
        updates and criticality rebuild passes (``algorithm.jl:575-579``
        ``update_surrogates!(... ensure_fully_linear=true)``), so no
        nested big-carry while_loop exists. ``improve_flag`` wins when both
        are set (callers pass mutually exclusive flags)."""
        ctxs = self._contexts(states, x_s, x_indices, delta, scal, key)
        efl = False if efl_flag is None else efl_flag
        mid = []
        for gi, (ops, st, ctx) in enumerate(zip(self.ops, states, ctxs)):
            model_i, db_i = ops.prepare_improve(st.model, st.db, ctx)
            if self.reuse_from[gi] is not None:
                src = mid[self.reuse_from[gi]]
                # the reuse source carries the selected phase-1 result
                model_u, db_u = ops.prepare_with_reuse(
                    st.model, st.db, ctx, src.model, src.db)
            else:
                model_u, db_u = ops.prepare(st.model, st.db, ctx, efl)
            model, db = jax.tree_util.tree_map(
                lambda a, b: jnp.where(improve_flag, a, b),
                (model_i, db_i), (model_u, db_u))
            mid.append(st._replace(model=model, db=db))
        return self._finish_two_phase(mid, ctxs)

    def _two_phase(self, states, ctxs, ensure_fully_linear, improve):
        # phase 1
        mid = []
        for gi, (ops, st, ctx) in enumerate(zip(self.ops, states, ctxs)):
            if improve:
                model, db = ops.prepare_improve(st.model, st.db, ctx)
            elif self.reuse_from[gi] is not None:
                src = mid[self.reuse_from[gi]]
                model, db = ops.prepare_with_reuse(
                    st.model, st.db, ctx, src.model, src.db)
            else:
                model, db = ops.prepare(st.model, st.db, ctx, ensure_fully_linear)
            mid.append(st._replace(model=model, db=db))
        return self._finish_two_phase(mid, ctxs)

    def _finish_two_phase(self, mid, ctxs):
        # batched evaluation of missing sites (``eval_missing!``)
        evaled = []
        eval_scal = ctxs[0].scal if ctxs else self.scal
        for g, ops, st in zip(self.mop.groups, self.ops, mid):
            fn = lambda xs, g=g: g.eval_unscaled(scaling.untransform(eval_scal, xs))
            # host black-box groups evaluate masked host-side so user code
            # only runs at genuinely missing sites (``Databases.jl:258-277``)
            batch_fn = None
            if g.any_host:
                batch_fn = lambda X, mask, g=g: g.eval_unscaled_batch_masked(
                    jax.vmap(lambda xs: scaling.untransform(eval_scal, xs))(X),
                    mask)
            # windowed tail evaluation pays off only for large databases
            # (for tiny ones the single fused full-capacity vmap is faster)
            win = ops.eval_window if (self.db_capacity >= 256 and
                                      self.db_capacity >= 8 * ops.eval_window) else None
            db, n_new = dbm.eval_missing(st.db, fn, window=win,
                                         eval_batch_masked=batch_fn)
            evaled.append(st._replace(db=db, n_evals=st.n_evals + n_new))
        # phase 2
        out = []
        for gi, (ops, st, ctx) in enumerate(zip(self.ops, evaled, ctxs)):
            model = ops.fit(st.model, st.db, ctx)
            if self.log_level >= 5:
                # model-build internals (loglevel3/4-grade round messages,
                # ``RbfModel.jl:518-655``)
                n_train = getattr(model, "n_train", jnp.asarray(-1, jnp.int32))
                jax.debug.print(
                    "|   (Models) group {g}: n_train={n} fully_linear={f} "
                    "db_count={c} delta={d:.3e}",
                    g=gi, n=n_train, f=ops.fully_linear(model),
                    c=st.db.count, d=ctx.delta)
            out.append(st._replace(model=model))
        return tuple(out)

    # ------------------------------------------- criticality-loop carry split
    def strip_fits(self, states):
        """Drop the refittable model parts from a group-state tuple (smaller
        while-loop carries; see ``SurrogateOps.split_fit``)."""
        return tuple(st._replace(model=ops.split_fit(st.model)[0])
                     for ops, st in zip(self.ops, states))

    def unstrip_fits(self, states):
        """Re-attach placeholder fitted parts (structurally valid for
        prepare/improve; re-run ``fit`` before evaluating)."""
        return tuple(st._replace(model=ops.with_placeholder_fit(st.model))
                     for ops, st in zip(self.ops, states))

    def refit(self, states, x_s, x_indices, delta, scal=None, key=None):
        """Recompute the fitted parts dropped by :meth:`strip_fits` —
        ``fit`` is a pure function of (meta, db, ctx), so this reproduces
        the models bit-identically. Groups whose ops do not split carry
        complete models and are left untouched."""
        from morbit_tpu.models.base import SurrogateOps as _Base

        ctxs = self._contexts(states, x_s, x_indices, delta, scal, key)
        out = []
        for ops, st, ctx in zip(self.ops, states, ctxs):
            if type(ops).split_fit is _Base.split_fit:
                out.append(st)  # carried model is already complete
                continue
            model = ops.fit(ops.with_placeholder_fit(st.model), st.db, ctx)
            out.append(st._replace(model=model))
        return tuple(out)

    # ------------------------------------------------------------- model evals
    def _gather(self, states, x_s, which, role, counted=True, scal=None):
        """Evaluate/differentiate group models, scatter into a role vector."""
        n = self.mop.n_vars
        dt = self.dtype
        dims = {OBJECTIVE: self.mop.m_obj, NL_EQ: self.mop.m_ce, NL_INEQ: self.mop.m_ci}
        m_role = dims[role]
        if which == "eval":
            out = jnp.zeros((m_role,), dt)
        else:
            out = jnp.zeros((m_role, n), dt)
        new_states = list(states)
        comps = [cs for cs in self.mop.composites if cs.role == role]
        comp_groups = {cs.group_index for cs in comps}
        eff_scal = scal if scal is not None else self.scal
        for g, ops in zip(self.mop.groups, self.ops):
            members = [mb for mb in g.members if mb.role == role]
            if not members and g.index not in comp_groups:
                continue
            st = states[g.index]
            if which == "eval" and ops.counts_on_eval and counted:
                new_states[g.index] = st._replace(n_evals=st.n_evals + 1)

            if which == "eval":
                vals = ops.eval(st.model, x_s, scal)
            else:
                vals = ops.jac(st.model, x_s, scal)
            for mb in members:
                part = jax.lax.dynamic_slice_in_dim(vals, mb.group_offset, mb.n_out)
                out = jax.lax.dynamic_update_slice_in_dim(out, part, mb.global_offset, 0)

        # composite entries: phi(untransform(x_s), m_inner(x_s)); Jacobians
        # by forward-mode autodiff through the composition (the chain rule of
        # ``CompositeSurrogate``, ``AbstractSurrogateInterface.jl:193-229``)
        for cs in comps:
            ops = self.ops[cs.group_index]
            st = states[cs.group_index]

            def composed(xq, cs=cs, ops=ops, st=st):
                inner = ops.eval(st.model, xq, scal)
                part = jax.lax.dynamic_slice_in_dim(inner, cs.group_offset, cs.width)
                xu = scaling.untransform(eff_scal, xq)
                return jnp.atleast_1d(jnp.asarray(cs.outer(xu, part))).astype(self.dtype)

            if which == "eval":
                part = composed(x_s)
            else:
                part = jax.jacfwd(composed)(x_s)
            out = jax.lax.dynamic_update_slice_in_dim(out, part, cs.global_offset, 0)
        return out, tuple(new_states)

    def eval_objectives(self, states, x_s, scal=None):
        """``eval_container_objectives_at_scaled_site``
        (``SurrogateContainer.jl:234-269``)."""
        return self._gather(states, x_s, "eval", OBJECTIVE, scal=scal)

    def eval_objectives_raw(self, states, x_s, scal=None):
        """Model values without eval counting (used inside vmapped sweeps
        of the PS/ideal-point subsolvers where counters cannot thread)."""
        out, _ = self._gather(states, x_s, "eval", OBJECTIVE, counted=False,
                              scal=scal)
        return out

    def eval_objectives_batch(self, states, X, scal=None):
        """(K, m_obj) model objective values at a batch of sites, uncounted."""
        return jax.vmap(lambda xq: self.eval_objectives_raw(states, xq, scal))(X)

    def charge_evals(self, states, k, objectives_only: bool = False):
        """Add ``k`` true-function evals to exact-model groups (used by the
        batched backtracking / PS sweeps to charge what the reference's
        sequential loop would have evaluated).

        ``objectives_only``: the reference's Armijo backtracking evaluates
        ONLY the container objectives (``_backtrack``,
        ``descent.jl:150-185`` via
        ``eval_container_objectives_at_scaled_site``), so an exact-model
        group serving only NL constraints must not be charged there
        (round-4 oracle finding — the unconditional charge overcounted
        those groups' budgets). PS subsolver sweeps evaluate the constraint
        surrogates too (NLopt constraint handles fire every iteration,
        ``descent.jl:478-510``), so they charge all counting groups."""
        out = []
        for g, ops, st in zip(self.mop.groups, self.ops, states):
            if ops.counts_on_eval and (g.has_objective or not objectives_only):
                st = st._replace(n_evals=st.n_evals + jnp.asarray(k, jnp.int32))
            out.append(st)
        return tuple(out)

    def eval_nl_eq_raw(self, states, x_s, scal=None):
        out, _ = self._gather(states, x_s, "eval", NL_EQ, counted=False, scal=scal)
        return out

    def eval_nl_ineq_raw(self, states, x_s, scal=None):
        out, _ = self._gather(states, x_s, "eval", NL_INEQ, counted=False, scal=scal)
        return out

    def jac_objectives(self, states, x_s, scal=None):
        out, _ = self._gather(states, x_s, "jac", OBJECTIVE, scal=scal)
        return out

    def eval_nl_eq(self, states, x_s, scal=None):
        return self._gather(states, x_s, "eval", NL_EQ, scal=scal)

    def eval_nl_ineq(self, states, x_s, scal=None):
        return self._gather(states, x_s, "eval", NL_INEQ, scal=scal)

    def jac_nl_eq(self, states, x_s, scal=None):
        out, _ = self._gather(states, x_s, "jac", NL_EQ, scal=scal)
        return out

    def jac_nl_ineq(self, states, x_s, scal=None):
        out, _ = self._gather(states, x_s, "jac", NL_INEQ, scal=scal)
        return out

    def jac_all(self, states, x_s, scal=None):
        """Stacked model Jacobian of every function (objectives then nl
        constraints) — used by the :model scaler update
        (``new_var_scaler``, ``VarScaler.jl:240-260``)."""
        parts = [self.jac_objectives(states, x_s, scal)]
        if self.mop.m_ce > 0:
            parts.append(self.jac_nl_eq(states, x_s, scal))
        if self.mop.m_ci > 0:
            parts.append(self.jac_nl_ineq(states, x_s, scal))
        return jnp.concatenate(parts, axis=0)

    # ------------------------------------------------- model-meta provenance
    @property
    def train_stamp_len(self) -> int:
        return sum(ops.train_stamp_len for ops in self.ops)

    def train_stamps(self, states):
        """Concatenated per-group training-set provenance (int32) — the
        model part of the reference's per-iteration ``IterSaveable``
        (``IterDataIterSaveable.jl:189-216``)."""
        parts = [ops.train_stamp(st.model)
                 for ops, st in zip(self.ops, states) if ops.train_stamp_len]
        if not parts:
            return jnp.zeros((0,), jnp.int32)
        return jnp.concatenate(parts)

    # ------------------------------------------------------------------- flags
    def fully_linear(self, states):
        """AND over groups (``SurrogateContainer.jl`` fully_linear)."""
        flag = jnp.asarray(True)
        for ops, st in zip(self.ops, states):
            flag = flag & ops.fully_linear(st.model)
        return flag

    def set_fully_linear(self, states, val):
        return tuple(
            st._replace(model=ops.set_fully_linear(st.model, val))
            for ops, st in zip(self.ops, states)
        )

    # ------------------------------------------------------------------ budget
    def budget_exhausted(self, states):
        """``_budget_okay`` negation (``algorithm.jl:6-12``): any objective
        group at or above its eval cap."""
        flag = jnp.asarray(False)
        for g, st in zip(self.mop.groups, states):
            if not g.has_objective:
                continue
            cap = min(self.ac.max_evals, g.max_evals)
            if cap >= 2 ** 31 - 1:
                continue
            flag = flag | (st.n_evals >= cap)
        return flag
