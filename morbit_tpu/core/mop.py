"""Multiobjective problem definition and compilation.

User-facing mutable :class:`MOP` mirroring the reference API
(``src/MOP.jl:9-107``: ``add_objective!``, ``add_nl_eq_constraint!``,
``add_eq_constraint!`` …), plus :func:`compile_mop`, the analogue of freezing
the problem into a fully-typed ``MOPTyped`` at optimize start
(``src/MOP.jl:27-82``, ``algorithm.jl:248``).

Differences by design (TPU-first):

* user functions are *pure JAX functions* ``x -> (n_out,)`` over unscaled
  sites, so evaluation batches via ``vmap`` (subsuming the reference's
  ``can_batch``/broadcast machinery, ``src/globals.jl:97-102``) and the whole
  solver can stay under ``jit``;
* the index bookkeeping (``NLIndex`` -> output ranges) becomes static slice
  metadata computed once at compile time;
* function grouping (``do_groupings``, ``SurrogateContainer.jl:2-46``) happens
  at compile time: functions with equal combinable configs are fitted as one
  vector surrogate and share one evaluation database.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.models.configs import (
    ExactConfig,
    LagrangeConfig,
    RbfConfig,
    SurrogateConfig,
    TaylorConfig,
)

OBJECTIVE = "objective"
NL_EQ = "nl_eq"
NL_INEQ = "nl_ineq"
INNER = "inner"  # modelled function used only inside composites


@dataclasses.dataclass(frozen=True, eq=False)
class VecFun:
    """A (vector-valued) user function with model config and optional
    derivative callbacks (the ``VecFun``/``DiffFn`` analogue,
    ``src/VecFun.jl:13-98``, ``src/DiffFn.jl:56-140``).

    ``host=True`` marks a *black-box* (non-JAX) Python/NumPy callable: it is
    bridged into the jitted solver with ``jax.pure_callback``. ``can_batch``
    is the reference's batch-broadcast hook (``src/globals.jl:97-102``,
    ``VecFun.jl:248-257``): the callable accepts a whole ``(B, n)`` batch and
    returns ``(B, n_out)`` in one call, so the batched ``eval_missing`` pass
    costs a single invocation. Host functions without a ``jac`` callback get
    central finite differences (the ``FiniteDiffWrapper``, ``DiffFn.jl:56-140``).
    """

    fn: Callable
    n_out: int
    model_cfg: SurrogateConfig
    role: str
    jac: Optional[Callable] = None      # x -> (n_out, n) Jacobian callback
    hess: Optional[Callable] = None     # x -> (n_out, n, n) Hessians callback
    max_evals: int = 2 ** 31 - 1
    host: bool = False
    can_batch: bool = False
    fd_step: float = 1.49e-7            # ~10*sqrt(eps64), RFD default stepsize

    def eval(self, x: jax.Array) -> jax.Array:
        if self.host:
            shape = jax.ShapeDtypeStruct((self.n_out,), x.dtype)

            def cb(xv):
                # under vmap_method="expand_dims" the callback sees the whole
                # (B, n) batch and must return (B, n_out) — the reference's
                # can_batch broadcast contract (``VecFun.jl:248-257``)
                out = np.asarray(self.fn(xv), dtype=xv.dtype)
                return out.reshape(np.shape(xv)[:-1] + (self.n_out,))

            vmap_method = "expand_dims" if self.can_batch else "sequential"
            return jax.pure_callback(cb, shape, x, vmap_method=vmap_method)
        return jnp.atleast_1d(jnp.asarray(self.fn(x)))

    def eval_batch_masked(self, X: jax.Array, mask: jax.Array) -> jax.Array:
        """Evaluate a ``(K, n)`` site batch where only rows with
        ``mask[i]`` need values (others return zeros).

        For host black-boxes the masking happens *host-side inside one
        callback*, so the user's function is physically invoked only at the
        masked rows — the ``eval_missing!`` contract of the reference
        (``Databases.jl:258-277`` evaluates exactly the unevaluated
        results, never the whole database). Pure-JAX functions just vmap
        (masked rows are free compute, no user code involved)."""
        if not self.host:
            return jax.vmap(self.eval)(X)
        shape = jax.ShapeDtypeStruct(X.shape[:-1] + (self.n_out,), X.dtype)

        def cb(Xv, mv):
            Xv = np.asarray(Xv)
            mv = np.asarray(mv)
            flatX = Xv.reshape((-1, Xv.shape[-1]))
            flatm = mv.reshape((-1,))
            out = np.zeros((flatX.shape[0], self.n_out), dtype=Xv.dtype)
            if self.can_batch and flatm.any():
                sel = np.nonzero(flatm)[0]
                vals = np.asarray(self.fn(flatX[sel]), dtype=Xv.dtype)
                out[sel] = vals.reshape((len(sel), self.n_out))
            else:
                for i in np.nonzero(flatm)[0]:
                    out[i] = np.asarray(self.fn(flatX[i]),
                                        dtype=Xv.dtype).reshape(self.n_out)
            return out.reshape(mv.shape + (self.n_out,))

        return jax.pure_callback(cb, shape, X, mask,
                                 vmap_method="expand_dims")

    def jacobian(self, x: jax.Array) -> jax.Array:
        """User callback > autodiff / finite differences
        (``AutoDiffWrapper``/``FiniteDiffWrapper``, ``DiffFn.jl:56-148``)."""
        n = x.shape[0]
        if self.jac is not None:
            return jnp.reshape(jnp.asarray(self.jac(x)), (self.n_out, n))
        if self.host:
            h = jnp.asarray(self.fd_step, x.dtype)
            eye = jnp.eye(n, dtype=x.dtype)
            plus = jax.vmap(self.eval)(x[None, :] + h * eye)    # (n, n_out)
            minus = jax.vmap(self.eval)(x[None, :] - h * eye)
            return ((plus - minus) / (2.0 * h)).T
        return jnp.reshape(jax.jacfwd(self.eval)(x), (self.n_out, n))

    def hessians(self, x: jax.Array) -> jax.Array:
        n = x.shape[0]
        if self.hess is not None:
            return jnp.reshape(jnp.asarray(self.hess(x)), (self.n_out, n, n))
        if self.host:
            h = jnp.asarray(self.fd_step ** 0.5, x.dtype)
            eye = jnp.eye(n, dtype=x.dtype)

            def jac_at(xi):
                plus = jax.vmap(self.eval)(xi[None, :] + h * eye)
                minus = jax.vmap(self.eval)(xi[None, :] - h * eye)
                return ((plus - minus) / (2.0 * h)).T  # (n_out, n)

            Jp = jax.vmap(lambda j: jac_at(x + h * eye[j]))(jnp.arange(n))
            Jm = jax.vmap(lambda j: jac_at(x - h * eye[j]))(jnp.arange(n))
            H = (Jp - Jm) / (2.0 * h)                  # (n, n_out, n)
            return jnp.transpose(H, (1, 0, 2))
        return jax.jacfwd(jax.jacrev(self.eval))(x).reshape((self.n_out, n, n))


class MOP:
    """Mutable problem container (``src/MOP.jl:9-25``).

    ``MOP(n)`` — n unconstrained variables; ``MOP(lb, ub)`` — box constrained.
    """

    def __init__(self, n_or_lb, ub=None):
        if ub is None and np.isscalar(n_or_lb):
            self.n_vars = int(n_or_lb)
            self.lb = np.full(self.n_vars, -np.inf)
            self.ub = np.full(self.n_vars, np.inf)
        else:
            self.lb = np.asarray(n_or_lb, float)
            self.ub = np.asarray(ub, float)
            assert self.lb.shape == self.ub.shape
            self.n_vars = self.lb.shape[0]
        self.functions: list[VecFun] = []
        self.composites: list[CompositeFun] = []
        self._order: list[tuple] = []  # addition order over fns + composites
        self._A_eq: list[np.ndarray] = []
        self._b_eq: list[np.ndarray] = []
        self._A_ineq: list[np.ndarray] = []
        self._b_ineq: list[np.ndarray] = []

    # -- nonlinear functions (``MOP.jl:84-107``) -----------------------------
    def _add(self, fn, n_out, model_cfg, role, jac=None, hess=None,
             max_evals=2 ** 31 - 1, host=False, can_batch=False):
        vf = VecFun(fn=fn, n_out=int(n_out), model_cfg=model_cfg, role=role,
                    jac=jac, hess=hess, max_evals=max_evals, host=host,
                    can_batch=can_batch)
        self.functions.append(vf)
        self._order.append(("fn", len(self.functions) - 1))
        return len(self.functions) - 1

    def add_objective(self, fn, n_out=1, model_cfg=None, jac=None, hess=None,
                      max_evals=2 ** 31 - 1, host=False, can_batch=False):
        cfg = RbfConfig() if model_cfg is None else model_cfg
        return self._add(fn, n_out, cfg, OBJECTIVE, jac, hess, max_evals,
                         host, can_batch)

    def add_exact_objective(self, fn, n_out=1, jac=None, **kw):
        """``add_exact_objective!`` — grads from callback or autodiff."""
        return self._add(fn, n_out, ExactConfig(), OBJECTIVE, jac, **kw)

    def add_rbf_objective(self, fn, n_out=1, **cfg_kw):
        return self._add(fn, n_out, RbfConfig(**cfg_kw), OBJECTIVE)

    def add_lagrange_objective(self, fn, n_out=1, **cfg_kw):
        return self._add(fn, n_out, LagrangeConfig(**cfg_kw), OBJECTIVE)

    def add_taylor_objective(self, fn, n_out=1, **cfg_kw):
        return self._add(fn, n_out, TaylorConfig(**cfg_kw), OBJECTIVE)

    def add_nl_eq_constraint(self, fn, n_out=1, model_cfg=None, jac=None,
                             hess=None, **kw):
        cfg = RbfConfig() if model_cfg is None else model_cfg
        return self._add(fn, n_out, cfg, NL_EQ, jac, hess, **kw)

    def add_nl_ineq_constraint(self, fn, n_out=1, model_cfg=None, jac=None,
                               hess=None, **kw):
        cfg = RbfConfig() if model_cfg is None else model_cfg
        return self._add(fn, n_out, cfg, NL_INEQ, jac, hess, **kw)

    # -- composite functions (``CompositeVecFun``, ``VecFun.jl``: outer
    #    phi(x, g(x)) with expensive modelled inner g) ----------------------
    def add_function(self, fn, n_out=1, model_cfg=None, jac=None, hess=None,
                     host=False, can_batch=False):
        """Register an *inner* function (modelled, but not itself an
        objective/constraint) for use in composites — the ``_add_function!``
        + ``RefVecFun`` sharing pattern (``MOP.jl:84-107``)."""
        cfg = RbfConfig() if model_cfg is None else model_cfg
        return self._add(fn, n_out, cfg, INNER, jac, hess,
                         host=host, can_batch=can_batch)

    def _add_composite(self, outer, inner_index, n_out, role):
        assert 0 <= inner_index < len(self.functions)
        if isinstance(outer, str):
            outer = outer_fn_from_expr(outer)
        self.composites.append(CompositeFun(
            outer=outer, inner_index=inner_index, n_out=int(n_out), role=role,
            order=len(self._order)))
        self._order.append(("comp", len(self.composites) - 1))
        return len(self.composites) - 1

    def add_composite_objective(self, outer, inner_index, n_out=1):
        """Objective ``phi(x, g(x))`` with cheap known ``outer`` and modelled
        inner ``g`` (added via :meth:`add_function`). The surrogate is
        ``phi(x, m_g(x))`` with exact chain-rule derivatives
        (``CompositeVecFun``/``CompositeSurrogate``,
        ``AbstractSurrogateInterface.jl:193-229``)."""
        return self._add_composite(outer, inner_index, n_out, OBJECTIVE)

    def add_composite_nl_eq_constraint(self, outer, inner_index, n_out=1):
        return self._add_composite(outer, inner_index, n_out, NL_EQ)

    def add_composite_nl_ineq_constraint(self, outer, inner_index, n_out=1):
        return self._add_composite(outer, inner_index, n_out, NL_INEQ)

    # -- linear constraints (``AbstractMOPInterface.jl:354-375``) ------------
    def add_eq_constraint(self, A, b):
        """Rows of ``A x - b == 0``."""
        A = np.atleast_2d(np.asarray(A, float))
        self._A_eq.append(A)
        self._b_eq.append(np.atleast_1d(np.asarray(b, float)))

    def add_ineq_constraint(self, A, b):
        """Rows of ``A x - b <= 0``."""
        A = np.atleast_2d(np.asarray(A, float))
        self._A_ineq.append(A)
        self._b_ineq.append(np.atleast_1d(np.asarray(b, float)))

    @property
    def num_objectives(self):
        return (sum(f.n_out for f in self.functions if f.role == OBJECTIVE)
                + sum(c.n_out for c in self.composites if c.role == OBJECTIVE))


def outer_fn_from_expr(expr: str) -> Callable:
    """Build an outer function from an expression string over ``x`` and ``g``
    (the reference's ``outer_fn_from_expr``/``make_outer_fun`` feature via
    ``GeneralizedGenerated``, ``VecFun.jl``). Example::

        mop.add_composite_objective("x[0] + jnp.sum(g**2)", gidx)

    The expression is evaluated with ``jnp`` (and ``jnp`` aliased as ``np``)
    in scope; indexing is 0-based (Python).

    .. warning:: Like the reference's ``GeneralizedGenerated``-based
       ``make_outer_fun``, the string is *executed as code* (a bare
       ``eval`` with no sandboxing) — only pass trusted expressions."""
    code = compile(expr, "<outer_fn>", "eval")

    def outer(x, g):
        return eval(code, {"jnp": jnp, "np": jnp, "x": x, "g": g})

    return outer


@dataclasses.dataclass(frozen=True, eq=False)
class CompositeFun:
    """Composite ``phi(x, g(x))``: cheap known outer, modelled inner."""

    outer: Callable      # (x (n,), g_vals (k,)) -> (n_out,)
    inner_index: int     # index into mop.functions (role == INNER allowed too)
    n_out: int
    role: str
    order: int

    def eval_true(self, x, inner_vals):
        return jnp.atleast_1d(jnp.asarray(self.outer(x, inner_vals)))


@dataclasses.dataclass(frozen=True, eq=False)
class GroupMember:
    fn_index: int        # index into mop.functions
    group_offset: int    # offset of this function's outputs inside the group
    global_offset: int   # offset inside the role vector (fx / c_e / c_i)
    n_out: int
    role: str


@dataclasses.dataclass(frozen=True, eq=False)
class GroupSpec:
    """Static description of one surrogate group (``GroupedSurrogates``
    analogue, ``SurrogateContainer.jl:48-99``)."""

    index: int
    cfg: SurrogateConfig
    fns: tuple          # tuple[VecFun]
    members: tuple      # tuple[GroupMember]
    m: int              # total outputs
    max_evals: int      # min over member functions and cfg
    has_objective: bool

    def eval_unscaled(self, x: jax.Array) -> jax.Array:
        """Concatenated true values of all member functions at an unscaled
        site — the batched-evaluation unit (``eval_missing!`` evaluates per
        sub-database, ``Databases.jl:258-277``)."""
        return jnp.concatenate([f.eval(x) for f in self.fns])

    @property
    def any_host(self) -> bool:
        return any(f.host for f in self.fns)

    def eval_unscaled_batch_masked(self, X: jax.Array,
                                   mask: jax.Array) -> jax.Array:
        """(K, m) values at unscaled sites, physically evaluating host
        black-boxes only at masked rows (see
        :meth:`VecFun.eval_batch_masked`)."""
        return jnp.concatenate(
            [f.eval_batch_masked(X, mask) for f in self.fns], axis=-1)

    def jac_unscaled(self, x: jax.Array) -> jax.Array:
        return jnp.concatenate([f.jacobian(x) for f in self.fns], axis=0)

    def hess_unscaled(self, x: jax.Array) -> jax.Array:
        return jnp.concatenate([f.hessians(x) for f in self.fns], axis=0)


@dataclasses.dataclass(frozen=True, eq=False)
class CompositeSpec:
    """Compiled composite: locates the inner function's outputs."""

    outer: Callable
    role: str
    global_offset: int
    n_out: int
    group_index: int
    group_offset: int
    width: int           # inner function's n_out


@dataclasses.dataclass(frozen=True, eq=False)
class CompiledMOP:
    """Frozen problem (``MOPTyped`` analogue, ``src/MOP.jl:27-82``)."""

    n_vars: int
    lb: np.ndarray
    ub: np.ndarray
    A_eq: np.ndarray     # (p, n)
    b_eq: np.ndarray     # (p,)
    A_ineq: np.ndarray   # (q, n)
    b_ineq: np.ndarray   # (q,)
    groups: tuple        # tuple[GroupSpec]
    m_obj: int
    m_ce: int
    m_ci: int
    composites: tuple = ()  # tuple[CompositeSpec]

    @property
    def n_groups(self):
        return len(self.groups)

    @property
    def has_nl_constraints(self):
        return (self.m_ce + self.m_ci) > 0

    @property
    def has_lin_constraints(self):
        return self.A_eq.shape[0] + self.A_ineq.shape[0] > 0

    def scatter_role_vectors(self, group_values: Sequence[jax.Array], dtype,
                             x=None):
        """Map per-group output vectors into (fx, c_e, c_i). ``x`` (unscaled)
        is required when composites are present (outer functions take it)."""
        fx = jnp.zeros((self.m_obj,), dtype)
        c_e = jnp.zeros((self.m_ce,), dtype)
        c_i = jnp.zeros((self.m_ci,), dtype)

        def put(buf, part, off):
            return jax.lax.dynamic_update_slice_in_dim(buf, part, off, 0)

        for g, vals in zip(self.groups, group_values):
            for mb in g.members:
                if mb.role == INNER:
                    continue
                part = jax.lax.dynamic_slice_in_dim(vals, mb.group_offset, mb.n_out)
                if mb.role == OBJECTIVE:
                    fx = put(fx, part, mb.global_offset)
                elif mb.role == NL_EQ:
                    c_e = put(c_e, part, mb.global_offset)
                else:
                    c_i = put(c_i, part, mb.global_offset)
        for cs in self.composites:
            inner_vals = jax.lax.dynamic_slice_in_dim(
                group_values[cs.group_index], cs.group_offset, cs.width)
            part = jnp.atleast_1d(jnp.asarray(cs.outer(x, inner_vals))).astype(dtype)
            if cs.role == OBJECTIVE:
                fx = put(fx, part, cs.global_offset)
            elif cs.role == NL_EQ:
                c_e = put(c_e, part, cs.global_offset)
            else:
                c_i = put(c_i, part, cs.global_offset)
        return fx, c_e, c_i


def compile_mop(mop: MOP, combine_models: bool = True) -> CompiledMOP:
    """Freeze the problem: build groups, output maps, linear blocks.

    Grouping rule (``do_groupings`` + ``combinable``,
    ``SurrogateContainer.jl:2-46``): functions whose configs are combinable
    and compare equal share one group; others get singleton groups.
    """
    if mop.num_objectives == 0:
        raise ValueError("`mop` has no objectives!")

    # ``RefVecFun`` value sharing (``VecFun.jl:13-98``,
    # ``_optimized_evaluate_at_unscaled_site``, ``MOP.jl:302-350``): the same
    # callable registered several times (e.g. as two objectives, or as an
    # objective and a constraint) is ONE function evaluated once per site.
    # Duplicates collapse onto a canonical index; the extra registrations
    # become additional group members that read the same output slice, and
    # the shared group eval counter reproduces the reference's shared
    # ``CountedFunc`` counting.
    canonical: dict[int, int] = {}
    for i, f in enumerate(mop.functions):
        can = i
        for j in range(i):
            g = mop.functions[j]
            if (f.fn is g.fn and f.n_out == g.n_out
                    and f.model_cfg == g.model_cfg
                    and type(f.model_cfg) is type(g.model_cfg)
                    and f.jac is g.jac and f.hess is g.hess
                    and f.host == g.host and f.can_batch == g.can_batch):
                can = canonical[j]
                break
        canonical[i] = can

    group_lists: list[list[int]] = []
    group_cfgs: list[SurrogateConfig] = []
    for i, f in enumerate(mop.functions):
        if canonical[i] != i:
            continue
        placed = False
        if combine_models and f.model_cfg.combinable:
            for gi, cfg in enumerate(group_cfgs):
                if cfg == f.model_cfg and type(cfg) is type(f.model_cfg):
                    group_lists[gi].append(i)
                    placed = True
                    break
        if not placed:
            group_lists.append([i])
            group_cfgs.append(f.model_cfg)

    role_offsets = {OBJECTIVE: 0, NL_EQ: 0, NL_INEQ: 0, INNER: 0}
    # global offsets follow the combined addition order over plain functions
    # and composites (reference orders outputs by index ordering)
    fn_global_offset = {}
    comp_global_offset = {}
    order = mop._order or [("fn", i) for i in range(len(mop.functions))]
    for kind, i in order:
        if kind == "fn":
            f = mop.functions[i]
            fn_global_offset[i] = role_offsets[f.role]
            role_offsets[f.role] += f.n_out
        else:
            c = mop.composites[i]
            comp_global_offset[i] = role_offsets[c.role]
            role_offsets[c.role] += c.n_out

    groups = []
    # canonical fn index -> (group index, group offset) for duplicate/member
    # resolution below
    canon_location: dict[int, tuple[int, int]] = {}
    for gi, fn_ids in enumerate(group_lists):
        members = []
        off = 0
        fns = []
        max_ev = 2 ** 31 - 1
        has_obj = False
        for i in fn_ids:
            f = mop.functions[i]
            members.append(GroupMember(i, off, fn_global_offset[i], f.n_out, f.role))
            canon_location[i] = (gi, off)
            off += f.n_out
            fns.append(f)
            max_ev = min(max_ev, f.max_evals, getattr(f.model_cfg, "max_evals", 2 ** 31 - 1))
            has_obj = has_obj or f.role == OBJECTIVE
        groups.append(GroupSpec(
            index=gi, cfg=group_cfgs[gi], fns=tuple(fns), members=tuple(members),
            m=off, max_evals=max_ev, has_objective=has_obj,
        ))

    # duplicate registrations (RefVecFun shares) become extra members reading
    # the canonical function's output slice; budgets take the min (the
    # reference's shared ``CountedFunc`` counter makes every index's budget
    # apply to the same counter)
    for i, can in canonical.items():
        if can == i:
            continue
        f = mop.functions[i]
        gi, goff = canon_location[can]
        g = groups[gi]
        groups[gi] = dataclasses.replace(
            g,
            members=g.members + (GroupMember(i, goff, fn_global_offset[i],
                                             f.n_out, f.role),),
            max_evals=min(g.max_evals, f.max_evals,
                          getattr(f.model_cfg, "max_evals", 2 ** 31 - 1)),
            has_objective=g.has_objective or f.role == OBJECTIVE,
        )

    # locate each composite's inner function inside its group (duplicate
    # indices resolve to their canonical slot)
    fn_location = {i: canon_location[can] for i, can in canonical.items()}
    composites = []
    obj_groups = set()
    for ci, c in enumerate(mop.composites):
        gi, goff = fn_location[c.inner_index]
        composites.append(CompositeSpec(
            outer=c.outer, role=c.role, global_offset=comp_global_offset[ci],
            n_out=c.n_out, group_index=gi, group_offset=goff,
            width=mop.functions[c.inner_index].n_out))
        if c.role == OBJECTIVE:
            obj_groups.add(gi)
    # groups feeding composite objectives count toward the eval budget
    groups = [dataclasses.replace(g, has_objective=True) if g.index in obj_groups
              and not g.has_objective else g for g in groups]

    n = mop.n_vars
    A_eq = np.vstack(mop._A_eq) if mop._A_eq else np.zeros((0, n))
    b_eq = np.concatenate(mop._b_eq) if mop._b_eq else np.zeros((0,))
    A_ineq = np.vstack(mop._A_ineq) if mop._A_ineq else np.zeros((0, n))
    b_ineq = np.concatenate(mop._b_ineq) if mop._b_ineq else np.zeros((0,))

    return CompiledMOP(
        n_vars=n, lb=mop.lb, ub=mop.ub,
        A_eq=A_eq, b_eq=b_eq, A_ineq=A_ineq, b_ineq=b_ineq,
        groups=tuple(groups),
        m_obj=role_offsets[OBJECTIVE], m_ce=role_offsets[NL_EQ],
        m_ci=role_offsets[NL_INEQ],
        composites=tuple(composites),
    )
