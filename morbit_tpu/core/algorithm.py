"""Main trust-region algorithm: ``optimize`` as an on-device while-loop.

Reference: ``src/algorithm.jl``. The Julia driver loop (``optimize`` ->
``iterate!`` while CONTINUE, ``algorithm.jl:919-958``) becomes a pure
``State -> State`` function under ``jax.lax.while_loop``: one compiled
program runs the entire optimization on device, and ``jax.vmap`` over the
initial state turns multistart/multi-problem fleets into batched dense
algebra (see :mod:`morbit_tpu.parallel`).

Control-flow fidelity (SURVEY.md §7 hard part 3): the reference's nested
early exits and the criticality shrink loop (``algorithm.jl:523-613``) are
flattened into ``lax.cond`` branches and an inner ``lax.while_loop`` with
explicit exit flags; the ``ITER_TYPE`` classification tree
(``algorithm.jl:820-863``) is reproduced exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.core import database as dbm
from morbit_tpu.core import filter as flt
from morbit_tpu.core import scaling
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.descent import (
    LinearizedConstraints,
    PascolettiSerafiniConfig,
    SteepestDescentConfig,
    backtrack,
    initial_stepsize,
    normal_step,
    resolve_descent_config,
    steepest_descent_direction,
)
from morbit_tpu.core.enums import ITER_TYPE, RADIUS_UPDATE, STOP_CODE
from morbit_tpu.core.mop import MOP, CompiledMOP, compile_mop
from morbit_tpu.models.container import SurrogateContainer
from morbit_tpu.ops.geometry import project_into_box

import os as _os

#: PROFILING-ONLY ablation (tools/profile_trip_fixed.py): 1 = skip the
#: criticality micro-step dispatch entirely (lanes go straight to the
#: trial point; bit-exact only for runs that never enter the routine).
#: NOT reference semantics — measurement hook only.
_ABLATE_CRIT = int(_os.environ.get("MORBIT_ABLATE_CRIT", "0"))

#: criticality micro-step modes (packed into ``SolverState.ints``): the
#: criticality routine (``algorithm.jl:523-613``) runs as micro-steps of
#: the OUTER solve loop — one rebuild pass per outer trip — instead of a
#: nested ``while_loop``. A nested loop's carry (group states incl. the
#: databases) pays per-leaf boundary copies on EVERY outer trip even at
#: zero trips (measured 1.59 -> 0.35 ms/trip at cap 157 without it,
#: tools/profile_trip_fixed.py); micro-steps eliminate the nested carry
#: entirely and share the per-trip model update + criticality computation
#: with the normal iteration path.
_MODE_NORMAL, _MODE_CRIT_PRE, _MODE_CRIT_LOOP = 0, 1, 2


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TrajectoryState:
    """Per-iteration stamps — the ``IterSaveable`` ring buffer
    (``src/IterDataIterSaveable.jl:189-216``, stamped at
    ``algorithm.jl:899-903``).

    All stamps are PACKED into one ``(T, W)`` array with layout
    ``[x (n) | fx (m) | delta | rho | omega | steplength | it_stat |
    x_indices (G) | model_meta (MW)]`` — each distinct while-loop-carried
    buffer pays a fixed alternate-memory copy stall per boundary on TPU
    (tools/profile_trace.py), so one packed buffer replaces eight. Integer
    stamps are stored in the float dtype (exact below 2^24); the named
    views convert back. ``MW > 0`` only with
    ``AlgorithmConfig.save_model_meta`` — per-group training-set
    provenance (``[n_train, db row indices...]`` per stamping group), the
    reference's model-meta ``IterSaveable`` content
    (``RbfModel.jl:162-175``, ``IterDataIterSaveable.jl:189-216``)."""

    data: jax.Array   # (T, W)
    count: jax.Array  # int32
    n: int
    m: int
    G: int
    MW: int = 0

    def tree_flatten(self):
        return (self.data, self.count), (self.n, self.m, self.G, self.MW)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    # ---- named read-only views (leading batch dims pass through)
    @property
    def x(self):
        return self.data[..., :, : self.n]

    @property
    def fx(self):
        return self.data[..., :, self.n: self.n + self.m]

    def _col(self, j):
        return self.data[..., :, self.n + self.m + j]

    @property
    def delta(self):
        return self._col(0)

    @property
    def rho(self):
        return self._col(1)

    @property
    def omega(self):
        return self._col(2)

    @property
    def steplength(self):
        return self._col(3)

    @property
    def it_stat(self):
        return self._col(4).astype(jnp.int32)

    @property
    def x_indices(self):
        o = self.n + self.m + 5
        return self.data[..., :, o: o + self.G].astype(jnp.int32)

    @property
    def model_meta(self):
        """(T, MW) int32 per-iteration training-set provenance (empty
        unless ``save_model_meta``); split per group with
        ``SurrogateOps.train_stamp_len``."""
        o = self.n + self.m + 5 + self.G
        return self.data[..., :, o: o + self.MW].astype(jnp.int32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SolverState:
    """Complete solver state (``IterData`` + databases + filter + stamps).

    The int32 bookkeeping scalars (iteration counter, last ``ITER_TYPE``,
    stop code) and the per-group ``x_indices`` map are PACKED into one
    ``ints`` vector: each distinct buffer carried across the outer
    ``while_loop`` boundary pays a fixed alternate-memory copy stall on TPU
    (tools/profile_trace.py). The named views and ``_replace`` keep the
    logical field API."""

    x: jax.Array        # (n,) unscaled iterate
    x_s: jax.Array      # (n,) scaled iterate
    fx: jax.Array       # (m_obj,)
    l_e: jax.Array      # (p,) linear eq values  A~ x_s - b~
    l_i: jax.Array      # (q,)
    c_e: jax.Array      # (m_ce,)
    c_i: jax.Array      # (m_ci,)
    dlt: jax.Array      # (2,) [delta, delta_loc] — the trust-region radius
                        #   and the criticality loop's shrinking local copy
                        #   (``algorithm.jl:575-579``; meaningful only while
                        #   crit_mode > 0), packed into ONE buffer
    ints: jax.Array     # (5 + G,) int32: [iter_counter, last_it_stat,
                        #   stop_code, crit_mode, crit_nloops,
                        #   x_indices (G,)]
    groups: tuple       # tuple[GroupState]
    filter: flt.FilterState
    traj: TrajectoryState
    scal: scaling.VarScaler  # current variable scaling (constant unless
                             # var_scaler_update == 'model')
    key: jax.Array      # PRNG key (round-4 use_max_points sampling)

    _FIELDS = ("x", "x_s", "fx", "l_e", "l_i", "c_e", "c_i", "dlt",
               "ints", "groups", "filter", "traj", "scal", "key")
    _INT_COLS = {"iter_counter": 0, "last_it_stat": 1, "stop_code": 2,
                 "crit_mode": 3, "crit_nloops": 4}
    _X_IDX_OFF = 5

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in self._FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # ---- named views of the packed floats
    @property
    def delta(self):
        return self.dlt[..., 0]

    @property
    def delta_loc(self):
        return self.dlt[..., 1]

    # ---- named views of the packed ints
    @property
    def iter_counter(self):
        return self.ints[..., 0]

    @property
    def last_it_stat(self):
        return self.ints[..., 1]

    @property
    def stop_code(self):
        return self.ints[..., 2]

    @property
    def crit_mode(self):
        return self.ints[..., 3]

    @property
    def crit_nloops(self):
        return self.ints[..., 4]

    @property
    def x_indices(self):
        return self.ints[..., self._X_IDX_OFF:]

    def _replace(self, **kw):
        ints = kw.pop("ints", self.ints)
        for name, col in self._INT_COLS.items():
            if name in kw:
                ints = ints.at[..., col].set(
                    jnp.asarray(kw.pop(name), jnp.int32))
        if "x_indices" in kw:
            ints = ints.at[..., self._X_IDX_OFF:].set(
                jnp.asarray(kw.pop("x_indices"), jnp.int32))
        dlt = kw.pop("dlt", self.dlt)
        if "delta" in kw:
            dlt = dlt.at[..., 0].set(jnp.asarray(kw.pop("delta"), dlt.dtype))
        if "delta_loc" in kw:
            dlt = dlt.at[..., 1].set(
                jnp.asarray(kw.pop("delta_loc"), dlt.dtype))
        return dataclasses.replace(self, ints=ints, dlt=dlt, **kw)


class OptimizeResult(NamedTuple):
    x: jax.Array
    fx: jax.Array
    stop_code: jax.Array
    n_iterations: jax.Array
    n_evals: jax.Array
    state: SolverState


def _highest_matmul_precision(fn):
    """Trace-time context: force full-precision matmuls inside the solver.

    TPU float32 matmuls default to bfloat16 passes, which destroys the small
    dense Gram/KKT/QP solves (measured: multistart convergence 0.17 -> 0.90
    at f32 on v5e). The affected ops are tiny, so the cost is negligible."""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapper


class Solver:
    """Static solver object: compiles the problem and builds jittable
    ``initialize`` / ``iterate`` / ``solve`` functions."""

    def __init__(self, mop: CompiledMOP, ac: Optional[AlgorithmConfig] = None,
                 dtype=jnp.float64, x0_hint=None, live_log=False,
                 log_level: int = 0):
        #: in-run log levels via jax.debug.print from inside the jitted loop —
        #: the ``loglevel1..4`` analogue (``custom_logging.jl:18-66``):
        #: log_level >= 3 -> per-iteration banner (``algorithm.jl:651-659``,
        #: loglevel1-grade); >= 4 -> criticality-test/restoration/acceptance
        #: progress (loglevel2/3-grade, ``algorithm.jl:534-561,470-482``);
        #: >= 5 -> model-build internals per group (loglevel4-grade,
        #: ``RbfModel.jl`` round messages).
        self.log_level = max(int(log_level), 3 if live_log else 0)
        self.live_log = self.log_level >= 3
        self.mop = mop
        self.ac = ac or AlgorithmConfig()
        self.dtype = dtype
        ac = self.ac

        # static numpy bounds: Solver may be constructed INSIDE a trace
        # (parametric_multistart), where jnp constants become tracers and
        # would break the scaler's static finiteness dispatch
        lb = np.asarray(mop.lb, jnp.dtype(dtype).type)
        ub = np.asarray(mop.ub, jnp.dtype(dtype).type)
        all_finite = bool(np.all(np.isfinite(mop.lb)) and np.all(np.isfinite(mop.ub)))
        if ac.var_scaler == "auto" and not all_finite and x0_hint is not None:
            # finite-difference/autodiff Jacobian scaling estimation
            # (``get_var_scaler`` :auto branch, ``VarScaler.jl:214-234``)
            rng = np.random.default_rng(1234)
            x0p = np.clip(np.asarray(x0_hint, float)
                          + rng.uniform(-0.1, 1.0, mop.n_vars), mop.lb, mop.ub)
            J = np.vstack([
                np.asarray(g.jac_unscaled(jnp.asarray(x0p, dtype)))
                for g in mop.groups])
            self.scal = scaling.estimate_auto_scaler(J, lb, ub)
        else:
            self.scal = scaling.get_var_scaler(lb, ub, ac.var_scaler)

        max_model_pts = max(
            [g.cfg.resolved_max_points(mop.n_vars)
             for g in mop.groups if hasattr(g.cfg, "resolved_max_points")],
            default=mop.n_vars + 1,
        )
        # per-iteration NEW-site bound: Taylor inserts a full stencil per
        # accepted move, Lagrange up to p poised points (round-2 review
        # finding: the RBF-shaped heuristic silently truncated Taylor
        # stencils under use_db=False)
        from morbit_tpu.models.configs import LagrangeConfig as _LC
        from morbit_tpu.models.configs import TaylorConfig as _TC
        sites_per_iter = max(
            [g.cfg.resolved_max_points(mop.n_vars)
             for g in mop.groups if isinstance(g.cfg, (_TC, _LC))],
            default=0,
        )
        self.db_capacity = ac.resolved_db_capacity(mop.n_vars, max_model_pts,
                                                   sites_per_iter)
        #: (max_model_points, sites_per_iter) — the non-config inputs of
        #: resolved_db_capacity, kept so staged runners can re-evaluate the
        #: formula at intermediate iteration bounds (CompactedMultistart's
        #: growing per-stage capacity)
        self._cap_terms = (max_model_pts, sites_per_iter)
        self.container = SurrogateContainer(mop, dtype, ac, self.scal,
                                            self.db_capacity,
                                            log_level=self.log_level)

        self.desc_cfg = resolve_descent_config(ac.descent_method)

        #: any black-box (pure_callback-bridged) user function present? When
        #: true, speculative true evaluations at discarded points must be
        #: runtime-gated: in unbatched solves they would otherwise physically
        #: invoke the user's expensive host code at points the reference
        #: never evaluates (round-2 advisor finding).
        self._any_host = any(f.host for g in mop.groups for f in g.fns)
        self.filter_mode = "dummy" if mop.m_ce + mop.m_ci == 0 else ac.filter_type
        self.f_dim = mop.m_obj if self.filter_mode == "strict" else 1
        self.has_constraints = mop.has_nl_constraints or mop.has_lin_constraints
        self.T = ac.resolved_trajectory_capacity()
        #: width of the per-iteration model-meta stamp block (0 unless
        #: ``save_model_meta`` — see TrajectoryState)
        self.MW = (self.container.train_stamp_len
                   if ac.save_model_meta else 0)
        # Criticality-loop fast-forward (perf, semantics-preserving): the
        # rebuilds inside the loop see the *unchanged* iterate radius
        # (``algorithm.jl:580``: ``update_surrogates!`` reads ``iter_data``
        # whose Delta is only set after the loop), so once a pass maps the
        # group states onto themselves the remaining passes are pure Delta
        # bookkeeping — valid only when no model's phase 1 consumes
        # randomness (round-4 ``use_max_points`` sampling re-keys per pass).
        from morbit_tpu.models.configs import RbfConfig as _RbfCfg
        self._crit_ff = not any(
            isinstance(g.cfg, _RbfCfg) and g.cfg.use_max_points
            for g in mop.groups)

    # ------------------------------------------------------------------ helpers
    def _lin_matrices(self, scal):
        """Linear constraints transformed to the scaled space of ``scal``
        (``transformed_linear_constraints``, ``AbstractMOPInterface.jl:476``)."""
        dtype = self.dtype
        inv_s = 1.0 / scal.scale
        A_eq_s = jnp.asarray(self.mop.A_eq, dtype) * inv_s[None, :]
        b_eq_s = jnp.asarray(self.mop.b_eq, dtype) + A_eq_s @ scal.offset
        A_ineq_s = jnp.asarray(self.mop.A_ineq, dtype) * inv_s[None, :]
        b_ineq_s = jnp.asarray(self.mop.b_ineq, dtype) + A_ineq_s @ scal.offset
        return A_eq_s, b_eq_s, A_ineq_s, b_ineq_s

    def _linear_values(self, x_s, scal):
        A_eq_s, b_eq_s, A_ineq_s, b_ineq_s = self._lin_matrices(scal)
        return A_eq_s @ x_s - b_eq_s, A_ineq_s @ x_s - b_ineq_s

    def _theta(self, st_or_vals):
        if isinstance(st_or_vals, SolverState):
            vals = (st_or_vals.l_e, st_or_vals.l_i, st_or_vals.c_e, st_or_vals.c_i)
        else:
            vals = st_or_vals
        return flt.compute_constraint_val(*vals)

    def _filter_objective(self, fx):
        mode = "max" if self.filter_mode in ("max", "dummy") else "strict"
        return flt.compute_objective_val(fx, mode)

    def _violation_zero(self, theta):
        """``constraint_violation_is_zero`` (``utilities.jl:335-342``)."""
        eps = jnp.finfo(self.dtype).eps
        return jnp.abs(theta) <= 10 * eps

    def _stamp(self, traj: TrajectoryState, x, fx, delta, rho, omega, steplength,
               it_stat, x_indices, groups=None) -> TrajectoryState:
        # capacity from the buffer, not self.T: staged-capacity runners
        # (parallel/multistart.py StagedMultistart) run early iterations on
        # an end-trimmed trajectory whose row bound covers the stage
        T = traj.data.shape[0]
        slot = jnp.clip(traj.count, 0, T - 1)
        ok = traj.count < T
        dt = traj.data.dtype
        sc = lambda v: jnp.asarray(v, dt).reshape((1,))
        parts = [
            jnp.asarray(x, dt), jnp.asarray(fx, dt), sc(delta), sc(rho),
            sc(omega), sc(steplength), sc(jnp.asarray(it_stat, jnp.int32)),
            jnp.asarray(x_indices, jnp.int32).astype(dt).reshape((-1,)),
        ]
        if self.MW:
            # per-group model training-set provenance (save_model_meta)
            parts.append(
                self.container.train_stamps(groups).astype(dt))
        row = jnp.concatenate(parts)
        # one-hot SELECT, not at[slot].set: a traced per-lane slot lowers
        # under vmap to a batched scatter that XLA serializes as a
        # while-loop over the batch (see dbm._onehot_write)
        hit = (jnp.arange(T) == slot) & ok
        data = jnp.where(hit[:, None], row[None, :], traj.data)
        return dataclasses.replace(traj, data=data, count=traj.count + 1)

    def _total_evals(self, groups):
        return sum(st.n_evals for st in groups)

    # -------------------------------------------------- criticality computation
    def _linearized_constraints_at(self, groups, x_s, x_n_s, l_e_n, l_i_n, scal):
        """Rows for the descent LP at x+n (``descent.jl:199-236``): true
        linear constraints with RHS -l(x_n); surrogate linearizations of the
        nonlinear constraints around x, shifted to x_n."""
        dtype = self.dtype
        n_step = x_n_s - x_s
        A_eq_s, _, A_ineq_s, _ = self._lin_matrices(scal)
        parts_Ae, parts_be = [A_eq_s], [-l_e_n]
        parts_Ai, parts_bi = [A_ineq_s], [-l_i_n]
        if self.mop.m_ce > 0:
            Dm_e = self.container.jac_nl_eq(groups, x_s, scal)
            m_e, _ = self.container.eval_nl_eq(groups, x_n_s, scal)
            parts_Ae.append(Dm_e)
            parts_be.append(-m_e - Dm_e @ n_step)
        if self.mop.m_ci > 0:
            Dm_i = self.container.jac_nl_ineq(groups, x_s, scal)
            m_i, _ = self.container.eval_nl_ineq(groups, x_n_s, scal)
            parts_Ai.append(Dm_i)
            parts_bi.append(-m_i - Dm_i @ n_step)

        def equilibrate(Arows, rhs):
            # Ruiz-style row equilibration (a mathematical no-op): OSQP —
            # the reference's LP backend (``globals.jl:13``) — scales the
            # problem data by default (Stellato et al. 2020, §5.1); our
            # fixed-budget ADMM inherits its sensitivity to row scale, and
            # constraint rows whose inf-norm is far from the unit
            # box/descent rows stall it (measured: an [8, 8] row from
            # unit-cube scaling of x1+x2<=1 on a [-4,4]^2 box left the
            # descent LP at omega=1.122 vs the true 1.105 at qp_iters=400;
            # exact after equilibration — tests/test_oracle_parity.py).
            r = jnp.max(jnp.abs(Arows), axis=1)
            r = jnp.where(r > 0, r, 1.0)
            return Arows / r[:, None], rhs / r

        A_eq, b_eq = equilibrate(jnp.concatenate(parts_Ae, axis=0),
                                 jnp.concatenate(parts_be))
        A_ineq, b_ineq = equilibrate(jnp.concatenate(parts_Ai, axis=0),
                                     jnp.concatenate(parts_bi))
        return LinearizedConstraints(A_eq=A_eq, b_eq=b_eq,
                                     A_ineq=A_ineq, b_ineq=b_ineq)

    def _get_criticality(self, groups, x_s, x_n_s, l_e_n, l_i_n, fx_n, delta,
                         scal):
        """``get_criticality`` dispatch (``descent.jl:19-25``).

        Returns ``(omega, payload, groups)`` where the payload is the descent
        direction for steepest descent, or the PS trial point; ``groups``
        carries the subsolver eval charges (PS only — the steepest-descent
        LP touches surrogate Jacobians, never the counted true functions)."""
        if isinstance(self.desc_cfg, SteepestDescentConfig):
            Dm = self.container.jac_objectives(groups, x_n_s, scal)
            lin = self._linearized_constraints_at(groups, x_s, x_n_s, l_e_n,
                                                  l_i_n, scal)
            d, omega = steepest_descent_direction(
                x_n_s, Dm, scal.lb_scaled, scal.ub_scaled, lin,
                normalize=self.desc_cfg.normalize, qp_iters=self.ac.qp_iters,
                qp_exit_eps=self.ac.qp_exit_eps)
            return omega, d, groups
        return self._ps_criticality(groups, x_s, x_n_s, fx_n, delta, scal)

    def _ps_criticality(self, groups, x_s, x_n_s, fx_n, delta, scal):
        """Pascoletti-Serafini descent (``descent.jl:512-581``).

        ``min t s.t. m(chi) <= m(x_n) + t*r`` over the local box with the
        surrogate/linear constraints. The NLopt :GN_ISRES global stage and
        local polish are replaced by a Halton-grid sweep + monotone projected
        gradient refinement on the penalized scalarization (surrogates are
        cheap and differentiable on device). Returns (omega = |t*|, x_trial,
        groups).

        Eval-count parity (``descent.jl:478-510``, ``:404-412``): in the
        reference the NLopt objective is the *container* surrogate, so for
        ``counts_on_eval`` groups (exact models) every subsolver call hits a
        ``CountedFunc``. The grid sweep + PGA polish here perform exactly
        the budgeted number of scalarization evaluations per solve
        (``ps_subsolver_budgets`` — the ``_ps_max_evals`` mapping), so those
        budgets are charged via ``charge_evals``: ``ps_grid + ps_polish`` for
        the PS solve plus ``m_obj * (ideal_grid + ideal_polish)`` when local
        ideal points are computed (no reference point/direction given)."""
        from morbit_tpu.core.descent import ps_subsolver_budgets
        from morbit_tpu.ops.boxopt import halton_grid, maximize_in_box

        cfg = self.desc_cfg
        dtype = self.dtype
        n = self.mop.n_vars
        lb_eff, ub_eff = (
            jnp.maximum(scal.lb_scaled, x_s - delta),
            jnp.minimum(scal.ub_scaled, x_s + delta))
        A_eq_s, b_eq_s, A_ineq_s, b_ineq_s = self._lin_matrices(scal)
        # subsolver eval caps (``_ps_max_evals``, ``descent.jl:414-432,527``)
        ps_grid_n, ps_polish, id_grid_n, id_polish = ps_subsolver_budgets(
            cfg, n)
        grid = halton_grid(ps_grid_n, n)
        ideal_grid = (grid if id_grid_n == ps_grid_n
                      else halton_grid(id_grid_n, n))

        def penalty(chi):
            pen = jnp.asarray(0.0, dtype)
            if self.mop.m_ce > 0:
                pen = pen + jnp.sum(
                    self.container.eval_nl_eq_raw(groups, chi, scal) ** 2)
            if self.mop.m_ci > 0:
                pen = pen + jnp.sum(jnp.maximum(
                    self.container.eval_nl_ineq_raw(groups, chi, scal), 0.0) ** 2)
            if self.mop.A_eq.shape[0]:
                pen = pen + jnp.sum((A_eq_s @ chi - b_eq_s) ** 2)
            if self.mop.A_ineq.shape[0]:
                pen = pen + jnp.sum(
                    jnp.maximum(A_ineq_s @ chi - b_ineq_s, 0.0) ** 2)
            return pen

        PEN_W = jnp.asarray(1e5, dtype)

        # objective-space direction (``_get_global_dir`` + local ideal point)
        charged = ps_grid_n + ps_polish
        if len(cfg.reference_direction):
            r = jnp.asarray(cfg.reference_direction, dtype)
        elif len(cfg.reference_point):
            r = fx_n - jnp.asarray(cfg.reference_point, dtype)
        else:
            charged += self.mop.m_obj * (id_grid_n + id_polish)
            ideals = []
            for l in range(self.mop.m_obj):
                f_l = lambda chi, l=l: -(self.container.eval_objectives_raw(
                    groups, chi)[l] + PEN_W * penalty(chi))
                _, v = maximize_in_box(f_l, lb_eff, ub_eff, ideal_grid,
                                       iters=id_polish)
                ideals.append(-v)
            r = fx_n - jnp.stack(ideals)

        mx = self.container.eval_objectives_raw(groups, x_n_s)

        def t_pure(chi):
            m = self.container.eval_objectives_raw(groups, chi)
            return jnp.max((m - mx) / r)

        def t_pen(chi):
            return -(t_pure(chi) + PEN_W * penalty(chi))

        x_best, neg_best = maximize_in_box(
            t_pen, lb_eff, ub_eff, grid, iters=ps_polish,
            extra_starts=x_n_s[None, :])
        tau = jnp.clip(t_pure(x_best), -1.0, 0.0)
        feasible = penalty(x_best) <= 1e-8

        critical = jnp.any(r <= 0)
        bad = critical | (~feasible) | (~jnp.all(jnp.isfinite(x_best)))
        x_trial = jnp.where(bad, x_n_s, x_best)
        omega = jnp.where(bad, 0.0, jnp.abs(tau))
        groups = self.container.charge_evals(groups, charged)
        return omega, x_trial, groups

    # ------------------------------------------------------------- initialization
    @_highest_matmul_precision
    def initialize(self, x0, populated_db=None) -> SolverState:
        """``initialize_data`` (``algorithm.jl:223-323``).

        ``populated_db`` recycles the evaluation databases of a previous run
        on the same problem (the reference's ``optimize(...; populated_db)``
        checkpoint/resume path, ``algorithm.jl:286-297``): pass a previous
        ``OptimizeResult``/``SolverState`` or group-state tuple. Eval counters
        reset (``reset_evals!``, ``algorithm.jl:237``); models are rebuilt."""
        mop = self.mop
        dtype = self.dtype
        x0 = jnp.asarray(x0, dtype)
        lb = jnp.asarray(mop.lb, dtype)
        ub = jnp.asarray(mop.ub, dtype)
        x = project_into_box(x0, lb, ub)
        x_s = scaling.transform(self.scal, x)

        groups = self.container.init_group_states()
        if populated_db is not None:
            prev = populated_db
            if isinstance(prev, OptimizeResult):
                prev = prev.state
            prev_scal = None
            if isinstance(prev, SolverState):
                prev_scal = prev.scal
                prev = prev.groups

            def ingest(old_db):
                """Re-transform an ingested database to the CURRENT scaler
                (``algorithm.jl:286-297`` + ``Databases.jl:300``): recycling
                into a run with different bounds/``var_scaler`` would
                otherwise misplace every stored site. Exact scaler equality
                short-circuits to the stored sites bit-identically (the
                round-trip arithmetic is not a float identity, and
                ``ensure_evaluated`` matches recycled rows by exact site
                equality). Raw group tuples carry no scaler — their sites
                are assumed to already be in the current scaled space."""
                if prev_scal is None:
                    return old_db
                new_db = dbm.rescale(old_db, prev_scal.scale,
                                     prev_scal.offset, self.scal.scale,
                                     self.scal.offset)
                same = (jnp.all(prev_scal.scale == self.scal.scale)
                        & jnp.all(prev_scal.offset == self.scal.offset))
                data = jnp.where(same, old_db.data, new_db.data)
                return dataclasses.replace(old_db, data=data)

            groups = tuple(
                fresh._replace(db=ingest(old.db))
                for fresh, old in zip(groups, prev))
        scal = self.scal
        fx, c_e, c_i, groups, x_indices = self.container.ensure_evaluated(
            groups, x_s, scal)
        l_e, l_i = self._linear_values(x_s, scal)
        delta0 = jnp.asarray(self.ac.delta_0, dtype)

        # dummy filter (no nonlinear constraints) carries NO buffers through
        # the solve loop — zero-capacity arrays are free
        filt = flt.init_filter(
            0 if self.filter_mode == "dummy"
            else self.ac.resolved_filter_capacity(),
            self.f_dim, dtype)

        T = self.T
        G = len(mop.groups)
        traj = TrajectoryState(
            data=jnp.zeros((T, mop.n_vars + mop.m_obj + 5 + G + self.MW),
                           dtype),
            count=jnp.asarray(0, jnp.int32),
            n=mop.n_vars, m=mop.m_obj, G=G, MW=self.MW,
        )
        traj = self._stamp(traj, x, fx, delta0, -jnp.inf, -jnp.inf, -jnp.inf,
                           ITER_TYPE.INITIALIZATION, x_indices, groups)

        # initial surrogates (``init_surrogates``; RBF defaults to
        # ensure_fully_linear=true on init, ``RbfModel.jl:506-513``)
        groups = self.container.update(groups, x_s, x_indices, delta0,
                                       ensure_fully_linear=True, scal=scal)

        ints = jnp.concatenate([
            jnp.asarray([1, ITER_TYPE.ACCEPTABLE, STOP_CODE.CONTINUE,
                         _MODE_NORMAL, 0], jnp.int32),
            jnp.asarray(x_indices, jnp.int32),
        ])
        return SolverState(
            x=x, x_s=x_s, fx=fx, l_e=l_e, l_i=l_i, c_e=c_e, c_i=c_i,
            dlt=jnp.stack([delta0, delta0]),
            ints=ints,
            groups=groups, filter=filt, traj=traj,
            scal=scal,
            key=jax.random.fold_in(
                jax.random.PRNGKey(1234),
                jnp.sum(jnp.abs(x_s * 1e6)).astype(jnp.uint32)),
        )

    # ------------------------------------------------------------------ stopping
    def _tol_tests(self, x, x_t, fx, fx_t):
        """Relative/absolute x/f stopping tests (``algorithm.jl:14-56``).

        Each tolerance may be a scalar (inf-norm test) or a vector
        (componentwise test), like the reference's ``Real``/``Vector``
        dispatch."""
        ac = self.ac
        inf_norm = lambda v: jnp.max(jnp.abs(v)) if v.shape[0] else jnp.asarray(0.0, self.dtype)

        def rel(test_v, ref_v, tol):
            if np.isscalar(tol):
                return inf_norm(test_v) <= tol * inf_norm(ref_v)
            # vector tolerance: all(|diff| <= tol .* ref) (``algorithm.jl:19``)
            t = jnp.asarray(tol, self.dtype)
            return jnp.all(jnp.abs(test_v) <= t * ref_v)

        def absolute(test_v, tol):
            if np.isscalar(tol):
                return inf_norm(test_v) <= tol
            return jnp.all(jnp.abs(test_v) <= jnp.asarray(tol, self.dtype))

        fr = rel(fx - fx_t, fx, ac.f_tol_rel)
        # vector x_tol_rel is componentwise absolute in the reference
        # (``algorithm.jl:30``)
        xr = (rel(x - x_t, x, ac.x_tol_rel) if np.isscalar(ac.x_tol_rel)
              else absolute(x - x_t, ac.x_tol_rel))
        fa = absolute(fx - fx_t, ac.f_tol_abs)
        xa = absolute(x - x_t, ac.x_tol_abs)
        return fr | xr | fa | xa

    def _omega_tests(self, omega, delta):
        """``ω_Δ_rel_test`` + ``ω_abs_test`` (``algorithm.jl:58-78``)."""
        ac = self.ac
        rel = (omega <= ac.omega_tol_rel) & (delta <= ac.delta_tol_rel)
        return rel | (omega <= ac.omega_tol_abs)

    # ------------------------------------------------------------- radius update
    def _apply_radius_update(self, update_code, delta, steplength):
        """``do_radius_update`` (``algorithm.jl:140-196``)."""
        ac = self.ac
        if ac.radius_update_method == "standard":
            grow = jnp.minimum(ac.delta_max, ac.gamma_grow * delta)
            shrink = delta * ac.gamma_shrink
            shrink_much = delta * ac.gamma_shrink_much
        else:  # 'steplength'
            grow = jnp.minimum(ac.delta_max, (ac.gamma_grow + steplength / delta) * delta)
            shrink = steplength * ac.gamma_shrink
            shrink_much = steplength * ac.gamma_shrink_much
        return jnp.select(
            [update_code == RADIUS_UPDATE.GROW,
             update_code == RADIUS_UPDATE.SHRINK,
             update_code == RADIUS_UPDATE.SHRINK_MUCH],
            [grow, shrink, shrink_much],
            delta,
        )

    # ------------------------------------------------------------ one iteration
    @_highest_matmul_precision
    def iterate(self, state: SolverState) -> SolverState:
        """``iterate!`` (``algorithm.jl:615-917``).

        One outer trip is either a NORMAL iteration or ONE criticality
        micro-step (``crit_mode > 0`` — one rebuild pass of
        ``criticality_routine``, ``algorithm.jl:553-596``); micro trips do
        not advance the iteration counter or stamp the trajectory."""
        ac = self.ac
        # pre-checks (``algorithm.jl:628-640``) apply at iteration START
        # only — mid-criticality trips use the routine's own per-pass
        # budget/count halts (``:563-573``)
        stop = jnp.where(
            state.iter_counter > ac.max_iter, STOP_CODE.MAX_ITER,
            jnp.where(
                self.container.budget_exhausted(state.groups),
                STOP_CODE.BUDGET_EXHAUSTED,
                jnp.where(state.delta <= ac.delta_tol_abs, STOP_CODE.TOLERANCE,
                          STOP_CODE.CONTINUE)))
        stop = jnp.where(state.crit_mode > _MODE_NORMAL, STOP_CODE.CONTINUE,
                         stop)
        return jax.lax.cond(
            stop == STOP_CODE.CONTINUE,
            self._iterate_inner,
            lambda s: s._replace(stop_code=stop.astype(jnp.int32)),
            state,
        )

    def _rescale_model(self, state: SolverState) -> SolverState:
        """:model scaler update: estimate new scaling factors from the
        surrogate Jacobian (``new_var_scaler``, ``VarScaler.jl:240-260``),
        retransform the databases and the iterate
        (``algorithm.jl:661-679``)."""
        old = state.scal
        J_comp = self.container.jac_all(state.groups, state.x_s, old)
        # Jf ~ Jm * d(transform)/dx = Jm diag(scale_old)
        J = J_comp * old.scale[None, :]
        lb = jnp.asarray(self.mop.lb, self.dtype)
        ub = jnp.asarray(self.mop.ub, self.dtype)
        new = scaling.estimate_linear_scaling_traced(
            J, lb, ub, np.isfinite(self.mop.lb) & np.isfinite(self.mop.ub))
        groups = tuple(
            st._replace(db=dbm.rescale(st.db, old.scale, old.offset,
                                       new.scale, new.offset))
            for st in state.groups)
        x_s = scaling.transform(new, state.x)
        l_e, l_i = self._linear_values(x_s, new)
        return state._replace(groups=groups, x_s=x_s, l_e=l_e, l_i=l_i,
                              scal=new)

    def _iterate_inner(self, state: SolverState) -> SolverState:
        ac = self.ac
        dtype = self.dtype
        in_crit = state.crit_mode > _MODE_NORMAL
        looping = state.crit_mode == _MODE_CRIT_LOOP

        if self.live_log:
            jax.debug.print(
                "| Iteration {i}: delta={d:.3e} evals={e} crit_mode={m} "
                "x={x} f={f}",
                i=state.iter_counter, d=state.delta,
                e=self._total_evals(state.groups), m=state.crit_mode,
                x=state.x, f=state.fx)

        # ---- per-iteration scaler update (``new_var_scaler`` + database
        # retransform, ``algorithm.jl:661-679``, ``VarScaler.jl:240-260``);
        # never mid-criticality (the routine sees one fixed scaling)
        if ac.var_scaler_update == "model":
            state = jax.lax.cond(
                (state.iter_counter > 1) & (~in_crit), self._rescale_model,
                lambda s: s, state)

        # ---- use_db = false: drop all history except the current iterate
        # (MockDB analogue, ``Databases.jl:11-32``; see
        # AlgorithmConfig.use_db). Once per ITERATION: criticality rebuild
        # micro-trips keep the working set their iteration compacted to.
        if not ac.use_db:
            groups0 = tuple(
                st._replace(db=jax.tree_util.tree_map(
                    lambda new, old: jnp.where(in_crit, old, new),
                    dbm.compact_to_row(st.db, state.x_indices[i]), st.db))
                for i, st in enumerate(state.groups))
            state = state._replace(
                groups=groups0,
                x_indices=jnp.where(
                    in_crit, state.x_indices,
                    jnp.where(state.x_indices >= 0, 0, -1)).astype(jnp.int32))

        x_s = state.x_s
        fx = state.fx
        scal = state.scal

        # ---- per-pass halt check of the criticality routine
        # (``algorithm.jl:563-573``): evaluated BEFORE the rebuild — a halted
        # pass performs (and charges) nothing
        crit_halt = looping & (
            (state.crit_nloops >= ac.max_critical_loops)
            | self.container.budget_exhausted(state.groups))
        # criticality fixpoint certificate inputs: db fill + eval counters
        # BEFORE this trip's pass (see the micro-step dispatch)
        pre_stats = tuple((st.db.count, st.n_evals) for st in state.groups)

        # ---- surrogate update (``algorithm.jl:682-688``); ONE shared
        # two-phase pipeline serves the normal update-vs-improve (traced
        # improve flag) AND the criticality rebuild (traced
        # ensure_fully_linear flag + per-pass key, ``update_surrogates!``
        # at ``algorithm.jl:575-579``), so criticality passes carry no
        # nested while_loop
        it_key = jax.random.fold_in(state.key, state.iter_counter)
        crit_key = jax.random.fold_in(state.key,
                                      7001 + state.crit_nloops)
        key = jnp.where(in_crit, crit_key, it_key)
        improve_flag = (~in_crit) & (
            state.last_it_stat == ITER_TYPE.MODELIMPROVING)
        do_update = jnp.where(in_crit, ~crit_halt, state.iter_counter > 1)

        groups = jax.lax.cond(
            do_update,
            lambda g: self.container.update_or_improve(
                g, x_s, state.x_indices, state.delta, improve_flag,
                scal=scal, key=key, efl_flag=in_crit),
            lambda g: g,
            state.groups,
        )
        state = state._replace(groups=groups)

        theta_k = self._theta(state)

        if self.has_constraints:
            return self._constrained_phase(state, theta_k, crit_halt,
                                           pre_stats)
        return self._main_phase(state, state, theta_k, theta_k, crit_halt,
                                pre_stats)

    # ---------------------------------------------------------------- phase A
    def _constrained_phase(self, state: SolverState, theta_k, crit_halt,
                           pre_stats) -> SolverState:
        """Normal step / restoration dispatch (``find_normal_step``,
        ``algorithm.jl:406-521``).

        TPU-first restructuring (round-2 roadmap "masked normal step"):
        the NL linearizations + normal-step QP run inside a 0/1-trip
        ``while_loop`` so feasible lanes skip them entirely under vmap, and
        ``_main_phase`` (criticality + trial — the expensive continuation)
        is invoked ONCE with per-lane-selected inputs instead of once per
        cond branch (a vmapped cond lowers to a select that executes both
        branches for the whole batch)."""
        ac = self.ac
        dtype = self.dtype
        n = self.mop.n_vars
        scal = state.scal
        need_normal = ~self._violation_zero(theta_k)

        # --- gated normal-step subproblem (``compute_normal_step``)
        def ns_cond(c):
            return c[0]

        def ns_body(c):
            lin = self._linearized_constraints_at(
                state.groups, state.x_s, state.x_s, state.l_e, state.l_i,
                scal)
            variable_radius = state.last_it_stat == ITER_TYPE.RESTORATION
            n_step, delta_n, feasible = normal_step(
                state.x_s, scal.lb_scaled, scal.ub_scaled, lin,
                ac.filter_kappa_delta, ac.delta_max, state.delta,
                variable_radius, qp_iters=ac.qp_iters,
                qp_exit_eps=ac.qp_exit_eps)
            return jnp.asarray(False), n_step, delta_n, feasible

        _, n_step, delta_n, feasible = jax.lax.while_loop(
            ns_cond, ns_body,
            (need_normal, jnp.zeros((n,), dtype), state.delta,
             jnp.asarray(True)))

        # compatibility test (``is_compatible``, ``algorithm.jl:131-137``)
        norm_n = jnp.max(jnp.abs(jnp.where(jnp.isnan(n_step), jnp.inf, n_step)))
        compatible_raw = feasible & (
            norm_n <= ac.filter_kappa_delta * delta_n
            * jnp.minimum(1.0, ac.filter_kappa_mu * delta_n ** ac.filter_mu))
        take_n = need_normal & compatible_raw
        if self.log_level >= 4:
            # ``Trying to find a normal step.`` + compatibility notice
            # (``algorithm.jl:412,504``)
            jax.debug.print(
                "|  Normal step: needed={d} |n|={n:.3e} feasible={f} "
                "compatible={c}", d=need_normal, n=norm_n, f=feasible,
                c=compatible_raw)

        # --- candidate bundle at x+n (``:461-514``); results are selected
        # per leaf against the stay-put bundle, reproducing the discard
        # semantics of the former cond branches
        changed = take_n & (~jnp.isclose(delta_n, state.delta))
        groups2 = jax.lax.cond(
            changed,
            lambda g: self.container.set_fully_linear(g, False),
            lambda g: g, state.groups)
        x_n_s = state.x_s + jnp.where(take_n, jnp.nan_to_num(n_step), 0.0)
        fx_n, c_e_n, c_i_n, groups3, idx_n = self._gated_evaluate_true(
            groups2, x_n_s, scal, state, active=take_n)
        l_e_n, l_i_n = self._linear_values(x_n_s, scal)
        state_b = state._replace(
            groups=groups3, delta=jnp.where(changed, delta_n, state.delta))
        inter_b = state_b._replace(
            x=scaling.untransform(scal, x_n_s), x_s=x_n_s, fx=fx_n,
            l_e=l_e_n, l_i=l_i_n, c_e=c_e_n, c_i=c_i_n, x_indices=idx_n)
        theta_n = self._theta(inter_b)

        sel = lambda b, a: jax.tree_util.tree_map(
            lambda x, y: jnp.where(take_n, x, y), b, a)
        state_sel = sel(state_b, state)
        inter_sel = sel(inter_b, state)
        theta_sel = jnp.where(take_n, theta_n, theta_k)

        out_main = self._main_phase(state_sel, inter_sel, theta_k, theta_sel,
                                    crit_halt, pre_stats)

        # --- incompatible path (restoration / INFEASIBLE, ``:440-493``)
        out_other = self._incompatible_path(state, theta_k, n_step, feasible,
                                            need_normal & (~compatible_raw))
        return jax.tree_util.tree_map(
            lambda o, m: jnp.where(need_normal & (~compatible_raw), o, m),
            out_other, out_main)

    def _gated_evaluate_true(self, groups, x_s, scal, state: SolverState,
                             active):
        """``container.evaluate_true`` that physically runs only when
        ``active`` — used for speculative candidate evaluations whose results
        are selected away on inactive lanes. Only gated (0/1-trip
        ``while_loop``) when a host=True black-box function exists: in
        unbatched solves the gate prevents real user-code calls at discarded
        points (the reference's ``lax.cond``-analogous skip); for pure-JAX
        problems the straight-line call is cheaper on TPU (while-loop
        boundaries pay alternate-memory copy stalls — CLAUDE.md perf
        notes)."""
        if not self._any_host:
            return self.container.evaluate_true(groups, x_s, scal)

        def body(carry):
            _, fx, c_e, c_i, g, idx = carry
            fx, c_e, c_i, g, idx = self.container.evaluate_true(
                groups, x_s, scal)
            return (jnp.asarray(False), fx, c_e, c_i, g, idx)

        init = (jnp.asarray(active), state.fx, state.c_e, state.c_i, groups,
                state.x_indices)
        _, fx, c_e, c_i, g, idx = jax.lax.while_loop(
            lambda c: c[0], body, init)
        return fx, c_e, c_i, g, idx

    def _incompatible_path(self, state: SolverState, theta_k, n_step,
                           feasible, active) -> SolverState:
        last_restoration = state.last_it_stat == ITER_TYPE.RESTORATION
        if self.mop.has_nl_constraints:
            return jax.lax.cond(
                last_restoration,
                lambda s: self._finish_early(s, STOP_CODE.INFEASIBLE),
                lambda s: self._restoration(s, theta_k, n_step,
                                            active & (~last_restoration)),
                state)
        # linearly constrained only: use n itself for restoration (``:447-452``)
        n_ok = feasible & jnp.all(jnp.isfinite(n_step))

        def linear_restoration(s):
            x_n_s = s.x_s + jnp.nan_to_num(n_step)
            fx_n, c_e_n, c_i_n, g3, idx_n = self.container.evaluate_true(
                s.groups, x_n_s, s.scal)
            l_e_n, l_i_n = self._linear_values(x_n_s, s.scal)
            nxt = s._replace(
                x=scaling.untransform(s.scal, x_n_s), x_s=x_n_s, fx=fx_n,
                l_e=l_e_n, l_i=l_i_n, c_e=c_e_n, c_i=c_i_n,
                groups=g3, x_indices=idx_n)
            return self._finish_restoration(nxt)

        return jax.lax.cond(
            n_ok & (~last_restoration),
            linear_restoration,
            lambda s: self._finish_early(s, STOP_CODE.INFEASIBLE),
            state)

    def _restoration(self, state: SolverState, theta_k, r_guess,
                     active=True) -> SolverState:
        """Nonlinear restoration (``restoration``, ``algorithm.jl:325-404``).

        The NLopt COBYLA solve on the true constraints is replaced by
        projected gradient descent with step halving on the squared-hinge
        constraint violation (smooth subgradients via autodiff; SURVEY.md §7
        hard part 4), honoring the reference's eval budget, its
        ``stopval`` early exit at theta-zero, and its counting semantics.
        The filter gets the current iterate as an entry first (``:470-471``).
        ``active`` marks batch elements actually restoring — under vmap the
        enclosing cond lowers to a select, and the while-condition below lets
        inactive elements skip the descent loop."""
        ac = self.ac
        dtype = self.dtype
        filt = flt.add_entry(state.filter, theta_k,
                             self._filter_objective(state.fx),
                             jnp.asarray(ac.filter_shift, dtype))
        state = state._replace(filter=filt)

        lb = jnp.asarray(self.mop.lb, dtype)
        ub = jnp.asarray(self.mop.ub, dtype)
        x = state.x

        # groups feeding nonlinear constraints (directly or through a
        # composite): the reference's restoration objective is constraint
        # violation ONLY (``algorithm.jl:355-362``) — objective groups are
        # never touched here
        con_roles = ("nl_eq", "nl_ineq")
        need_groups = {g.index for g in self.mop.groups
                       if any(mb.role in con_roles for mb in g.members)}
        con_comps = [cs for cs in self.mop.composites if cs.role in con_roles]
        need_groups |= {cs.group_index for cs in con_comps}

        def true_constraints(xi, want_jac=False):
            """True constraint blocks (and optionally their Jacobians) at an
            unscaled site, evaluating only constraint-relevant groups."""
            m_ce, m_ci, n = self.mop.m_ce, self.mop.m_ci, self.mop.n_vars
            c_e = jnp.zeros((m_ce,), dtype)
            c_i = jnp.zeros((m_ci,), dtype)
            J_e = jnp.zeros((m_ce, n), dtype)
            J_i = jnp.zeros((m_ci, n), dtype)
            vals, jacs = {}, {}
            for gi in sorted(need_groups):
                g = self.mop.groups[gi]
                vals[gi] = g.eval_unscaled(xi)
                if want_jac:
                    # host black-boxes get FD Jacobians inside
                    # ``VecFun.jacobian`` (``FiniteDiffWrapper`` analogue)
                    jacs[gi] = g.jac_unscaled(xi)
            for g in self.mop.groups:
                for mb in g.members:
                    if mb.role not in con_roles:
                        continue
                    tgt_v, tgt_J = ((c_e, J_e) if mb.role == "nl_eq"
                                    else (c_i, J_i))
                    part_v = vals[g.index][mb.group_offset:
                                           mb.group_offset + mb.n_out]
                    new_v = tgt_v.at[mb.global_offset:
                                     mb.global_offset + mb.n_out].set(part_v)
                    if mb.role == "nl_eq":
                        c_e = new_v
                    else:
                        c_i = new_v
                    if want_jac:
                        part_J = jacs[g.index][mb.group_offset:
                                               mb.group_offset + mb.n_out]
                        new_J = tgt_J.at[mb.global_offset:
                                         mb.global_offset + mb.n_out].set(part_J)
                        if mb.role == "nl_eq":
                            J_e = new_J
                        else:
                            J_i = new_J
            for cs in con_comps:
                inner = vals[cs.group_index][cs.group_offset:
                                             cs.group_offset + cs.width]
                part_v = jnp.atleast_1d(
                    jnp.asarray(cs.outer(xi, inner))).astype(dtype)
                if cs.role == "nl_eq":
                    c_e = c_e.at[cs.global_offset:
                                 cs.global_offset + cs.n_out].set(part_v)
                else:
                    c_i = c_i.at[cs.global_offset:
                                 cs.global_offset + cs.n_out].set(part_v)
                if want_jac:
                    # chain rule: d outer/dx + d outer/dg . J_inner
                    Jx = jnp.reshape(jax.jacfwd(
                        lambda xq: jnp.atleast_1d(jnp.asarray(
                            cs.outer(xq, inner))).astype(dtype))(xi),
                        (cs.n_out, n))
                    Jg = jnp.reshape(jax.jacfwd(
                        lambda gq: jnp.atleast_1d(jnp.asarray(
                            cs.outer(xi, gq))).astype(dtype))(inner),
                        (cs.n_out, cs.width))
                    J_in = jacs[cs.group_index][cs.group_offset:
                                                cs.group_offset + cs.width]
                    part_J = Jx + Jg @ J_in
                    if cs.role == "nl_eq":
                        J_e = J_e.at[cs.global_offset:
                                     cs.global_offset + cs.n_out].set(part_J)
                    else:
                        J_i = J_i.at[cs.global_offset:
                                     cs.global_offset + cs.n_out].set(part_J)
            l_e = jnp.asarray(self.mop.A_eq, dtype) @ xi - jnp.asarray(self.mop.b_eq, dtype)
            l_i = jnp.asarray(self.mop.A_ineq, dtype) @ xi - jnp.asarray(self.mop.b_ineq, dtype)
            if want_jac:
                return (l_e, l_i, c_e, c_i), (J_e, J_i)
            return l_e, l_i, c_e, c_i

        # smooth merit: squared hinge violations (differentiable a.e.)
        def merit(xi):
            l_e, l_i, c_e, c_i = true_constraints(xi)
            return (jnp.sum(c_e ** 2) + jnp.sum(jnp.maximum(c_i, 0.0) ** 2)
                    + jnp.sum(l_e ** 2) + jnp.sum(jnp.maximum(l_i, 0.0) ** 2))

        r0 = jnp.where(jnp.any(jnp.isnan(r_guess)), jnp.zeros_like(x),
                       jnp.nan_to_num(r_guess) / jnp.maximum(state.scal.scale, 1e-30))
        xi0 = project_into_box(x + r0, lb, ub)

        if self._any_host:
            # ``jax.grad`` cannot differentiate through ``pure_callback``;
            # assemble the merit gradient from the scattered constraint
            # Jacobians instead (host functions FD inside VecFun.jacobian):
            # grad = 2 (J_e' c_e + J_i' max(c_i,0) + A_eq' l_e + A_ineq' max(l_i,0))
            A_eq = jnp.asarray(self.mop.A_eq, dtype)
            A_ineq = jnp.asarray(self.mop.A_ineq, dtype)

            def grad(xi):
                (l_e, l_i, c_e, c_i), (J_e, J_i) = true_constraints(
                    xi, want_jac=True)
                return 2.0 * (J_e.T @ c_e + J_i.T @ jnp.maximum(c_i, 0.0)
                              + A_eq.T @ l_e + A_ineq.T @ jnp.maximum(l_i, 0.0))
        else:
            grad = jax.grad(merit)
        width = jnp.where(jnp.isfinite(ub - lb), ub - lb, 1.0)

        # budget (``algorithm.jl:370-384``): when ``max_restoration_evals > 0``
        # it caps the solve and evals are NOT counted (``dont_count!``);
        # otherwise the cap is min(500*n_vars, remaining budget of every
        # nl-constraint function) and the actual solver evals count. Each
        # descent iteration performs TWO true-constraint passes (one
        # gradient pass at the iterate, one candidate evaluation), so the
        # eval cap maps to ``cap // 2`` iterations.
        if ac.max_restoration_evals > 0:
            ev_cap = jnp.asarray(ac.max_restoration_evals, jnp.int32)
        else:
            ev_cap = jnp.asarray(500 * self.mop.n_vars, jnp.int32)
            for g, st in zip(self.mop.groups, state.groups):
                roles = {mb.role for mb in g.members}
                if "nl_eq" in roles or "nl_ineq" in roles:
                    gmax = min(ac.max_evals, g.max_evals, 2 ** 31 - 1)
                    ev_cap = jnp.minimum(
                        ev_cap, jnp.asarray(gmax, jnp.int32) - st.n_evals)
            ev_cap = jnp.maximum(ev_cap, 0)
        # chosen counting semantics (documented vs the reference's
        # derivative-free per-candidate counting): each descent iteration
        # performs TWO true-constraint passes, so the eval cap maps to
        # ``cap // 2`` iterations — floored at 1 whenever the reference's
        # COBYLA would still get its single objective call (ev_cap >= 1),
        # so a remaining budget of 1 does not silently disable restoration
        cap = jnp.where(ev_cap >= 1, jnp.maximum(ev_cap // 2, 1), 0)

        # ``stopval = _zero_for_constraints(theta_k)`` (``algorithm.jl:368``,
        # ``utilities.jl:335-338``): exit as soon as a theta-zero point is
        # found. The COBYLA solve is replaced by projected gradient descent
        # on the squared-hinge merit with step halving on non-decrease (the
        # ftol_rel=1e-3 convergence exit becomes step-scale collapse).
        stopval = 10 * jnp.finfo(dtype).eps

        def gd_cond(carry):
            i, xi, m_cur, sc, x_best, t_best, done = carry
            return (~done) & (i < cap) & jnp.asarray(active)

        def merit_and_theta(xi):
            """One true-constraint pass serving both the line-search merit
            and the theta bookkeeping (a separate call each would double
            the counted work)."""
            l_e, l_i, c_e, c_i = true_constraints(xi)
            m = (jnp.sum(c_e ** 2) + jnp.sum(jnp.maximum(c_i, 0.0) ** 2)
                 + jnp.sum(l_e ** 2) + jnp.sum(jnp.maximum(l_i, 0.0) ** 2))
            return m, flt.compute_constraint_val(l_e, l_i, c_e, c_i)

        def gd_body(carry):
            i, xi, m_cur, sc, x_best, t_best, done = carry
            g = grad(xi)
            gn = jnp.max(jnp.abs(g))
            step = jnp.where(gn > 0, sc * jnp.min(width) / gn, 0.0)
            xi_n = project_into_box(xi - step * g, lb, ub)
            m_n, t_n = merit_and_theta(xi_n)
            improved = m_n < m_cur
            xi = jnp.where(improved, xi_n, xi)
            m_cur = jnp.where(improved, m_n, m_cur)
            sc = jnp.where(improved, jnp.minimum(sc * 1.25, 0.5), sc * 0.5)
            better = t_n < t_best
            x_best = jnp.where(better, xi_n, x_best)
            t_best = jnp.minimum(t_best, t_n)
            done = (t_best <= stopval) | (sc < 1e-10)
            return i + 1, xi, m_cur, sc, x_best, t_best, done

        if self._any_host:
            # gate the pre-loop merit pass: inactive lanes (and unbatched
            # non-restoring runs) must not invoke host black-box constraints
            def mt_body(c):
                _, m, t = c
                m, t = merit_and_theta(xi0)
                return (jnp.asarray(False), m, t)

            big = jnp.asarray(jnp.inf, dtype)
            _, m0, t0 = jax.lax.while_loop(
                lambda c: c[0], mt_body, (jnp.asarray(active), big, big))
        else:
            m0, t0 = merit_and_theta(xi0)
        i_used, _, _, _, x_r, theta_r, _ = jax.lax.while_loop(
            gd_cond, gd_body,
            (jnp.asarray(0, jnp.int32), xi0, m0,
             jnp.asarray(0.1, dtype), xi0, t0, t0 <= stopval))

        # count the actual restoration true-constraint passes on
        # nl-constraint groups: two per descent iteration (gradient pass +
        # candidate evaluation), matching the work the solver really did —
        # like the reference's CountedFunc counting every COBYLA objective
        # call; suspended when max_restoration_evals > 0
        groups = state.groups
        if ac.max_restoration_evals <= 0:
            new_groups = []
            for g, st in zip(self.mop.groups, groups):
                roles = {mb.role for mb in g.members}
                if "nl_eq" in roles or "nl_ineq" in roles:
                    st = st._replace(n_evals=st.n_evals + 2 * i_used)
                new_groups.append(st)
            groups = tuple(new_groups)
            state = state._replace(groups=groups)

        if self.log_level >= 4:
            # ``Performing restoration for feasibility.`` + acceptance notice
            # (``algorithm.jl:470-482``)
            jax.debug.print(
                "|  Restoration: active={a} iters={i} theta_r={t:.3e}",
                a=active, i=i_used, t=theta_r)

        x_r_s = scaling.transform(state.scal, x_r)
        fx_r, c_e_r, c_i_r, groups, idx_r = self._gated_evaluate_true(
            state.groups, x_r_s, state.scal, state, active=jnp.asarray(active))
        l_e_r, l_i_r = self._linear_values(x_r_s, state.scal)
        acceptable = flt.is_acceptable(
            state.filter, theta_r, self._filter_objective(fx_r))

        def accept(s):
            nxt = s._replace(
                x=x_r, x_s=x_r_s, fx=fx_r, l_e=l_e_r, l_i=l_i_r,
                c_e=c_e_r, c_i=c_i_r, groups=groups, x_indices=idx_r)
            return self._finish_restoration(nxt)

        return jax.lax.cond(
            acceptable, accept,
            lambda s: self._finish_early(s._replace(groups=groups),
                                         STOP_CODE.INFEASIBLE),
            state)

    def _finish_restoration(self, state: SolverState) -> SolverState:
        """Stamp + return CONTINUE with it_stat=RESTORATION
        (``algorithm.jl:702-709``)."""
        traj = self._stamp(state.traj, state.x, state.fx, state.delta,
                           -jnp.inf, -jnp.inf, -jnp.inf, ITER_TYPE.RESTORATION,
                           state.x_indices, state.groups)
        return state._replace(
            traj=traj,
            last_it_stat=jnp.asarray(ITER_TYPE.RESTORATION, jnp.int32),
            iter_counter=state.iter_counter + 1,
        )

    def _finish_early(self, state: SolverState, code) -> SolverState:
        return state._replace(
            stop_code=jnp.asarray(code, jnp.int32),
            last_it_stat=jnp.asarray(ITER_TYPE.EARLY_EXIT, jnp.int32),
            iter_counter=state.iter_counter + 1,
        )

    # ---------------------------------------------------------------- main phase
    def _main_phase(self, state: SolverState, inter: SolverState,
                    theta_k, theta_n, crit_halt, pre_stats) -> SolverState:
        """Criticality + trial point + acceptance. ``state`` is the current
        iterate's bundle, ``inter`` is x+n's bundle (identical objects when
        no normal step was taken — and always on criticality micro-trips:
        entry requires theta_k ~ 0, so no normal step is ever taken
        there)."""
        in_crit = state.crit_mode > _MODE_NORMAL

        omega, d, groups_c = self._get_criticality(
            inter.groups, state.x_s, inter.x_s, inter.l_e, inter.l_i,
            inter.fx, state.delta, state.scal)
        # a halted criticality pass performs no work (``algorithm.jl:563-573``
        # halts BEFORE the pass): revert the (PS) subsolver charges for
        # halted lanes. omega/d recomputed on the unchanged groups reproduce
        # the previous pass's values exactly — the criticality computation
        # is a deterministic pure function of its (unchanged) inputs.
        groups_c = jax.tree_util.tree_map(
            lambda old, new: jnp.where(crit_halt, old, new),
            inter.groups, groups_c)
        # PS subsolver eval charges must flow into the continuing state
        # (state_sel/inter_sel share group leaves, so this is select-safe)
        state = state._replace(groups=groups_c)
        inter = inter._replace(groups=groups_c)

        theta_n_zero = self._violation_zero(theta_n)
        theta_k_zero = self._violation_zero(theta_k)

        # early CRITICAL exit (``algorithm.jl:728-732``) — iteration starts
        # only; micro-trips use the routine's own tolerance exits
        crit_exit = (~in_crit) & theta_n_zero & self._omega_tests(
            omega, state.delta)

        def early_exit(args):
            state, inter, omega, d = args
            # return iterate = x+n bundle
            out = inter._replace(delta=state.delta)
            return self._finish_early(out, STOP_CODE.CRITICAL)

        def continue_iter(args):
            state, inter, omega, d = args
            return self._crit_microstep(state, inter, theta_k, theta_n,
                                        theta_k_zero, omega, d, crit_halt,
                                        pre_stats)

        return jax.lax.cond(crit_exit, early_exit, continue_iter,
                            (state, inter, omega, d))

    def _crit_microstep(self, state, inter, theta_k, theta_n,
                        theta_k_zero, omega, d, halt, pre_stats):
        """``criticality_routine`` (``algorithm.jl:523-613``) as micro-steps
        of the OUTER solve loop — no nested model/db-carrying while_loop.

        Each criticality pass (the make-fully-linear pre-step ``:536-551``
        and every shrink-loop pass ``:553-596``) runs as one outer trip with
        ``crit_mode > 0``: the trip's shared model update performed the
        ``ensure_fully_linear`` rebuild at the loop-invariant iterate radius
        (``update_surrogates!`` reads ``iter_data`` whose Delta is only set
        after the loop, ``:575-579``), ``_get_criticality`` recomputed
        omega/d, and this dispatch applies the routine's control flow:
        entry (NORMAL trips), pre-step outcome (CRIT_PRE), per-pass shrink /
        budget halts / tolerance exits (CRIT_LOOP). Micro-trips carry only
        [mode, n_loops] in the packed ints and the shrinking local Delta in
        ``dlt[1]``; iter_counter and the trajectory do not advance until
        the routine finishes (frozen lanes return with stop=CONTINUE).

        Entering lanes are always feasible (``theta_k ~ 0`` is an entry
        requirement), so ``inter == state`` on every micro-trip — no x+n
        bundle needs carrying. Stabilized lanes (fixpoint certificate
        below) fast-forward the remaining Delta bookkeeping in a
        scalar-only while_loop and finish in the same trip."""
        if _ABLATE_CRIT == 1:
            # PROFILING-ONLY (MORBIT_ABLATE_CRIT=1): skip the criticality
            # dispatch — NOT reference semantics (``algorithm.jl:523-613``
            # never runs). Measurement hook (tools/profile_trip_fixed.py).
            return self._trial_point(state, inter, theta_k, omega, d)
        ac = self.ac
        dtype = self.dtype
        mu = jnp.asarray(ac.mu, dtype)
        beta = jnp.asarray(max(ac.beta, ac.mu), dtype)
        gamma_c = jnp.asarray(ac.gamma_crit, dtype)

        mode = state.crit_mode
        normal = mode == _MODE_NORMAL
        first = mode == _MODE_CRIT_PRE
        looping = mode == _MODE_CRIT_LOOP
        n_loops = state.crit_nloops
        delta0 = state.delta
        groups = inter.groups

        fully_lin = self.container.fully_linear(groups)

        # ---- NORMAL trips: entry decision (``algorithm.jl:536-551``;
        # ``Entered Criticallity Test.`` ``:534``)
        enter_crit = (normal & theta_k_zero & (omega <= ac.eps_crit)
                      & ((~fully_lin) | (delta0 > mu * omega)))
        enter_pre = enter_crit & (~fully_lin)    # pre-step pass pending
        # entry with fully linear models implies Delta > mu*omega (``:738``)
        enter_loop = enter_crit & fully_lin      # straight to the shrink loop
        if self.log_level >= 4:
            jax.debug.print(
                "|  Criticality test: mode={m} entered={e} omega={o:.3e} "
                "fully_linear={f}", m=mode, e=enter_crit, o=omega,
                f=fully_lin)

        # ---- CRIT_PRE trips: pre-step outcome (``:545-551``; the rebuild
        # already ran this trip). Loop only if the models became fully
        # linear and still critical; else "one last descent step".
        do_loops_pre = first & fully_lin & (delta0 > mu * omega)
        done_pre = first & (~(fully_lin & (delta0 > mu * omega)))

        # ---- CRIT_LOOP trips: one shrink pass ran this trip. The shrink
        # applies to the carried local copy only (the rebuild saw delta0).
        passed = looping & (~halt)
        delta_eff = jnp.where(passed, gamma_c * state.delta_loc,
                              state.delta_loc)
        n_loops_eff = jnp.where(passed, n_loops + 1, n_loops)
        # loop-phase tolerance/FL exits (``:585-595``)
        tol_exit = passed & (
            (delta_eff <= ac.delta_tol_abs)
            | self._omega_tests(omega, delta_eff) | (~fully_lin))
        if self.log_level >= 4:
            # ``(Criticality Test) Criticality loop N`` (``:561``)
            jax.debug.print(
                "|  (Criticality Test) pass {p}: active={a} "
                "delta_loc={dl:.3e} omega={o:.3e} fully_linear={f}",
                p=n_loops_eff, a=passed | first, dl=delta_eff, o=omega,
                f=fully_lin)

        # ---- fixpoint certificate: a pass that left every group database
        # untouched (same fill, same eval counters over append-only rows —
        # see ``dbm.add_site``) proves the NEXT pass is an identity: the
        # rebuild is a pure function of (db, x, delta0, scal) — the rebuild
        # radius is the loop-invariant iterate radius, the PRNG key is
        # unused when ``self._crit_ff``, and no family's update-path
        # ``prepare`` reads carried model state except idempotently (Taylor
        # keeps its stencil indices when the iterate hasn't moved). The
        # remaining passes are pure Delta bookkeeping, replayed by the
        # scalar-only fast-forward below. PS descent charges budget per
        # pass, so its counters never certify — correct, its passes are
        # never free.
        stable = jnp.asarray(False)
        if self._crit_ff:
            stable = passed | do_loops_pre
            for (cnt0, nev0), st in zip(pre_stats, groups):
                stable = stable & (cnt0 == st.db.count) & (nev0 == st.n_evals)

        # ``while all(Delta > mu*omega)`` (``:560``) for the NEXT pass
        would_cont = delta_eff > mu * omega
        cont_pre = do_loops_pre & (~stable)
        cont_loop = passed & (~tol_exit) & would_cont & (~stable)
        freeze = enter_pre | enter_loop | cont_pre | cont_loop

        # ---- Delta-only fast-forward for stabilized lanes (small scalar
        # carry — the one while_loop this routine keeps): same ordering as
        # a real pass — budget/count halt first, then shrink, then the
        # tolerance/FL exits with the fixed omega.
        ff_act = stable & (~tol_exit) & (do_loops_pre | passed)
        budget_x = self.container.budget_exhausted(groups)

        def ff_cond(c):
            delta_l, nl, exit_c, done = c
            return (~done) & (delta_l > mu * omega)

        def ff_body(c):
            delta_l, nl, exit_c, done = c
            stop_now = (nl >= ac.max_critical_loops) | budget_x
            delta_n = jnp.where(stop_now, delta_l, gamma_c * delta_l)
            nl_n = jnp.where(stop_now, nl, nl + 1)
            t_exit = (~stop_now) & (
                (delta_n <= ac.delta_tol_abs)
                | self._omega_tests(omega, delta_n) | (~fully_lin))
            return (delta_n, nl_n, exit_c | stop_now | t_exit,
                    done | stop_now | t_exit)

        delta_fin, _, exit_ff, _ = jax.lax.while_loop(
            ff_cond, ff_body,
            (delta_eff, n_loops_eff, jnp.asarray(False), ~ff_act))

        # ---- finishing lanes: Delta update only applies when shrink loops
        # were entered (``:605``)
        did_loops = looping | do_loops_pre
        exit_c = halt | tol_exit | exit_ff
        delta_new = jnp.where(
            did_loops,
            jnp.minimum(delta0, jnp.maximum(beta * omega, delta_fin)),
            delta0)
        exit_critical = did_loops & exit_c

        new_mode = jnp.where(
            enter_pre, _MODE_CRIT_PRE,
            jnp.where(enter_loop | cont_pre | cont_loop, _MODE_CRIT_LOOP,
                      _MODE_NORMAL)).astype(jnp.int32)
        new_nloops = jnp.where(enter_crit, 0, n_loops_eff)
        new_delta_loc = jnp.where(enter_crit, delta0, delta_eff)

        def frozen_branch(args):
            state, inter, omega, d = args
            # micro-step continues next trip: no stamp, no iteration
            # advance, stop stays CONTINUE; only the crit bookkeeping moves
            return inter._replace(
                crit_mode=new_mode, crit_nloops=new_nloops,
                delta_loc=new_delta_loc)

        def finish_branch(args):
            state, inter, omega, d = args
            state_f = state._replace(delta=delta_new, crit_mode=0,
                                     crit_nloops=0)
            inter_f = inter._replace(delta=delta_new, crit_mode=0,
                                     crit_nloops=0)

            def crit_exit_branch(a):
                s, i, om, dd = a
                return self._finish_early(i, STOP_CODE.CRITICAL)

            def trial_branch(a):
                s, i, om, dd = a
                return self._trial_point(s, i, theta_k, om, dd)

            return jax.lax.cond(exit_critical, crit_exit_branch,
                                trial_branch, (state_f, inter_f, omega, d))

        return jax.lax.cond(freeze, frozen_branch, finish_branch,
                            (state, inter, omega, d))

    # ------------------------------------------------------------- trial point
    def _trial_point(self, state, inter, theta_k, omega, d):
        """Descent step, true evaluation, acceptance tests, radius update
        (``algorithm.jl:748-914``)."""
        ac = self.ac
        dtype = self.dtype
        x_s = state.x_s
        x_n_s = inter.x_s
        groups = inter.groups

        # ---- trial point from the descent payload
        if isinstance(self.desc_cfg, SteepestDescentConfig):
            # initial stepsize + backtracking (``compute_descent_step``);
            # with constraints and delta_max > 1 the sigma search also
            # intersects the linearized constraint rows along x_n + sigma*d
            # (``descent.jl:276-292``)
            con_vals = con_dirs = con_rhs = None
            if self.has_constraints and ac.delta_max > 1.0:
                scal0 = state.scal
                A_eq_s, b_eq_s, A_ineq_s, b_ineq_s = self._lin_matrices(scal0)
                n_step = x_n_s - x_s
                vals, dirs, rhs = [], [], []
                if A_ineq_s.shape[0]:
                    vals.append(A_ineq_s @ x_n_s)
                    dirs.append(A_ineq_s @ d)
                    rhs.append(b_ineq_s)
                if A_eq_s.shape[0]:
                    ve, de_, re = A_eq_s @ x_n_s, A_eq_s @ d, b_eq_s
                    vals += [ve, -ve]
                    dirs += [de_, -de_]
                    rhs += [re, -re]
                if self.mop.m_ci > 0:
                    Dm_i = self.container.jac_nl_ineq(groups, x_s, state.scal)
                    m_i = self.container.eval_nl_ineq_raw(groups, x_s,
                                                          state.scal)
                    vals.append(m_i + Dm_i @ n_step)
                    dirs.append(Dm_i @ d)
                    rhs.append(jnp.zeros_like(m_i))
                if self.mop.m_ce > 0:
                    Dm_e = self.container.jac_nl_eq(groups, x_s, state.scal)
                    m_e = self.container.eval_nl_eq_raw(groups, x_s,
                                                        state.scal)
                    ve = m_e + Dm_e @ n_step
                    de_ = Dm_e @ d
                    vals += [ve, -ve]
                    dirs += [de_, -de_]
                    rhs += [jnp.zeros_like(m_e), jnp.zeros_like(m_e)]
                if vals:
                    con_vals = jnp.concatenate(vals)
                    con_dirs = jnp.concatenate(dirs)
                    con_rhs = jnp.concatenate(rhs)
            sigma = initial_stepsize(x_s, x_n_s, d, state.delta,
                                     state.scal.lb_scaled, state.scal.ub_scaled,
                                     dtype, con_vals, con_dirs, con_rhs)
            scal = state.scal

            def eval_mx(groups, xq):
                return self.container.eval_objectives(groups, xq, scal)

            def eval_mx_batch(groups, X, k_used):
                if X is not None:
                    return self.container.eval_objectives_batch(groups, X, scal), groups
                # objectives_only: the sequential Armijo loop evaluates only
                # the objective surrogates (``descent.jl:150-185``)
                return None, self.container.charge_evals(groups, k_used,
                                                         objectives_only=True)

            x_trial_s, mx_trial_bt, step, groups = backtrack(
                x_n_s, d, sigma, omega, eval_mx, groups, self.desc_cfg,
                eval_mx_batch=eval_mx_batch)
            # degenerate stepsize -> stay (``descent.jl:312-317``)
            usable = sigma > self.desc_cfg.min_stepsize
            x_trial_s = jnp.where(usable, x_trial_s, x_n_s)
            omega = jnp.where(usable, omega, 0.0)
        else:
            # Pascoletti-Serafini: the criticality payload IS the trial point
            # (``compute_descent_step`` fallback, ``descent.jl:36-41``)
            x_trial_s = d

        x_trial = scaling.untransform(state.scal, x_trial_s)

        # ---- true evaluation at trial point (``algorithm.jl:760-764``)
        fx_t, c_e_t, c_i_t, groups, idx_t = self.container.evaluate_true(
            groups, x_trial_s, state.scal)
        l_e_t, l_i_t = self._linear_values(x_trial_s, state.scal)

        # ---- fresh surrogate values at x and x_trial (``:766-767``)
        mx, groups = self.container.eval_objectives(groups, x_s, state.scal)
        mx_t, groups = self.container.eval_objectives(groups, x_trial_s, state.scal)

        theta_t = flt.compute_constraint_val(l_e_t, l_i_t, c_e_t, c_i_t)
        f_t_filter = self._filter_objective(fx_t)
        steplength = jnp.max(jnp.abs(x_s - x_trial_s))

        # ---- acceptance tests (``:779-863``)
        shift = jnp.asarray(ac.filter_shift, dtype)
        if self.filter_mode == "dummy":
            acceptable_filter = jnp.asarray(True)
        else:
            acceptable_filter = flt.is_acceptable_vs(
                state.filter, theta_t, f_t_filter, theta_k,
                self._filter_objective(state.fx), shift)

        if ac.strict_acceptance_test:
            denom = mx - mx_t
            any_zero = jnp.any(denom == 0)
            rho_raw = jnp.min((state.fx - fx_t) / jnp.where(denom == 0, 1.0, denom))
            rho_raw = jnp.where(any_zero, jnp.nan, rho_raw)
        else:
            denom = (jnp.max(mx) - jnp.max(mx_t))[None]
            rho_raw = (jnp.max(state.fx) - jnp.max(fx_t)) / denom[0]
        good_decrease = acceptable_filter & jnp.all(
            denom >= ac.filter_kappa_psi * theta_k ** ac.filter_psi)
        rho_raw = jnp.where(acceptable_filter, rho_raw, jnp.nan)
        rho = jnp.where(jnp.isnan(rho_raw), -jnp.inf, rho_raw)

        fully_lin = self.container.fully_linear(groups)
        nu_s, nu_a = ac.nu_success, ac.nu_accept

        # classification tree (``:820-863``)
        IT = ITER_TYPE
        RU = RADIUS_UPDATE
        cls_success = (rho >= nu_s)
        it_stat = jnp.where(
            acceptable_filter,
            jnp.where(
                good_decrease,
                jnp.where(
                    cls_success, IT.SUCCESSFULL,
                    jnp.where(
                        fully_lin,
                        jnp.where(rho >= nu_a, IT.ACCEPTABLE, IT.INACCEPTABLE),
                        IT.MODELIMPROVING)),
                IT.FILTER_ADD),
            IT.FILTER_FAIL).astype(jnp.int32)
        accept = jnp.where(
            acceptable_filter,
            jnp.where(
                good_decrease,
                jnp.where(
                    cls_success, True,
                    jnp.where(fully_lin, rho >= nu_a, False)),
                True),
            False)
        radius_update = jnp.where(
            acceptable_filter,
            jnp.where(
                good_decrease,
                jnp.where(
                    cls_success,
                    jnp.where(state.delta < jnp.asarray(max(ac.beta, ac.mu), dtype)
                              * omega, RU.GROW, RU.LEAVE_UNCHANGED),
                    jnp.where(
                        fully_lin,
                        jnp.where(rho >= nu_a, RU.SHRINK, RU.SHRINK_MUCH),
                        RU.LEAVE_UNCHANGED)),
                jnp.where(cls_success, RU.GROW, RU.LEAVE_UNCHANGED)),
            RU.SHRINK_MUCH).astype(jnp.int32)

        # ---- filter add (``:875-877``)
        if self.filter_mode != "dummy":
            filt = jax.lax.cond(
                it_stat == IT.FILTER_ADD,
                lambda f: flt.add_entry(f, theta_t, f_t_filter, shift),
                lambda f: f, state.filter)
        else:
            filt = state.filter

        delta_new = self._apply_radius_update(radius_update, state.delta, steplength)

        # ---- next iterate (``:881-888``)
        w = lambda a, b: jnp.where(accept, a, b)
        next_state = inter._replace(
            x=w(x_trial, inter.x),
            x_s=w(x_trial_s, inter.x_s),
            fx=w(fx_t, inter.fx),
            l_e=w(l_e_t, inter.l_e), l_i=w(l_i_t, inter.l_i),
            c_e=w(c_e_t, inter.c_e), c_i=w(c_i_t, inter.c_i),
            x_indices=jnp.where(accept, idx_t, inter.x_indices),
            delta=delta_new,
            groups=groups,
            filter=filt,
        )

        if self.log_level >= 4:
            # acceptance summary (``algorithm.jl:890-897``)
            jax.debug.print(
                "|  Acceptance: it_stat={s} rho={r:.3e} omega={o:.3e} "
                "steplength={l:.3e} accept={a} delta->{d:.3e}",
                s=it_stat, r=rho, o=omega, l=steplength, a=accept, d=delta_new)

        # ---- stamp (``:899-903``)
        traj = self._stamp(next_state.traj, next_state.x, next_state.fx,
                           delta_new, rho, omega, steplength, 0,
                           next_state.x_indices, next_state.groups)
        it_col = traj.n + traj.m + 4
        # one-hot row select at the traced per-lane slot (see _stamp)
        T_loc = traj.data.shape[0]
        row_hit = jnp.arange(T_loc) == jnp.clip(traj.count - 1, 0,
                                                T_loc - 1)
        col_new = jnp.where(row_hit, jnp.asarray(it_stat, traj.data.dtype),
                            traj.data[:, it_col])
        traj = dataclasses.replace(
            traj, data=traj.data.at[:, it_col].set(col_new))
        next_state = next_state._replace(traj=traj)

        # ---- stopping tests (``:868-872`` + ``:905-914``)
        stepnorm_stop = (~accept) & (steplength <= ac.stepnorm_tol_abs)
        tol_stop = accept & self._tol_tests(state.x, x_trial, state.fx, fx_t)
        stop_code = jnp.where(
            stepnorm_stop | tol_stop, STOP_CODE.TOLERANCE, STOP_CODE.CONTINUE)

        return next_state._replace(
            stop_code=stop_code.astype(jnp.int32),
            last_it_stat=it_stat,
            iter_counter=state.iter_counter + 1,
        )

    # ---------------------------------------------------------------- top level
    @_highest_matmul_precision
    def solve_from_state(self, state: SolverState) -> SolverState:
        # NOTE (round 3): generically shape-packing the carry (stacking
        # same-shaped small leaves to cut per-buffer boundary copy stalls)
        # measured a consistent NET REGRESSION here and on the criticality
        # loop (8.2-8.3k -> 7.4-7.9k runs/s at the bench config) — the
        # re-stack each trip defeats XLA's aliased in-place updates.
        return jax.lax.while_loop(
            lambda s: s.stop_code == STOP_CODE.CONTINUE,
            self.iterate,
            state,
        )

    def solve(self, x0) -> OptimizeResult:
        state = self.initialize(x0)
        state = self.solve_from_state(state)
        return OptimizeResult(
            x=state.x, fx=state.fx, stop_code=state.stop_code,
            n_iterations=state.iter_counter - 1,
            n_evals=self._total_evals(state.groups),
            state=state,
        )


def initialize_state(mop, x0, algo_config=None, dtype=jnp.float64):
    if isinstance(mop, MOP):
        mop = compile_mop(mop, (algo_config or AlgorithmConfig()).combine_models)
    solver = Solver(mop, algo_config, dtype)
    return solver, solver.initialize(jnp.asarray(x0, dtype))


def optimize(mop, x0, algo_config: Optional[AlgorithmConfig] = None,
             dtype=jnp.float64, jit: bool = True, populated_db=None,
             verbosity: int = 0, **kwargs) -> OptimizeResult:
    """``optimize(mop, x0; ...)`` (``algorithm.jl:919-958``).

    Extra keyword arguments are promoted into the config like the
    reference's kwargs-to-config path (``algorithm.jl:198-221``).
    ``populated_db`` recycles a previous run's databases. ``verbosity`` maps
    to the reference's ``loglevel1..4`` ladder (``custom_logging.jl:18-66``):
    ``>= 1`` final report, ``>= 2`` per-iteration replay (host-side, from the
    stamped trajectory), ``>= 3`` live per-iteration banner from inside the
    jitted loop, ``>= 4`` live criticality-test / normal-step / restoration /
    acceptance progress, ``>= 5`` live model-build internals per group."""
    if algo_config is None:
        algo_config = AlgorithmConfig(**kwargs)
    elif kwargs:
        algo_config = dataclasses.replace(algo_config, **kwargs)
    cmop = mop if isinstance(mop, CompiledMOP) else compile_mop(
        mop, algo_config.combine_models)
    solver = Solver(cmop, algo_config, dtype, x0_hint=x0,
                    log_level=verbosity)

    if populated_db is None:
        def full(x0):
            return solver.solve_from_state(solver.initialize(x0))
        fn = jax.jit(full) if jit else full
        state = fn(jnp.asarray(x0, dtype))
    else:
        def full(x0, prev):
            return solver.solve_from_state(solver.initialize(x0, prev))
        fn = jax.jit(full) if jit else full
        state = fn(jnp.asarray(x0, dtype), populated_db)

    if algo_config.untransform_final_database:
        # return databases in unscaled coordinates
        # (``untransform!(super_db, scal)``, ``algorithm.jl:952-954``); the
        # returned state's scaler becomes the identity so recycling via
        # ``populated_db`` re-transforms the sites correctly
        ones = jnp.ones_like(state.scal.scale)
        zeros = jnp.zeros_like(state.scal.offset)
        state = state._replace(
            groups=tuple(
                st._replace(db=dbm.rescale(st.db, state.scal.scale,
                                           state.scal.offset, ones, zeros))
                for st in state.groups),
            scal=scaling.VarScaler(
                scale=ones, offset=zeros,
                lb_scaled=jnp.asarray(cmop.lb, dtype),
                ub_scaled=jnp.asarray(cmop.ub, dtype)))

    result = OptimizeResult(
        x=state.x, fx=state.fx, stop_code=state.stop_code,
        n_iterations=state.iter_counter - 1,
        n_evals=solver._total_evals(state.groups),
        state=state,
    )
    if verbosity >= 1:
        from morbit_tpu.utils.logging import print_report
        print_report(result, verbosity=verbosity)
    return result
