"""Surrogate model interface (functional, static-shape).

The reference's 2-phase surrogate protocol (``AbstractSurrogateInterface.jl:
25-79``: ``prepare_init_model``/``prepare_update_model`` enqueue unevaluated
database sites, ``eval_missing!`` batch-evaluates, ``init/update/improve_model``
fit) becomes a set of pure functions per model family operating on immutable
state pytrees:

    prepare(state, db, ctx)        -> (state, db)   # phase 1: enqueue sites
    fit(state, db, ctx)            -> state          # phase 2: fit from db
    prepare_improve(state, db, ctx)-> (state, db)
    eval(state, x_s)               -> (m,)
    jac(state, x_s)                -> (m, n)
    fully_linear(state)            -> bool array

An ops object is constructed per group at compile time and closes over all
static metadata (config, group functions, scaler, algorithm config).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ModelContext(NamedTuple):
    """Traced per-iteration inputs to the model build."""

    x_s: jax.Array      # (n,) current iterate, scaled
    x_index: jax.Array  # int32 — row of the iterate in this group's database
    delta: jax.Array    # scalar trust-region radius
    n_evals: jax.Array  # int32 — group eval counter (for round-3 budgets)
    scal: object        # VarScaler — current variable scaling (lives in state
                        # so per-iteration rescaling stays on device)
    key: jax.Array      # PRNG key (round-4 use_max_points random sampling)


class SurrogateOps:
    """Base class; subclasses implement the protocol above."""

    #: True if evaluating the *model* consumes true-function budget
    #: (only the exact model: ``ExactModel`` forwards to the counted
    #: function, ``src/models/ExactModel.jl:22-119``).
    counts_on_eval: bool = False

    #: static bound on new (unevaluated) sites one prepare/improve call can
    #: add — lets eval_missing evaluate only a tail window of the database
    eval_window: int = 1

    #: static length of :meth:`train_stamp` (0 = family has no per-model
    #: training-set provenance to save; RBF overrides)
    train_stamp_len: int = 0

    def train_stamp(self, model):
        """Per-iteration training-set provenance as a flat int32 vector
        (``[n_train, db row indices...]`` for families that track one) —
        the model part of the reference's ``IterSaveable``
        (``RbfModel.jl:162-175``, ``IterDataIterSaveable.jl:189-216``)."""
        return jnp.zeros((0,), jnp.int32)

    def __init__(self, group, n_vars: int, dtype, ac, scal):
        self.group = group
        self.cfg = group.cfg
        self.n_vars = n_vars
        self.dtype = dtype
        self.ac = ac
        self.scal = scal

    # default no-op implementations (exact model)
    def init_state(self):
        raise NotImplementedError

    def prepare(self, state, db, ctx: ModelContext, ensure_fully_linear: bool):
        return state, db

    def fit(self, state, db, ctx: ModelContext):
        return state

    def prepare_improve(self, state, db, ctx: ModelContext):
        return state, db

    def eval(self, state, x_s, scal=None):
        raise NotImplementedError

    def jac(self, state, x_s, scal=None):
        raise NotImplementedError

    def fully_linear(self, state):
        raise NotImplementedError

    def set_fully_linear(self, state, val):
        return state

    # ---- criticality-loop carry splitting (perf; see
    # ``Solver._criticality_and_trial``). ``fit`` recomputes the fitted
    # coefficients as a pure function of (meta, db, ctx), so the fitted part
    # does not need to cross while-loop boundaries (TPU alternate-memory
    # copy stalls are per carried buffer — CLAUDE.md perf notes).
    def split_fit(self, model):
        """(meta, fitted): split the model into the part that must be
        carried through the criticality rebuild loop (inputs of
        prepare/improve and the fixpoint test) and the refittable part.
        Default: everything is meta (nothing saved)."""
        return model, None

    def with_placeholder_fit(self, meta):
        """Rebuild a structurally valid model from carried meta with a
        placeholder fitted part; callers must re-run ``fit`` before
        evaluating the model."""
        return meta

    def attach_fit(self, meta, fitted):
        """Inverse of :meth:`split_fit`."""
        return meta
