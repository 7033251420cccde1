"""Eval-count audits: pin budget semantics per model family.

The reference counts true evaluations per function via ``CountedFunc``
(``src/globals.jl:74-112``, ``num_evals!``); exact-model groups also count
every *model* evaluation (the model IS the counted function,
``src/models/ExactModel.jl:22-119``). These tests pin that machinery two
ways on a fixed 3-iteration scripted run (two-parabolas, f64, the golden
start):

1. an **invariant**: for database-backed families every counted evaluation
   corresponds to exactly one evaluated database row (true evals all flow
   through ``dbm.eval_missing``/``add_evaluated`` — no phantom charges, no
   uncounted physical evals);
2. a **locked integer** per family: the exact counter value, so any change
   to charging rules (backtracking ladder, criticality rebuilds, PS
   budgets, exact-model model-eval counting) shows up as a diff the way
   trajectory locks pin geometry.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.mop import MOP, compile_mop
from morbit_tpu.models.configs import (
    ExactConfig,
    LagrangeConfig,
    RbfConfig,
    TaylorConfig,
)
from morbit_tpu.utils.logging import function_eval_counts

X0 = jnp.array([-3.141592653589793, 2.71828])


def _run(cfg, **kw):
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    if isinstance(cfg, ExactConfig):
        mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
        mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    else:
        mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
        mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    res = optimize(mop, X0, max_iter=3, **kw)
    return res, compile_mop(mop)


def _db_evaluated_rows(group):
    db = group.db
    valid = np.arange(db.data.shape[0]) < int(db.count)
    return int(np.sum(np.asarray(db.evaluated) & valid))


# (config, locked per-group counter, locked db evaluated rows)
# Derivations (counting rules as in the reference):
# * rbf 6       = 1 (x0) + 2 (initial round-3 build adds n=2 sites) +
#                 3 trial-point evaluations (one per iteration; later
#                 rebuilds reuse database rows).
# * taylor2 40  = 13-site degree-2 FD stencil (cfd1 x cfd1 compose at n=2:
#                 1 center + 4 first-order + 8 cross sites) at init, then
#                 stencil re-evals around accepted centers + trial evals.
# * taylor1 16  = 5-site cfd1 stencil (center + 2n) at init + re-evals +
#                 trials.
# * lagrange1 13 = n+1 poised set at init + per-iteration re-poising +
#                 trials.
# * exact 20    = 4 true evaluations (x0 + 3 trials, = db rows) + 16 model
#                 evaluations (descent backtracking charges + acceptance
#                 tests), counted because the exact "model" is the counted
#                 function itself (``ExactModel.jl``; ``descent.jl:478-510``).
CASES = [
    ("rbf", RbfConfig(kernel="multiquadric"), 6, 6),
    ("taylor_fd2", TaylorConfig(degree=2, mode="fd"), 40, 40),
    ("taylor_fd1", TaylorConfig(degree=1, mode="fd"), 16, 16),
    ("lagrange1", LagrangeConfig(degree=1), 13, 13),
    ("exact", ExactConfig(), 20, 4),
]


@pytest.mark.parametrize("name,cfg,n_evals,db_rows",
                         CASES, ids=[c[0] for c in CASES])
def test_eval_count_audit(name, cfg, n_evals, db_rows):
    res, cmop = _run(cfg)
    assert int(res.n_iterations) == 3
    for g in res.state.groups:
        assert int(g.n_evals) == n_evals
        assert _db_evaluated_rows(g) == db_rows
        if not isinstance(cfg, ExactConfig):
            # invariant: counted evals == evaluated db rows exactly
            assert int(g.n_evals) == _db_evaluated_rows(g)
        else:
            # exact groups charge model evaluations on top of true evals
            assert int(g.n_evals) > _db_evaluated_rows(g)
    # per-FUNCTION counters mirror the group counters (CountedFunc view)
    assert function_eval_counts(res, cmop) == [n_evals, n_evals]
