"""Pascoletti-Serafini subsolver eval-count parity.

Reference: ``src/descent.jl:478-510`` — the NLopt objective of the PS solve
is the *container* surrogate, so for ``ExactConfig`` groups every subsolver
call hits the counted true function (``CountedFunc``, ``globals.jl:74-112``);
``:404-412`` — the per-objective local ideal-point solves count the same
way. The budgets are the ``_ps_max_evals`` mapping (``descent.jl:414-432``).
"""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import Solver, optimize
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.descent import (
    PascolettiSerafiniConfig,
    ps_subsolver_budgets,
)
from morbit_tpu.core.enums import STOP_CODE
from morbit_tpu.core.mop import MOP, compile_mop
from morbit_tpu.models.configs import ExactConfig, RbfConfig


def _mop(cfg):
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    return mop


def _charge_delta(ps, model_cfg):
    ac = AlgorithmConfig(descent_method=ps, max_iter=5)
    solver = Solver(compile_mop(_mop(model_cfg)), ac, jnp.float64)
    st = solver.initialize(jnp.array([-3.0, 2.5], jnp.float64))
    before = [int(g.n_evals) for g in st.groups]
    _, _, groups2 = solver._ps_criticality(
        st.groups, st.x_s, st.x_s, st.fx, st.delta, st.scal)
    return [int(g.n_evals) - b for b, g in zip(before, groups2)], solver


def test_ps_charges_exact_groups_with_budgets():
    """PS + exact models: one criticality solve charges exactly the
    grid+polish budget plus the m_obj ideal-point budgets."""
    ps = PascolettiSerafiniConfig(n_samples=32, polish_iters=8)
    deltas, solver = _charge_delta(ps, ExactConfig())
    g_grid, g_pol, i_grid, i_pol = ps_subsolver_budgets(ps, 2)
    expected = g_grid + g_pol + solver.mop.m_obj * (i_grid + i_pol)
    assert all(d == expected for d in deltas)


def test_ps_reference_direction_skips_ideal_point_charge():
    ps = PascolettiSerafiniConfig(reference_direction=(1.0, 1.0),
                                  n_samples=32, polish_iters=8)
    deltas, _ = _charge_delta(ps, ExactConfig())
    g_grid, g_pol, _, _ = ps_subsolver_budgets(ps, 2)
    assert all(d == g_grid + g_pol for d in deltas)


def test_ps_does_not_charge_model_groups():
    """RBF groups are surrogates — subsolver calls are model evals, not
    counted true evaluations (only ``counts_on_eval`` groups charge)."""
    ps = PascolettiSerafiniConfig(n_samples=32, polish_iters=8)
    deltas, _ = _charge_delta(ps, RbfConfig(kernel="multiquadric"))
    assert all(d == 0 for d in deltas)


def test_ps_budget_exhaustion_halts_run():
    """``max_evals`` halts a PS+exact run once the subsolver charges
    exhaust the budget (``_budget_okay``, ``algorithm.jl:6-12``)."""
    ps = PascolettiSerafiniConfig(n_samples=32, polish_iters=8)
    res = optimize(_mop(ExactConfig()), jnp.array([-3.0, 2.5]),
                   descent_method=ps, max_iter=30, max_evals=150,
                   dtype=jnp.float64)
    assert int(res.stop_code) == int(STOP_CODE.BUDGET_EXHAUSTED)
    assert int(res.n_evals) >= 150
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_ps_reference_default_budgets_charge():
    """REFERENCE defaults (round-4 budget parity, ``descent.jl:414-432,
    527``): one PS criticality solve at n=2 charges exactly the 500*(n+1)
    global sweep plus m_obj ideal-point solves of the same size — no
    polish."""
    ps = PascolettiSerafiniConfig()
    g_grid, g_pol, i_grid, i_pol = ps_subsolver_budgets(ps, 2)
    assert (g_grid, g_pol, i_grid, i_pol) == (1500, 0, 1500, 0)
    deltas, solver = _charge_delta(ps, ExactConfig())
    expected = 1500 + solver.mop.m_obj * 1500
    assert all(d == expected for d in deltas)
