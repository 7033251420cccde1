"""Config-option coverage: strict filter, steplength radius updates,
stepnorm tolerance, strict vs non-strict acceptance, PS with reference point."""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.descent import PascolettiSerafiniConfig
from morbit_tpu.core.enums import STOP_CODE
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import ExactConfig, RbfConfig


def _constrained_mop():
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    mop.add_nl_ineq_constraint(lambda x: jnp.sum(x ** 2) - 1.69,
                               model_cfg=ExactConfig())
    return mop


def test_strict_filter():
    """StrictFilter: componentwise filter entries (``FilterImplementation.jl:43-53``)."""
    res = optimize(_constrained_mop(), jnp.array([-3.0, 2.5]), max_iter=25,
                   filter_type="strict")
    x = np.asarray(res.x)
    assert float(np.sum(x ** 2)) <= 1.69 + 1e-6
    assert res.state.filter.fvals.shape[1] == 2  # componentwise f entries


def test_steplength_radius_update():
    """radius_update_method=:steplength (``algorithm.jl:150-183``)."""
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=20,
                   radius_update_method="steplength")
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.2


def test_nonstrict_acceptance():
    """strict_acceptance_test=False: max-scalarized rho (``algorithm.jl:807-810``)."""
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=20,
                   strict_acceptance_test=False)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.15


def test_stepnorm_tolerance_stop():
    """stepnorm_tol_abs: rejected tiny steps stop with TOLERANCE
    (``abs_stepnorm_test``, ``algorithm.jl:80-86,868-872``)."""
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=50,
                   stepnorm_tol_abs=0.5)  # absurdly large: triggers quickly
    assert int(res.stop_code) in (STOP_CODE.TOLERANCE, STOP_CODE.CRITICAL)


def test_ps_with_reference_point():
    cfg = PascolettiSerafiniConfig(reference_point=(0.0, 0.0),
                                   n_samples=64, polish_iters=20)
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    rcfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=rcfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=rcfg)
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=15,
                   descent_method=cfg)
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_ps_subsolver_budgets_resolution():
    """``_ps_max_evals`` mapping (``descent.jl:414-432,527``)."""
    from morbit_tpu.core.descent import ps_subsolver_budgets

    # REFERENCE defaults (``descent.jl:414-432,527``): total 500*(n+1),
    # all global (``ps_polish_algo = nothing`` -> no polish), ideal-point
    # solves 500*(n+1) global-only
    cfg = PascolettiSerafiniConfig()
    assert ps_subsolver_budgets(cfg, 2) == (1500, 0, 1500, 0)
    assert ps_subsolver_budgets(cfg, 5) == (3000, 0, 3000, 0)
    # explicit total, polish off (reference: global = MAX_EVALS, local = 0)
    cfg = PascolettiSerafiniConfig(max_ps_problem_evals=100)
    g, p, ig, ip = ps_subsolver_budgets(cfg, 2)
    assert (g, p) == (100, 0) and (ig, ip) == (1500, 0)
    # polish opted in (ps_polish_algo analogue): 3/4 global, 1/4 polish
    cfg = PascolettiSerafiniConfig(max_ps_problem_evals=100, ps_polish=True)
    g, p, _, _ = ps_subsolver_budgets(cfg, 2)
    assert (g, p) == (75, 25)
    # polish-evals override keeps the full total for the sweep
    cfg = PascolettiSerafiniConfig(max_ps_problem_evals=100,
                                   max_ps_polish_evals=10)
    g, p, _, _ = ps_subsolver_budgets(cfg, 2)
    assert (g, p) == (100, 10)
    # repo-native grid/polish overrides pass through
    cfg = PascolettiSerafiniConfig(n_samples=64, polish_iters=20)
    assert ps_subsolver_budgets(cfg, 2) == (64, 20, 64, 20)
    # explicit ideal-point cap wins and is global-only like the reference
    cfg = PascolettiSerafiniConfig(max_ideal_point_problem_evals=40,
                                   n_samples=64, polish_iters=20)
    g, p, ig, ip = ps_subsolver_budgets(cfg, 2)
    assert (g, p) == (64, 20) and (ig, ip) == (40, 0)


def test_ps_with_eval_caps_end_to_end():
    """PS descent honors the subsolver eval caps and still solves.

    ``ps_polish=True`` opts into the 3/4 grid + 1/4 PGA-polish split (the
    ``ps_polish_algo`` analogue) — at 80 total evals a pure grid sweep is
    too coarse for the quality assertion below."""
    cfg = PascolettiSerafiniConfig(max_ps_problem_evals=80,
                                   max_ideal_point_problem_evals=60,
                                   ps_polish=True)
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    rcfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=rcfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=rcfg)
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=15,
                   descent_method=cfg)
    x = np.asarray(res.x)
    assert np.all(np.isfinite(x))
    assert abs(x[0] - x[1]) < 0.5  # near the Pareto set x1 == x2
