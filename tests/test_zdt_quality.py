"""ZDT convergence-quality locks with per-family eval/front envelopes.

Reference benchmark problems at reference-style budgets
(``examples/large_scale_benchmarks.jl:124,239-241``). The envelopes freeze
the deterministic CPU float64 multistart results (Halton starts, fixed
PRNG): observed values are noted inline; bounds carry ~1.5-2x headroom so
only a real quality regression (a run family losing the front, or
derivative-free efficiency collapsing) trips them, not benign numeric
drift. Bit-level geometry is separately pinned by tests/test_golden.py.
"""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import LagrangeConfig, RbfConfig, TaylorConfig
from morbit_tpu.parallel.multistart import multistart_optimize
from morbit_tpu.problems.synthetic import halton_starts, make_zdt


def _front_err(name, fx):
    f1 = np.clip(fx[:, 0], 0, None)
    front = {"zdt1": 1.0 - np.sqrt(f1), "zdt2": 1.0 - f1 ** 2}[name]
    return np.abs(fx[:, 1] - front)


def _run(name, model_cfg, n_starts=8, **ac_kw):
    mop = make_zdt(name, 5, model_cfg=model_cfg)
    ac = AlgorithmConfig(max_iter=25, max_evals=1000 * 5, **ac_kw)
    res = multistart_optimize(mop, halton_starts(n_starts, mop.lb, mop.ub),
                              ac, dtype=jnp.float64)
    return np.asarray(res.fx), np.asarray(res.n_evals)


def test_zdt1_rbf_front_quality():
    """RBF family: some starts reach the ZDT1 front essentially exactly and
    the batch median stays near it (observed: min 0.0, median 0.514)."""
    fx, evals = _run("zdt1", RbfConfig(kernel="cubic"),
                     f_tol_rel=1e-3, x_tol_rel=1e-3)
    fe = _front_err("zdt1", fx)
    assert np.min(fe) < 0.01
    assert np.median(fe) < 0.8
    # derivative-free efficiency (observed evals: min 10 / med 17 / max 22)
    assert np.median(evals) <= 30
    assert np.max(evals) <= 60


def test_zdt2_rbf_front_quality():
    """ZDT2 (concave front): best starts hit the front exactly
    (observed: min 0.0; evals med 14 / max 22)."""
    fx, evals = _run("zdt2", RbfConfig(kernel="cubic"),
                     f_tol_rel=1e-3, x_tol_rel=1e-3)
    fe = _front_err("zdt2", fx)
    assert np.min(fe) < 0.01
    assert np.median(evals) <= 30
    assert np.max(evals) <= 60


def test_zdt3_taylor_eval_envelope():
    """Taylor-FD family pays a per-iteration stencil: distinctly more evals
    than RBF but still far under budget (observed: 44 / 62 / 92)."""
    fx, evals = _run("zdt3", TaylorConfig(degree=1, mode="fd"), n_starts=4)
    assert np.all(np.isfinite(fx))
    assert np.median(evals) <= 90
    assert np.max(evals) <= 150
    assert np.min(evals) >= 10   # the stencil cost is real — not free


def test_zdt1_lagrange_front_quality():
    """Lagrange family reaches the front with a poised-set eval profile
    between RBF and Taylor (observed: front min 0.0; evals 19 / 19.5 / 25)."""
    fx, evals = _run("zdt1", LagrangeConfig(degree=1), n_starts=4)
    fe = _front_err("zdt1", fx)
    assert np.min(fe) < 0.01
    assert np.median(evals) <= 35
    assert np.max(evals) <= 60


def test_zdt1_rbf_wide_n20_front_quality():
    """Wide-n coverage (round-4 VERDICT missing item 2; BASELINE config 3
    names ZDT at n=10-30, reference grid
    ``examples/large_scale_benchmarks.jl:69-118``): first in-suite exercise
    of the capacity heuristics and the VMEM-gated round-4 fallback above
    n=15. Observed (CPU f64, 4 Halton starts, max_iter=25): front_err
    [0.0, 0.0, 0.017, 0.361] — two starts land on the front exactly —
    evals [62, 63, 121, 127] against the 20,000 reference budget, 3/4 runs
    stopping on tolerances/criticality in 4 iterations. First compile of
    the n=20 program is ~4 min on this 1-core VM; the persistent test
    cache (conftest) makes reruns warm."""
    mop = make_zdt("zdt1", 20, model_cfg=RbfConfig(kernel="cubic"))
    ac = AlgorithmConfig(max_iter=25, max_evals=1000 * 20,
                         f_tol_rel=1e-3, x_tol_rel=1e-3)
    res = multistart_optimize(mop, halton_starts(4, mop.lb, mop.ub),
                              ac, dtype=jnp.float64)
    fx, evals = np.asarray(res.fx), np.asarray(res.n_evals)
    fe = _front_err("zdt1", fx)
    assert np.min(fe) < 0.01      # some start reaches the front exactly
    assert np.median(fe) < 0.5
    assert np.median(evals) <= 200  # derivative-free efficiency at n=20
    assert np.max(evals) <= 400
    assert np.all(np.isfinite(fx))


def _run_ps(name, model_cfg, n_starts=8, **ac_kw):
    """PS-descent variant at the REFERENCE default subsolver budgets
    (``_ps_max_evals``: 500*(n+1) global-only, ``descent.jl:414-432``)."""
    from morbit_tpu.core.descent import PascolettiSerafiniConfig

    mop = make_zdt(name, 5, model_cfg=model_cfg)
    ac = AlgorithmConfig(max_iter=25, max_evals=1000 * 5,
                         descent_method=PascolettiSerafiniConfig(), **ac_kw)
    res = multistart_optimize(mop, halton_starts(n_starts, mop.lb, mop.ub),
                              ac, dtype=jnp.float64)
    return np.asarray(res.fx), np.asarray(res.n_evals)


def test_zdt1_rbf_ps_front_quality():
    """PS + RBF on ZDT1: WHY the plain front error is bounded away from 0,
    measured (round 5, tools/check_ps_quality.py + /tmp diagnostic):

    Every run stops CRITICAL in 3-6 iterations with the PS criticality
    measure omega = |tau| -> 0 — NOT on the f/x tolerances (the round-4
    docstring's guess): rerunning with ``f_tol_rel = x_tol_rel = 0`` and
    max_iter up to 60 reproduces every trajectory IDENTICALLY (asserted
    below). tau is stationary at WEAKLY Pareto-critical points, where no
    in-box point improves EVERY objective: on ZDT1 that includes the
    f1 = 0 edge with g > 1 ((0, 3.04), (0.008, 1.96), ... measured) —
    points with O(1) distance to the strict front by construction. The
    reference's PS scalarization (``descent.jl:320-581``) has the same
    fixed points; the oracle PS configs lock the same math.

    The meaningful quality lock is therefore distance to the WEAK front
    (the strict front union the f1 = 0 edge with f2 >= 1): observed
    weak-err min 0.002 / med ~0.10. A broken PS step (stalling at interior
    non-critical points) fails the weak-front and stop-code assertions."""
    fx, evals = _run_ps("zdt1", RbfConfig(kernel="cubic"),
                        f_tol_rel=1e-3, x_tol_rel=1e-3)
    fe = _front_err("zdt1", fx)
    weak = np.minimum(fe, np.where(fx[:, 1] >= 1.0, np.abs(fx[:, 0]),
                                   np.inf))
    assert np.min(weak) < 0.02
    assert np.median(weak) < 0.35
    assert np.min(fe) < 0.5
    assert np.median(fe) < 1.0
    assert np.median(evals) <= 30
    assert np.max(evals) <= 60

    # the stop is PS criticality, not the tolerances: zeroed tolerances
    # reproduce the runs identically
    fx0, evals0 = _run_ps("zdt1", RbfConfig(kernel="cubic"),
                          f_tol_rel=0.0, x_tol_rel=0.0)
    np.testing.assert_allclose(fx0, fx, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(evals0, evals)


def test_zdt2_rbf_ps_front_quality():
    """PS + RBF on ZDT2 (observed: min 0.401 / med 0.749; evals max 25)."""
    fx, evals = _run_ps("zdt2", RbfConfig(kernel="cubic"),
                        f_tol_rel=1e-3, x_tol_rel=1e-3)
    fe = _front_err("zdt2", fx)
    assert np.min(fe) < 0.65
    assert np.median(fe) < 1.2
    assert np.max(evals) <= 60


def test_zdt1_taylor_ps_eval_envelope():
    """PS + Taylor-1 pays the per-iteration stencil on top of the PS
    charges (observed: front err min 0.283; evals min 33 / med 55 /
    max 88)."""
    fx, evals = _run_ps("zdt1", TaylorConfig(degree=1, mode="fd"),
                        f_tol_rel=1e-3, x_tol_rel=1e-3)
    fe = _front_err("zdt1", fx)
    assert np.min(fe) < 0.5
    assert np.median(evals) <= 110
    assert np.max(evals) <= 150
