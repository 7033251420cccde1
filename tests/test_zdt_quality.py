"""ZDT convergence-quality tests with RBF surrogates (reference benchmark
problems at reference-style budgets; ``examples/large_scale_benchmarks.jl``)."""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import multistart_optimize
from morbit_tpu.problems.synthetic import halton_starts, make_zdt


def test_zdt1_rbf_front_quality():
    """Multistart RBF runs land near the ZDT1 front: f2 ~ 1 - sqrt(f1) when
    g -> 1; at least some runs must reach it within the eval budget."""
    mop = make_zdt("zdt1", 5, model_cfg=RbfConfig(kernel="cubic"))
    ac = AlgorithmConfig(max_iter=25, max_evals=1000 * 5, f_tol_rel=1e-3,
                         x_tol_rel=1e-3)
    res = multistart_optimize(mop, halton_starts(8, mop.lb, mop.ub), ac,
                              dtype=jnp.float64)
    fx = np.asarray(res.fx)
    evals = np.asarray(res.n_evals)
    # derivative-free efficiency: well under the reference budget
    assert np.all(evals <= 1000 * 5)
    assert np.median(evals) < 100
    # front distance for the best runs: |f2 - (1 - sqrt(f1))| small
    front_err = np.abs(fx[:, 1] - (1.0 - np.sqrt(np.clip(fx[:, 0], 0, None))))
    assert np.min(front_err) < 0.05
    assert np.median(front_err) < 1.0


def test_zdt3_taylor_runs_within_budget():
    from morbit_tpu.models.configs import TaylorConfig

    mop = make_zdt("zdt3", 5, model_cfg=TaylorConfig(degree=1, mode="fd"))
    ac = AlgorithmConfig(max_iter=25, max_evals=1000 * 5)
    res = multistart_optimize(mop, halton_starts(4, mop.lb, mop.ub), ac,
                              dtype=jnp.float64)
    assert np.all(np.isfinite(np.asarray(res.fx)))
    assert np.all(np.asarray(res.n_evals) <= 1000 * 5)
