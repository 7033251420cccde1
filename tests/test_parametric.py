"""Per-instance problem-data batching: vmap over problem parameters.

``parametric_multistart`` solves a different problem instance per batch row
from one compiled program — the analogue of the reference harness's
problem-grid rows (``examples/large_scale_benchmarks.jl:69-118``)."""

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu import optimize
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import parametric_multistart


def build_shifted(theta):
    """Two parabolas with parametric centers +/- theta."""
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - theta) ** 2)[None], model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + theta) ** 2)[None], model_cfg=cfg)
    return mop


def test_parametric_batch_solves_distinct_problems():
    B = 4
    thetas = jnp.stack([jnp.full((2,), 0.5 + 0.5 * i) for i in range(B)])
    x0 = jnp.tile(jnp.asarray([0.3, -0.2]), (B, 1))
    ac = AlgorithmConfig(max_iter=12)
    res = parametric_multistart(build_shifted, x0, thetas, ac,
                                dtype=jnp.float64)
    assert res.x.shape == (B, 2)
    # each lane's iterate lies near its own Pareto segment (the segment
    # between -theta_i and +theta_i on the diagonal); the segment grows
    # with i, so final objective sums differ across lanes
    for i in range(B):
        th = float(thetas[i, 0])
        x = np.asarray(res.x[i])
        # Pareto set of {||x-t||^2, ||x+t||^2} is the segment x = s*t, s in [-1,1]
        s = x @ np.asarray(thetas[i]) / (2 * th ** 2)
        seg_pt = np.clip(s, -1, 1) * np.asarray(thetas[i])
        assert np.linalg.norm(x - seg_pt) < 0.3, (i, x, seg_pt)


def test_parametric_lane_matches_individual_solve():
    theta = jnp.asarray([1.0, 1.0])
    x0 = jnp.asarray([0.3, -0.2])
    ac = AlgorithmConfig(max_iter=8)
    res_b = parametric_multistart(build_shifted, x0[None, :], theta[None, :],
                                  ac, dtype=jnp.float64)
    res_1 = optimize(build_shifted(theta), x0, ac, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(res_b.x[0]), np.asarray(res_1.x),
                               rtol=1e-12, atol=1e-12)
    assert int(res_b.n_evals[0]) == int(res_1.n_evals)
