"""Determinism and trajectory-regression tests.

The BASELINE parity requirement (trajectories within 1e-8) demands a
regression harness early (SURVEY.md §7 hard part 5). Until the Julia
reference can be executed side-by-side, these tests lock our own float64
trajectories: byte-stable across runs and jit/eager boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.utils.logging import trajectory_arrays


def _mop():
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    return mop


X0 = jnp.array([-3.0, 2.5])


def test_runs_are_deterministic():
    r1 = optimize(_mop(), X0, max_iter=12)
    r2 = optimize(_mop(), X0, max_iter=12)
    t1, t2 = trajectory_arrays(r1), trajectory_arrays(r2)
    assert np.array_equal(t1["x"], t2["x"])
    assert np.array_equal(t1["delta"], t2["delta"])
    assert int(r1.n_evals) == int(r2.n_evals)


def test_jit_and_eager_agree():
    r_jit = optimize(_mop(), X0, max_iter=6, jit=True)
    r_eager = optimize(_mop(), X0, max_iter=6, jit=False)
    assert np.allclose(np.asarray(r_jit.x), np.asarray(r_eager.x), atol=1e-12)
    assert int(r_jit.n_evals) == int(r_eager.n_evals)
    assert int(r_jit.stop_code) == int(r_eager.stop_code)


def test_vmap_matches_single_runs():
    """Batched multistart trajectories equal individual runs (the while-loop
    batching rule must not leak state across instances)."""
    from morbit_tpu.parallel.multistart import multistart_optimize
    from morbit_tpu.core.config import AlgorithmConfig

    mop = _mop()
    starts = np.array([[-3.0, 2.5], [2.0, -1.0], [0.5, 3.5]])
    ac = AlgorithmConfig(max_iter=8)
    batched = multistart_optimize(mop, starts, ac, dtype=jnp.float64)
    for i, s in enumerate(starts):
        single = optimize(mop, jnp.array(s), algo_config=ac)
        assert np.allclose(np.asarray(batched.x[i]), np.asarray(single.x),
                           atol=1e-10), i
        assert int(batched.n_evals[i]) == int(single.n_evals)
