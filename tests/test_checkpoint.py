"""Checkpoint save/resume of the full solver state."""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import Solver
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.mop import MOP, compile_mop
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.utils.checkpoint import load_state, save_state


def test_save_and_resume_mid_run(tmp_path):
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel="multiquadric")
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    solver = Solver(compile_mop(mop), AlgorithmConfig(max_iter=10))

    state = solver.initialize(jnp.array([-3.0, 2.5]))
    for _ in range(3):
        state = solver.iterate(state)

    path = str(tmp_path / "ckpt.npz")
    save_state(path, state)

    template = solver.initialize(jnp.array([-3.0, 2.5]))
    restored = load_state(path, template)
    assert np.allclose(np.asarray(restored.x), np.asarray(state.x))
    assert int(restored.iter_counter) == int(state.iter_counter)

    # resuming produces the same continuation as the uninterrupted run
    cont_a = solver.iterate(state)
    cont_b = solver.iterate(restored)
    assert np.allclose(np.asarray(cont_a.x), np.asarray(cont_b.x), atol=0)
    assert int(cont_a.stop_code) == int(cont_b.stop_code)
