"""Repro: unbounded exact-objective optimize on TPU f32 exits CRITICAL at it 1."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

platform = sys.argv[1] if len(sys.argv) > 1 else "axon"
import jax

jax.config.update("jax_platforms", platform)
import jax.numpy as jnp

from morbit_tpu import MOP, optimize

mop = MOP(2)
mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2),
                        jac=lambda x: 2.0 * (x - 1.0))
mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2),
                        jac=lambda x: 2.0 * (x + 1.0))

x0 = jnp.array([-3.141592653589793, 2.71828])
res = optimize(mop, x0, max_iter=20, verbosity=0)
traj = res.state.traj
print(f"platform={platform} x={np.asarray(res.x)} stop={int(res.stop_code)} "
      f"n_iters={int(res.n_iterations)} n_evals={int(res.n_evals)}")
print("omega[:3] =", np.asarray(traj.omega[:3]))
print("x[:3] =", np.asarray(traj.x[:3]))
