"""Bisect the TPU-f32 descent-LP failure: constants-vs-args x precision."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from morbit_tpu.core.descent import LinearizedConstraints, steepest_descent_direction

dtype = jnp.float32
x0 = jnp.array([-3.1415926, 2.71828], dtype)
Dm = jnp.array([[-8.2831852, 3.43656], [-4.2831852, 7.43656]], dtype)
lb = jnp.full((2,), -jnp.inf, dtype)
ub = jnp.full((2,), jnp.inf, dtype)
lin = LinearizedConstraints(
    jnp.zeros((0, 2), dtype), jnp.zeros((0,), dtype),
    jnp.zeros((0, 2), dtype), jnp.zeros((0,), dtype))


def run(tag, const, highest):
    if const:
        f = jax.jit(lambda: steepest_descent_direction(x0, Dm, lb, ub, lin,
                                                       qp_iters=400))
        call = lambda: f()
    else:
        f = jax.jit(lambda a, b, c, d: steepest_descent_direction(
            a, b, c, d, lin, qp_iters=400))
        call = lambda: f(x0, Dm, lb, ub)
    if highest:
        with jax.default_matmul_precision("highest"):
            d_, om = call()
    else:
        d_, om = call()
    print(f"{tag}: d={np.asarray(d_)} omega={float(om)}", flush=True)


run("args+highest  ", const=False, highest=True)
run("args+default  ", const=False, highest=False)
run("const+highest ", const=True, highest=True)
run("const+default ", const=True, highest=False)
