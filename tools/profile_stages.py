"""Stage-level profile of the vmapped solver iteration at the bench config.

Times jitted sub-stages of ``Solver._iterate_inner`` on a realistic
mid-run batched state (B-way vmapped, after a few real iterations), with
distinct pre-staged inputs. Used to target the round-2 perf work.

Run on the real TPU:  python tools/profile_stages.py [B]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas


def timeit(fn, arg, reps=10):
    out = fn(arg)
    jax.tree_util.tree_map(
        lambda a: jax.block_until_ready(a) if hasattr(a, "block_until_ready") else a, out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.tree_util.tree_map(
        lambda a: jax.block_until_ready(a) if hasattr(a, "block_until_ready") else a, out)
    return (time.perf_counter() - t0) / reps


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=10, qp_iters=100)
    solver = build_solver(mop, ac, dtype)
    print("platform:", jax.devices()[0].platform, " B =", B)

    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)

    init = jax.jit(jax.vmap(solver.initialize))
    it = jax.jit(jax.vmap(solver.iterate))
    state = init(x0)
    for _ in range(3):
        state = it(state)
    jax.block_until_ready(state.x)

    t_iter = timeit(it, state)
    print(f"full iterate:            {t_iter*1e3:8.2f} ms")

    ct = solver.container

    def stage_update(s):
        it_key = jax.vmap(jax.random.fold_in)(s.key, s.iter_counter)
        improve_flag = s.last_it_stat == 4  # MODELIMPROVING (any traced flag ok)
        return jax.vmap(
            lambda g, xs, xi, d, fl, sc, k: ct.update_or_improve(
                g, xs, xi, d, fl, scal=sc, key=k)
        )(s.groups, s.x_s, s.x_indices, s.delta, improve_flag, s.scal, it_key)

    t_upd = timeit(jax.jit(stage_update), state)
    print(f"surrogate update:        {t_upd*1e3:8.2f} ms")

    def stage_crit(s):
        return jax.vmap(
            lambda g, xs, le, li, fx, d, sc: solver._get_criticality(
                g, xs, xs, le, li, fx, d, sc)
        )(s.groups, s.x_s, s.l_e, s.l_i, s.fx, s.delta, s.scal)

    t_crit = timeit(jax.jit(stage_crit), state)
    print(f"criticality (jac+LP):    {t_crit*1e3:8.2f} ms")

    def stage_jac(s):
        return jax.vmap(lambda g, xs, sc: ct.jac_objectives(g, xs, sc))(
            s.groups, s.x_s, s.scal)

    t_jac = timeit(jax.jit(stage_jac), state)
    print(f"  model jacobians only:  {t_jac*1e3:8.2f} ms")

    def stage_true(s):
        return jax.vmap(lambda g, xs, sc: ct.evaluate_true(g, xs, sc))(
            s.groups, s.x_s, s.scal)

    t_true = timeit(jax.jit(stage_true), state)
    print(f"true eval + db insert:   {t_true*1e3:8.2f} ms")

    def stage_meval(s):
        return jax.vmap(lambda g, xs, sc: ct.eval_objectives(g, xs, sc))(
            s.groups, s.x_s, s.scal)

    t_meval = timeit(jax.jit(stage_meval), state)
    print(f"one model eval:          {t_meval*1e3:8.2f} ms")

    def stage_main(s):
        theta = jax.vmap(solver._theta)(s)
        return jax.vmap(
            lambda st, th: solver._main_phase(st, st, th, th))(s, theta)

    t_main = timeit(jax.jit(stage_main), state)
    print(f"main phase (crit+trial): {t_main*1e3:8.2f} ms")

    print(f"residual (iter - upd - main): {(t_iter - t_upd - t_main)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
