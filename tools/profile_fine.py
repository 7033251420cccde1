"""Fine-grained TPU profile: isolate state-copy vs scatter vs compute costs.

Follow-up to tools/profile_stages.py: eval_objectives (returns states) was
45.9 ms while jac_objectives (returns only the array) was 2.85 ms — this
script pins down which primitive pays.

Run:  python tools/profile_fine.py [B]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core import database as dbm
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas


def timeit(fn, arg, reps=10):
    out = fn(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    for leaf in jax.tree_util.tree_leaves(out):
        jax.block_until_ready(leaf)
    return (time.perf_counter() - t0) / reps


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=10, qp_iters=100)
    solver = build_solver(mop, ac, dtype)
    ct = solver.container
    print("platform:", jax.devices()[0].platform, " B =", B,
          " db_capacity =", solver.db_capacity)

    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)
    init = jax.jit(jax.vmap(solver.initialize))
    it = jax.jit(jax.vmap(solver.iterate))
    state = init(x0)
    for _ in range(3):
        state = it(state)
    jax.block_until_ready(state.x)

    # 1. identity: pure state round-trip through jit (copy cost)
    t = timeit(jax.jit(lambda s: s), state)
    print(f"identity on state:          {t*1e3:8.2f} ms")

    # 2. eval raw (no states returned)
    f = jax.jit(lambda s: jax.vmap(
        lambda g, xs: ct.eval_objectives_raw(g, xs))(s.groups, s.x_s))
    print(f"eval_objectives_raw:        {timeit(f, state)*1e3:8.2f} ms")

    # 3. eval (states returned)
    f = jax.jit(lambda s: jax.vmap(
        lambda g, xs: ct.eval_objectives(g, xs))(s.groups, s.x_s))
    print(f"eval_objectives (+states):  {timeit(f, state)*1e3:8.2f} ms")

    # 4. db add_evaluated alone (batched scatter)
    def add(s):
        g0 = jax.tree_util.tree_map(lambda a: a[:, 0] if a.ndim > 1 else a,
                                    s.groups[0].db, )
        return jax.vmap(dbm.add_evaluated)(s.groups[0].db, s.x_s,
                                           s.fx[:, :1] * jnp.ones((1, 2), dtype))
    f = jax.jit(lambda s: jax.vmap(dbm.add_evaluated)(
        s.groups[0].db, s.x_s, jnp.tile(s.fx[:, :1], (1, 2))))
    print(f"db add_evaluated (scatter): {timeit(f, state)*1e3:8.2f} ms")

    # 5. get_rows (batched gather)
    f = jax.jit(lambda s: jax.vmap(dbm.get_rows)(
        s.groups[0].db, jax.vmap(lambda m: m.idx)(s.groups[0].model)))
    print(f"db get_rows (gather):       {timeit(f, state)*1e3:8.2f} ms")

    # 6. eval_missing alone
    def emiss(s):
        def one(db, sc):
            g = solver.mop.groups[0]
            from morbit_tpu.core import scaling
            fn = lambda xs: g.eval_unscaled(scaling.untransform(sc, xs))
            return dbm.eval_missing(db, fn)
        return jax.vmap(one)(s.groups[0].db, s.scal)
    f = jax.jit(emiss)
    print(f"db eval_missing:            {timeit(f, state)*1e3:8.2f} ms")

    # 7. fit alone
    def fit_only(s):
        from morbit_tpu.models.base import ModelContext
        def one(g, xs, xi, d, sc, k):
            ctx = ModelContext(x_s=xs, x_index=xi[0], delta=d,
                               n_evals=g.n_evals, scal=sc, key=k)
            return ct.ops[0].fit(g.model, g.db, ctx)
        keys = jax.vmap(jax.random.fold_in)(s.key, s.iter_counter)
        return jax.vmap(one)(s.groups[0], s.x_s, s.x_indices, s.delta,
                             s.scal, keys)
    f = jax.jit(fit_only)
    print(f"rbf fit alone:              {timeit(f, state)*1e3:8.2f} ms")

    # 8. prepare alone (rounds 1-4)
    def prep_only(s):
        from morbit_tpu.models.base import ModelContext
        def one(g, xs, xi, d, sc, k):
            ctx = ModelContext(x_s=xs, x_index=xi[0], delta=d,
                               n_evals=g.n_evals, scal=sc, key=k)
            return ct.ops[0].prepare(g.model, g.db, ctx, False)
        keys = jax.vmap(jax.random.fold_in)(s.key, s.iter_counter)
        return jax.vmap(one)(s.groups[0], s.x_s, s.x_indices, s.delta,
                             s.scal, keys)
    f = jax.jit(prep_only)
    print(f"rbf prepare (rounds 1-4):   {timeit(f, state)*1e3:8.2f} ms")

    # 9. true function eval alone (no db)
    f = jax.jit(lambda s: jax.vmap(
        lambda xs: solver.mop.groups[0].eval_unscaled(xs))(s.x_s))
    print(f"true fn eval (no db):       {timeit(f, state)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
