"""Cost breakdown of ONE criticality/update pass (the bench hot spot).

tools/profile_iters.py: the criticality rebuild loop is ~69% of the bench
solve. Each pass = container.update (rounds 1-4 prepare + eval_missing +
fit) + criticality (jacobians + LP). This script times K chained repeats of
each stage inside one jit (delta perturbed per repeat to defeat CSE) and
reports the per-call slope.

Run:  python tools/profile_pass.py [B]
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=10, qp_iters=100)
    solver = build_solver(mop, ac, dtype)
    ct = solver.container
    print("platform:", jax.devices()[0].platform, " B =", B)

    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)
    state = jax.jit(jax.vmap(solver.initialize))(x0)
    state = jax.jit(jax.vmap(solver.iterate))(state)
    jax.block_until_ready(state.x)

    def slope(make_body, k_lo=1, k_hi=9, reps=5):
        def runner(K):
            def f(s):
                def body(i, carry):
                    return make_body(s, carry, i)
                out = jax.lax.fori_loop(0, K, body, init_carry(s))
                return out
            return jax.jit(f)

        def timed(f):
            out = f(state)
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(state)
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
            return (time.perf_counter() - t0) / reps

        return (timed(runner(k_hi)) - timed(runner(k_lo))) / (k_hi - k_lo)

    def init_carry(s):
        return s.groups

    def vm(fn):
        return jax.vmap(fn)

    # full update pass (prepare + eval_missing + fit)
    def upd_body(s, groups, i):
        keys = jax.vmap(jax.random.fold_in)(s.key, s.iter_counter + i)
        d = s.delta * (1.0 + 1e-6 * i)
        return vm(lambda g, xs, xi, dd, sc, k: ct.update(
            g, xs, xi, dd, True, scal=sc, key=k))(
            groups, s.x_s, s.x_indices, d, s.scal, keys)
    print(f"update pass (prep+eval+fit): {slope(upd_body)*1e3:8.2f} ms")

    # prepare only
    def prep_body(s, groups, i):
        from morbit_tpu.models.base import ModelContext
        d = s.delta * (1.0 + 1e-6 * i)
        def one(g, xs, xi, dd, sc, k):
            ctx = ModelContext(x_s=xs, x_index=xi[0], delta=dd,
                               n_evals=g.n_evals, scal=sc, key=k)
            model, db = ct.ops[0].prepare(g.model, g.db, ctx, True)
            return g._replace(model=model, db=db)
        keys = jax.vmap(jax.random.fold_in)(s.key, s.iter_counter + i)
        return (vm(one)(groups[0], s.x_s, s.x_indices, d, s.scal, keys),)
    print(f"prepare only (rounds 1-4):   {slope(prep_body)*1e3:8.2f} ms")

    # round 4 only
    def r4_body(s, groups, i):
        from morbit_tpu.models.base import ModelContext
        d = s.delta * (1.0 + 1e-6 * i)
        from morbit_tpu.ops.geometry import local_bounds
        def one(g, xs, xi, dd, sc, k):
            ctx = ModelContext(x_s=xs, x_index=xi[0], delta=dd,
                               n_evals=g.n_evals, scal=sc, key=k)
            ops = ct.ops[0]
            delta_2 = jnp.asarray(ops.cfg.theta_enlarge_2 * ops.ac.delta_max,
                                  ops.dtype)
            lb2, ub2 = local_bounds(xs, delta_2, sc.lb_scaled, sc.ub_scaled)
            db, idx, count = ops._round4(g.db, g.model.idx, g.model.n_train,
                                         lb2, ub2, ctx)
            return g._replace(db=db, model=g.model._replace(idx=idx,
                                                            n_train=count))
        keys = jax.vmap(jax.random.fold_in)(s.key, s.iter_counter + i)
        return (vm(one)(groups[0], s.x_s, s.x_indices, d, s.scal, keys),)
    print(f"round 4 only:                {slope(r4_body)*1e3:8.2f} ms")

    # fit only
    def fit_body(s, groups, i):
        from morbit_tpu.models.base import ModelContext
        d = s.delta * (1.0 + 1e-6 * i)
        def one(g, xs, xi, dd, sc, k):
            ctx = ModelContext(x_s=xs, x_index=xi[0], delta=dd,
                               n_evals=g.n_evals, scal=sc, key=k)
            model = ct.ops[0].fit(g.model, g.db, ctx)
            return g._replace(model=model)
        keys = jax.vmap(jax.random.fold_in)(s.key, s.iter_counter + i)
        return (vm(one)(groups[0], s.x_s, s.x_indices, d, s.scal, keys),)
    print(f"fit only (x2 KKT solve):     {slope(fit_body)*1e3:8.2f} ms")

    # eval_missing only
    def em_body(s, groups, i):
        from morbit_tpu.core import database as dbm
        from morbit_tpu.core import scaling
        def one(g, sc, dd):
            fn = lambda xs: solver.mop.groups[0].eval_unscaled(
                scaling.untransform(sc, xs) * (1.0 + 0.0 * dd))
            db, n_new = dbm.eval_missing(g.db, fn)
            return g._replace(db=db)
        d = s.delta * (1.0 + 1e-6 * i)
        return (vm(one)(groups[0], s.scal, d),)
    print(f"eval_missing (full cap):     {slope(em_body)*1e3:8.2f} ms")

    # criticality (jac + LP)
    def crit_body(s, groups, i):
        d = s.delta * (1.0 + 1e-6 * i)
        def one(g, xs, le, li, fx, dd, sc):
            omega, dd2, _ = solver._get_criticality((g,), xs, xs, le, li, fx,
                                                 dd, sc)
            return g._replace(n_evals=g.n_evals + (omega > 0))
        return (vm(one)(groups[0], s.x_s, s.l_e, s.l_i, s.fx, d, s.scal),)
    print(f"criticality (jac+LP):        {slope(crit_body)*1e3:8.2f} ms")

    # update_or_improve (the main-phase double-prepare + eval + fit)
    def uoi_body(s, groups, i):
        keys = jax.vmap(jax.random.fold_in)(s.key, s.iter_counter + i)
        d = s.delta * (1.0 + 1e-6 * i)
        improve = s.last_it_stat == 4
        return vm(lambda g, xs, xi, dd, fl, sc, k: ct.update_or_improve(
            g, xs, xi, dd, fl, scal=sc, key=k))(
            groups, s.x_s, s.x_indices, d, improve, s.scal, keys)
    print(f"update_or_improve:           {slope(uoi_body)*1e3:8.2f} ms")

    # trial-point phase (ladder + true eval + acceptance + stamp), chained
    # on the full state
    def make_trial_runner(K):
        def f(s):
            dvec = jnp.full((s.x_s.shape[-1],), -0.1, dtype)
            def body(i, sc):
                om = jnp.asarray(0.5, dtype) * (1.0 + 1e-6 * i)
                th = jnp.asarray(0.0, dtype)
                return jax.vmap(
                    lambda st: solver._trial_point(st, st, th, om, dvec))(sc)
            return jax.lax.fori_loop(0, K, body, s)
        return jax.jit(f)

    import time as _t
    def timed(f):
        out = f(state)
        jax.block_until_ready(out.x)
        t0 = _t.perf_counter()
        for _ in range(5):
            out = f(state)
        jax.block_until_ready(out.x)
        return (_t.perf_counter() - t0) / 5

    t_lo, t_hi = timed(make_trial_runner(1)), timed(make_trial_runner(9))
    print(f"trial phase:                 {(t_hi-t_lo)/8*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
