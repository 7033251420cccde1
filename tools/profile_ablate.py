"""Slope-based ablation profile of the vmapped solver iteration.

Per-call dispatch through the TPU tunnel costs ~3 ms per pytree leaf
(tools/profile_fine.py: identity on the batched state = 144 ms), so naive
stage timing is meaningless. Here each measurement runs K iterations inside
ONE jit (lax.fori_loop) and the per-iteration cost is the slope between
K=2 and K=12; ablations monkeypatch one stage to a no-op and the stage cost
is the slope difference vs the full iterate.

Run:  python tools/profile_ablate.py [B]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import morbit_tpu.core.algorithm as alg
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas


def slope_ms(solver, state, k_lo=2, k_hi=12, reps=5):
    f_step = jax.vmap(solver.iterate)

    def make(K):
        return jax.jit(lambda s: jax.lax.fori_loop(
            0, K, lambda i, st: f_step(st), s))

    def timed(f):
        out = f(state)
        jax.block_until_ready(out.x)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(state)
        jax.block_until_ready(out.x)
        return (time.perf_counter() - t0) / reps

    t_lo = timed(make(k_lo))
    t_hi = timed(make(k_hi))
    return (t_hi - t_lo) / (k_hi - k_lo) * 1e3


def fresh_solver():
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    # large max_iter so the fori_loop iterations never hit the stop branch,
    # with db/trajectory capacities pinned to the bench config's sizes
    ac = AlgorithmConfig(max_iter=10_000, qp_iters=100, db_capacity=157,
                         trajectory_capacity=12)
    return build_solver(mop, ac, jnp.float32)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    dtype = jnp.float32
    print("platform:", jax.devices()[0].platform, " B =", B)

    solver = fresh_solver()
    x0 = jnp.asarray(halton_starts(B, solver.mop.lb, solver.mop.ub), dtype)
    state = jax.jit(jax.vmap(solver.initialize))(x0)
    state = jax.jit(jax.vmap(solver.iterate))(state)  # one real step in
    jax.block_until_ready(state.x)

    base = slope_ms(solver, state)
    print(f"full iterate slope:           {base:8.2f} ms/iter")

    def report(name, patch):
        s = fresh_solver()
        patch(s)
        d = slope_ms(s, state)
        print(f"{name:<28s}  {d:8.2f} ms/iter   (stage ~ {base - d:6.2f} ms)")

    # --- ablations ---------------------------------------------------------
    def no_update(s):
        s.container.update_or_improve = (
            lambda groups, *a, **k: groups)
    report("w/o surrogate update", no_update)

    def no_fit(s):
        for ops in s.container.ops:
            ops.fit = lambda model, db, ctx: model
    report("w/o rbf fit (phase 2)", no_fit)

    def no_prepare(s):
        for ops in s.container.ops:
            ops.prepare = lambda model, db, ctx, efl: (model, db)
            ops.prepare_improve = lambda model, db, ctx: (model, db)
    report("w/o rbf prepare (phase 1)", no_prepare)

    def no_crit_qp(s):
        n = s.mop.n_vars
        s._get_criticality = (
            lambda groups, x_s, x_n_s, le, li, fx, delta, scal: (
                jnp.asarray(0.5, s.dtype),
                jnp.full((n,), -0.1, s.dtype), groups))
    report("w/o criticality jac+LP", no_crit_qp)

    def no_crit_routine(s):
        s._criticality_and_trial = (
            lambda state, inter, theta_k, theta_n, theta_k_zero, omega, d:
                s._trial_point(state, inter, theta_k, omega, d))
    report("w/o criticality while_loop", no_crit_routine)

    def no_backtrack(s):
        def bt(x_n, d, sigma0, omega, eval_mx, states, cfg, eval_mx_batch=None):
            x_t = x_n + sigma0 * d
            mx_t, states = eval_mx(states, x_t)
            return x_t, mx_t, sigma0 * d, states
        alg.backtrack = bt
    report("w/o backtracking ladder", no_backtrack)
    import morbit_tpu.core.descent as desc
    alg.backtrack = desc.backtrack  # restore

    def no_true_eval(s):
        m = s.mop
        def fake(states, x_s, scal=None):
            fx = jnp.zeros((m.m_obj,), s.dtype)
            ce = jnp.zeros((m.m_ce,), s.dtype)
            ci = jnp.zeros((m.m_ci,), s.dtype)
            idx = jnp.zeros((len(m.groups),), jnp.int32)
            return fx, ce, ci, states, idx
        s.container.evaluate_true = fake
    report("w/o true eval + db insert", no_true_eval)

    def no_stamp(s):
        s._stamp = lambda traj, *a, **k: traj
    report("w/o trajectory stamp", no_stamp)


if __name__ == "__main__":
    main()
