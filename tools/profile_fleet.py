"""Prototype: fleet loop with append-only big buffers exempt from lane freezing.

A vmapped ``solve_from_state`` is a batched ``while_loop``: every trip, JAX's
while-batching selects EVERY carry leaf per lane (``where(lane_continues,
new, old)``) — including the capacity-sized ``db.data`` (cap, n+m+1) and
``traj.data`` (T, W) buffers.  But both buffers are APPEND-ONLY with a
``count`` fill pointer: writes land one-hot at ``count`` (``dbm.add_site``,
``Solver._stamp``) and every read masks by ``count`` (``dbm.valid_mask``,
explicit row indices from metas).  So if ``count`` stays frozen for a
stopped lane, junk rows a re-executed iterate writes at ``slot >= count``
are INVISIBLE — the big buffers do not need the freeze select at all.

This tool runs the manual "fleet loop" (batch-level while_loop whose body
vmaps ``iterate`` and freezes stopped lanes per leaf EXCEPT ``db.data`` /
``traj.data``), verifies count-masked equality against the plain vmapped
solve, and times both at the bench and reference-default budgets.

Guards (checked here, enforced by any production runner):
- ``ac.use_db`` must be True (``compact_to_row`` rewrites rows < count);
- ``ac.var_scaler_update != 'model'`` (the rescale rewrites rows < count).

Run on the TPU tunnel:  python tools/profile_fleet.py [B]
"""

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.enums import STOP_CODE
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas


def fleet_solve_fn(solver):
    def step(states):
        active = states.stop_code == STOP_CODE.CONTINUE
        new = jax.vmap(solver.iterate)(states)

        def sel(a, b):
            m = active.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)

        out = jax.tree_util.tree_map(sel, new, states)
        # exempt the append-only big buffers: junk rows >= frozen count are
        # invisible to every (count-masked) read
        groups = tuple(
            go._replace(db=dataclasses.replace(go.db, data=gn.db.data))
            for gn, go in zip(new.groups, out.groups))
        traj = dataclasses.replace(out.traj, data=new.traj.data)
        return out._replace(groups=groups, traj=traj)

    def solve(states):
        return jax.lax.while_loop(
            lambda s: jnp.any(s.stop_code == STOP_CODE.CONTINUE),
            step, states)

    return solve


def masked_equal(plain, fleet):
    """All non-exempt leaves bit-equal; exempt buffers equal below count."""
    ok = True
    # identify the exempt leaves by IDENTITY (tree_leaves returns the same
    # array objects), not by key path — the state pytrees register
    # positional keys, so string matching on ".data" silently fails
    exempt = {id(plain.traj.data)}
    exempt |= {id(g.db.data) for g in plain.groups}
    pl, fl = jax.tree_util.tree_leaves_with_path(plain), \
        jax.tree_util.tree_leaves_with_path(fleet)
    for (pa, a), (pb, b) in zip(pl, fl):
        path = jax.tree_util.keystr(pa)
        if id(a) in exempt:
            continue  # checked below, count-masked
        if not np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True):
            print(f"  MISMATCH at {path}")
            ok = False
    B = plain.x.shape[0]
    rows = jnp.arange(plain.traj.data.shape[1])
    m = (rows[None, :] < plain.traj.count[:, None])[:, :, None]
    if not np.array_equal(
            np.asarray(jnp.where(m, plain.traj.data, 0)),
            np.asarray(jnp.where(m, fleet.traj.data, 0)), equal_nan=True):
        print("  MISMATCH at traj.data (count-masked)")
        ok = False
    for i, (gp, gf) in enumerate(zip(plain.groups, fleet.groups)):
        rows = jnp.arange(gp.db.data.shape[1])
        m = (rows[None, :] < gp.db.count[:, None])[:, :, None]
        if not np.array_equal(
                np.asarray(jnp.where(m, gp.db.data, 0)),
                np.asarray(jnp.where(m, gf.db.data, 0)), equal_nan=True):
            print(f"  MISMATCH at groups[{i}].db.data (count-masked)")
            ok = False
    return ok


def run_config(max_iter, qp_iters, B, n_rep=6):
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=max_iter, qp_iters=qp_iters)
    solver = build_solver(mop, ac, dtype)
    assert ac.use_db and ac.var_scaler_update != "model"
    x0 = jnp.asarray(halton_starts(B, mop.lb, mop.ub), dtype)
    states0 = jax.jit(jax.vmap(solver.initialize))(x0)
    jax.block_until_ready(states0.x)

    plain = jax.jit(jax.vmap(solver.solve_from_state))
    fleet = jax.jit(fleet_solve_fn(solver))

    def timed(f, tag):
        t0 = time.perf_counter()
        out = f(states0)
        jax.block_until_ready(out.x)
        compile_s = time.perf_counter() - t0
        # sustained: distinct pre-staged inputs, one final block
        variants = [states0._replace(dlt=states0.dlt * (1 + 1e-6 * (r + 1)))
                    for r in range(n_rep)]
        jax.block_until_ready(variants)
        t0 = time.perf_counter()
        outs = [f(v) for v in variants]
        jax.block_until_ready(outs[-1].x)
        dt = (time.perf_counter() - t0) / n_rep
        print(f"  {tag}: compile+first {compile_s:7.1f}s  sustained "
              f"{dt*1e3:8.2f} ms/batch  {B/dt:10.1f} runs/s", flush=True)
        return out

    print(f"max_iter={max_iter} qp_iters={qp_iters} B={B}", flush=True)
    out_p = timed(plain, "plain vmapped")
    out_f = timed(fleet, "fleet loop   ")
    print("  equality:", "OK" if masked_equal(out_p, out_f) else "FAILED",
          flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    print("platform:", jax.devices()[0].platform, flush=True)
    run_config(10, 100, B)
    run_config(100, 400, B)


if __name__ == "__main__":
    main()
