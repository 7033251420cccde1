"""Multistart vmap/sharding harness + benchmark problem tests."""

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import (
    compacted_multistart,
    default_mesh,
    multistart_optimize,
)
from morbit_tpu.problems.synthetic import (
    halton,
    halton_starts,
    make_dtlz,
    make_two_parabolas,
    make_zdt,
    zdt_objectives,
)


def test_halton_low_discrepancy():
    pts = halton(100, 3)
    assert pts.shape == (100, 3)
    assert np.all(pts >= 0) and np.all(pts <= 1)
    # base-2 first column: 1/2, 1/4, 3/4, ...
    assert np.allclose(pts[:3, 0], [0.5, 0.25, 0.75])


def test_zdt1_known_values():
    f1, f2 = zdt_objectives("zdt1", 5)
    x = jnp.zeros(5)
    assert np.isclose(float(f1(x)), 0.0)
    assert np.isclose(float(f2(x)), 1.0)  # g=1, f2 = 1-sqrt(0) = 1
    x = jnp.array([1.0, 0, 0, 0, 0])
    assert np.isclose(float(f2(x)), 0.0)  # on the Pareto front


def test_multistart_vmap_two_parabolas():
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(8, mop.lb, mop.ub)
    res = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    xs = np.asarray(res.x)
    assert xs.shape == (8, 2)
    # every run lands near the Pareto set (diagonal)
    assert np.all(np.abs(xs[:, 0] - xs[:, 1]) < 0.3)
    # runs terminate independently
    assert np.all(np.asarray(res.stop_code) > 1)


def test_multistart_sharded_mesh_matches_unsharded():
    """Sharded vmap is pure data parallelism over independent instances
    (SURVEY §5.8) — the full-solve result pytree must equal the unsharded
    run leaf for leaf."""
    mesh = default_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    mop = make_two_parabolas(lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=5, qp_iters=100)
    x0 = halton_starts(16, mop.lb, mop.ub)
    res = multistart_optimize(mop, x0, ac, dtype=jnp.float64, mesh=mesh)
    assert np.asarray(res.x).shape == (16, 2)
    assert np.all(np.isfinite(np.asarray(res.fx)))
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    for a, b in zip(jax.tree_util.tree_leaves(res),
                    jax.tree_util.tree_leaves(ref)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        # float64: ints exact, floats to 1e-12 (XLA may vectorize an op
        # differently per local batch shape — measured 1-ulp scratch-leaf
        # differences; f32 would diverge macroscopically via branch
        # amplification — see dryrun_multichip)
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
        else:
            np.testing.assert_array_equal(a, b)


def test_compacted_multistart_matches_plain():
    """Lane compaction must be exact: lanes are independent under vmap, so
    retiring converged lanes into smaller stage buckets replays identical
    per-lane math. Full result pytree (iterates, counters, databases,
    trajectory stamps) must match the plain vmapped solve leaf for leaf."""
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(16, mop.lb, mop.ub)
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    # stage_iters=3 forces several compaction rounds; ladder down to 2
    res = compacted_multistart(mop, x0, ac, dtype=jnp.float64, stage_iters=3,
                               bucket_ladder=(16, 8, 4, 2))
    # lanes converge at different iterations at this budget — otherwise
    # compaction is never exercised
    assert len(np.unique(np.asarray(ref.n_iterations))) > 1
    for a, b in zip(jax.tree_util.tree_leaves(res),
                    jax.tree_util.tree_leaves(ref)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        # same tolerance policy as the sharded-mesh test above: XLA may
        # vectorize an op differently per batch shape (1-ulp scratch-leaf
        # diffs at f64); ints (counters, stop codes, stamps) stay exact
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
        else:
            np.testing.assert_array_equal(a, b)


def test_compacted_stage_schedule_matches_plain():
    """Variable per-stage lengths (the offline-optimized schedules) and the
    reusable runner must replay the plain solve exactly; a second runner
    call reuses the compiled bucket programs."""
    from morbit_tpu.parallel.multistart import CompactedMultistart

    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(16, mop.lb, mop.ub)
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    run = CompactedMultistart(mop, ac, dtype=jnp.float64,
                              bucket_ladder=(16, 8, 4, 2),
                              stage_schedule=(3, 2, 4))
    res = run(x0)
    for a, b in zip(jax.tree_util.tree_leaves(res),
                    jax.tree_util.tree_leaves(ref)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
        else:
            np.testing.assert_array_equal(a, b)
    # runner reuse: second batch, same shapes -> no retrace, same answers
    res2 = run(x0)
    np.testing.assert_array_equal(np.asarray(res2.x), np.asarray(res.x))


def _assert_canon_equal(res, ref):
    """Leaf-exact equality after canonicalizing the dead buffer tails
    (rows >= count are dead storage by the solver's read contract; the
    fleet loop leaves junk there where the plain solve leaves frozen/zero
    rows)."""
    from morbit_tpu.parallel.multistart import canonicalize_buffer_tails

    res = res._replace(state=canonicalize_buffer_tails(res.state))
    ref = ref._replace(state=canonicalize_buffer_tails(ref.state))
    for a, b in zip(jax.tree_util.tree_leaves(res),
                    jax.tree_util.tree_leaves(ref)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
        else:
            np.testing.assert_array_equal(a, b)


def test_staged_multistart_matches_plain():
    """Staged-capacity execution must be exact: running the early
    iterations at the (smaller) capacity their cumulative bound implies and
    zero-row padding between stages replays identical per-lane math — the
    buffer tails it omits are masked, append-only rows that the full run
    never touches either.  With fleet=False the full result pytree must
    match the plain vmapped solve leaf for leaf (the state databases differ
    only in trailing zero rows, which _resize_dbs pads back to the full
    capacity); the default fleet mode must match after canonicalizing the
    dead buffer tails."""
    from morbit_tpu.parallel.multistart import StagedMultistart

    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(8, mop.lb, mop.ub)
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    run = StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(3, 6),
                           fleet=False)
    # the schedule must actually stage (capacities strictly grow)
    assert len(run.schedule) >= 1
    assert run.schedule[0][1][0] < run.solver.db_capacity
    assert run.schedule[0][1][1] < run.solver.T
    res = run(x0)
    for a, b in zip(jax.tree_util.tree_leaves(res),
                    jax.tree_util.tree_leaves(ref)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        # same tolerance policy as the compaction test above
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
        else:
            np.testing.assert_array_equal(a, b)
    # runner reuse: second batch, same shapes -> no retrace, same answers
    res2 = run(x0)
    np.testing.assert_array_equal(np.asarray(res2.x), np.asarray(res.x))


def test_staged_fleet_matches_plain_masked():
    """Fleet mode (batch-level while_loop, big append-only buffers exempt
    from lane freezing) must replay bit-identical per-lane math: every leaf
    equals the plain vmapped solve after zeroing the dead buffer tails —
    including db/traj fill counters, eval counters, stop codes and the
    stamped trajectory rows below count."""
    from morbit_tpu.parallel.multistart import StagedMultistart

    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(8, mop.lb, mop.ub)
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    run = StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(3, 6))
    assert run.fleet  # auto-enabled: use_db=True, var_scaler_update default
    _assert_canon_equal(run(x0), ref)


def test_staged_fleet_matches_plain_constrained():
    """Fleet equivalence on an NL-constrained problem: the normal-step,
    restoration and filter paths also write the databases (candidate
    bundles, restoration evaluations) — all append-only, so the fleet
    exemption must stay exact there too.  Starts straddle the feasible
    region so both compatible and incompatible iterations occur."""
    from morbit_tpu.core.mop import MOP
    from morbit_tpu.parallel.multistart import StagedMultistart

    cfg = RbfConfig(kernel="cubic")
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    mop.add_nl_ineq_constraint(lambda x: jnp.sum(x ** 2) - 1.0,
                               model_cfg=cfg)
    ac = AlgorithmConfig(max_iter=10, qp_iters=100)
    x0 = np.asarray(halton_starts(6, mop.lb, mop.ub))
    x0[:2] = [[0.3, -0.2], [-0.5, 0.4]]  # two feasible starts
    # the start batch must straddle feasibility so both paths run
    infeas = np.sum(x0 ** 2, axis=1) > 1.0
    assert infeas.any() and not infeas.all()
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    run = StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(3, 6))
    assert run.fleet
    _assert_canon_equal(run(x0), ref)


def _assert_canon_close(res, ref, rtol=1e-9):
    """Like :func:`_assert_canon_equal` but float leaves compare with a
    (tight) tolerance while integer leaves stay bit-exact.  Lane compaction
    runs a lane's iterations inside stage programs compiled at DIFFERENT
    batch widths than the plain solve; XLA fuses/vectorizes each width
    differently (width 1 especially: batched ops lower to unbatched
    kernels), so float results match only up to FMA/reassociation — last
    bits, measured <= 7e-12 relative — while every integer observable
    (stop codes, iteration counts, eval counters, db fill counts) must
    still be identical."""
    from morbit_tpu.parallel.multistart import canonicalize_buffer_tails

    res = res._replace(state=canonicalize_buffer_tails(res.state))
    ref = ref._replace(state=canonicalize_buffer_tails(ref.state))
    for a, b in zip(jax.tree_util.tree_leaves(res),
                    jax.tree_util.tree_leaves(ref)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=rtol, atol=rtol)
        else:
            np.testing.assert_array_equal(a, b)


def test_staged_widths_match_plain():
    """On-device lane compaction (per-stage widths) must be equivalent for
    ANY widths: active lanes are stably sorted to the front on device and
    the stage runs on the head only; lanes an (intentionally) starving
    width leaves behind are caught by the mandatory full-width
    to-completion stage.  Checked against the plain vmapped solve after
    canonicalizing dead buffer tails, for (a) generous widths, (b) a
    starving width of 1, (c) a compacted final stage (len(widths) ==
    len(schedule) + 1), and (d) fleet=False.  Floats compare tolerantly
    (see :func:`_assert_canon_close`: different stage widths compile to
    differently-fused XLA programs, so per-lane floats agree only to
    reassociation); all integer observables must be bit-identical."""
    from morbit_tpu.parallel.multistart import StagedMultistart

    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(8, mop.lb, mop.ub)
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    for widths, fleet in (((8, 6), None), ((4, 1), None), ((8, 4, 4), None),
                          ((6, 4), False)):
        run = StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(3, 6),
                               fleet=fleet, widths=widths)
        assert len(run.schedule) == 2
        _assert_canon_close(run(x0), ref)


def test_staged_widths_validation():
    from morbit_tpu.parallel.multistart import StagedMultistart

    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    for bad in ((4,), (4, 4, 4, 4), (4, 0)):
        try:
            StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(3, 6),
                             widths=bad)
            assert False, f"expected ValueError for widths={bad}"
        except ValueError:
            pass


def test_staged_widths_sharded_mesh_match_plain():
    """widths + mesh = PER-SHARD lane compaction (``jax.shard_map``, no
    collectives — a global sort across shards would be a resharding):
    each shard stably sorts its own lanes and runs the stage on
    ``ceil(width / n_devices)`` head lanes.  Must match the plain
    (unsharded, uncompacted) vmapped solve under the usual compaction
    tolerance policy (ints bit-identical, floats to reassociation)."""
    from morbit_tpu.parallel.multistart import StagedMultistart, default_mesh

    mesh = default_mesh()
    assert mesh.devices.size == 8
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(16, mop.lb, mop.ub)
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    run = StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(3, 6),
                           widths=(16, 8, 8), mesh=mesh)
    res = run(x0)
    # solution-level observables stay tight ...
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.fx), np.asarray(ref.fx),
                               rtol=1e-9, atol=1e-9)
    # ... while trajectory stamps include near-cancellation quotients
    # (rho = (f - f_trial)/(m - m_trial), omega) that amplify the per-shard
    # reassociation noise (2-lane shards run width-1 stages, which lower
    # batched ops to unbatched kernels) to ~1e-5 relative on a handful of
    # entries; every integer observable is still bit-identical and every
    # other float leaf (db sites/values, iterate, filter) matches < 1e-12.
    _assert_canon_close(res, ref, rtol=5e-5)


def test_fleet_guard_rejects_ineligible_config():
    """fleet=True must raise when the append-only invariant does not hold
    (use_db=False rewrites rows < count each iteration); the auto mode must
    silently fall back to per-lane while_loops."""
    from morbit_tpu.parallel.multistart import StagedMultistart

    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=6, qp_iters=100, use_db=False)
    try:
        StagedMultistart(mop, ac, dtype=jnp.float64, fleet=True)
        assert False, "expected ValueError"
    except ValueError:
        pass
    run = StagedMultistart(mop, ac, dtype=jnp.float64)
    assert not run.fleet


def test_staged_multistart_sharded_mesh():
    """Staged runner over a device mesh: pure data parallelism, so the
    result must match the unsharded staged run (same tolerance policy as
    the plain sharded-mesh test)."""
    from morbit_tpu.parallel.multistart import StagedMultistart

    mesh = default_mesh()
    mop = make_two_parabolas(lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=6, qp_iters=100)
    x0 = halton_starts(16, mop.lb, mop.ub)
    res = StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(2,),
                           mesh=mesh)(x0)
    ref = StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(2,))(x0)
    for a, b in zip(jax.tree_util.tree_leaves(res),
                    jax.tree_util.tree_leaves(ref)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
        else:
            np.testing.assert_array_equal(a, b)


def test_compacted_multistart_f32_smoke():
    """float32 compaction smoke: ulp-level lowering differences per bucket
    shape can flip individual acceptance branches (same caveat as the
    sharded-mesh test), so assert solver-quality invariants rather than
    bitwise equality."""
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(16, mop.lb, mop.ub)
    res = compacted_multistart(mop, x0, ac, dtype=jnp.float32, stage_iters=3,
                               bucket_ladder=(16, 8, 4))
    xs = np.asarray(res.x)
    assert xs.shape == (16, 2)
    assert np.all(np.asarray(res.stop_code) > 1)
    assert np.all(np.isfinite(np.asarray(res.fx)))
    # most runs land near the Pareto set (diagonal of two-parabolas); a few
    # lanes legitimately stop CRITICAL at iteration 1 at f32 (identical in
    # the plain vmapped solve — not a compaction artifact)
    assert np.median(np.abs(xs[:, 0] - xs[:, 1])) < 0.1


def test_zdt_exact_solve_runs():
    mop = make_zdt("zdt1", 5)
    res = multistart_optimize(mop, halton_starts(4, mop.lb, mop.ub),
                              AlgorithmConfig(max_iter=10, qp_iters=100),
                              dtype=jnp.float64)
    fx = np.asarray(res.fx)
    assert np.all(np.isfinite(fx))
    # criticality decreased vs start: f2 should drop toward the front
    assert np.all(fx[:, 1] < 6.0)


def test_dtlz2_runs():
    mop = make_dtlz(2, 4, M=2)
    res = multistart_optimize(mop, halton_starts(2, mop.lb, mop.ub),
                              AlgorithmConfig(max_iter=8, qp_iters=100),
                              dtype=jnp.float64)
    assert np.all(np.isfinite(np.asarray(res.fx)))


def test_suggest_widths_probe_protocol():
    """``suggest_widths`` derives a per-stage compaction schedule from a
    probe fleet's ``n_iterations``: one entry per bounded stage plus a
    compacted to-completion entry, monotone with the iteration CDF, and the
    derived-widths runner stays equivalent to the plain vmapped solve (the
    catch-all guarantees that for ANY widths; this pins the protocol)."""
    from morbit_tpu.parallel.multistart import (
        StagedMultistart, suggest_widths)

    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(8, mop.lb, mop.ub)
    probe = StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(3, 6))
    res = probe(x0)
    ws = suggest_widths(probe, res.n_iterations, quantum=2)
    assert len(ws) == len(probe.schedule) + 1
    assert ws[0] == 8 and all(1 <= w <= 8 for w in ws)
    assert all(a >= b for a, b in zip(ws[1:], ws[2:]))  # CDF is monotone
    run = StagedMultistart(mop, ac, dtype=jnp.float64, schedule=(3, 6),
                           widths=ws)
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    _assert_canon_close(run(x0), ref)


def test_suggest_db_capacity_probe_protocol():
    """Probe-derived db capacity (per-trip capacity pricing, round-5
    roadmap item 2): ``suggest_db_capacity`` of a probe fleet is well below
    the worst-case heuristic; a ``tuned(db_capacity=...)`` rerun matches
    the probe on every observable (capacity never enters the numerics while
    the overflow flag stays clear); a deliberately undersized capacity
    raises the sticky ``capacity_overflowed`` guard instead of silently
    corrupting."""
    from morbit_tpu.parallel.multistart import (
        StagedMultistart, capacity_overflowed, suggest_db_capacity)

    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(8, mop.lb, mop.ub)
    probe = StagedMultistart(mop, ac, dtype=jnp.float64)
    ref = probe(x0)
    assert not capacity_overflowed(ref)

    cap = suggest_db_capacity(ref, quantum=8)
    assert cap < probe.solver.db_capacity  # heuristic is far above fill
    run = probe.tuned(ref.n_iterations, quantum=2, db_capacity=cap)
    assert run.solver.db_capacity == cap
    res = run(x0)
    assert not capacity_overflowed(res)
    for name in ("stop_code", "n_iterations", "n_evals"):
        np.testing.assert_array_equal(np.asarray(getattr(res, name)),
                                      np.asarray(getattr(ref, name)))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.fx), np.asarray(ref.fx),
                               rtol=1e-9, atol=1e-9)
    for ga, gb in zip(res.state.groups, ref.state.groups):
        np.testing.assert_array_equal(np.asarray(ga.db.count),
                                      np.asarray(gb.db.count))
        np.testing.assert_array_equal(np.asarray(ga.n_evals),
                                      np.asarray(gb.n_evals))

    # undersized -> the sticky flag fires (self-verifying tight runs)
    tiny = probe.tuned(ref.n_iterations, quantum=2, db_capacity=8)
    res_t = tiny(x0)
    assert capacity_overflowed(res_t)


def test_suggest_schedule():
    """``suggest_schedule`` places stage bounds at retirement quantiles
    (plus a p99 cap) — increasing, strictly inside (0, max_iter), deduped —
    and the derived (schedule, widths) runner stays equivalent to the plain
    vmapped solve (ANY schedule/widths are exact; this pins the combined
    probe protocol end-to-end)."""
    from morbit_tpu.parallel.multistart import (
        StagedMultistart, suggest_schedule, suggest_widths)

    ni = np.array([1, 2, 3, 3, 4, 6, 8, 11] * 4)
    sched = suggest_schedule(ni, max_iter=12, n_stages=4)
    assert sched == tuple(sorted(set(sched)))
    assert all(0 < t < 12 for t in sched)
    # degenerate probe (every lane retires at once) still yields a valid,
    # possibly empty, schedule
    assert suggest_schedule(np.full(16, 12), max_iter=12) == ()

    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=12, qp_iters=100)
    x0 = halton_starts(8, mop.lb, mop.ub)
    probe = StagedMultistart(mop, ac, dtype=jnp.float64)
    res = probe(x0)
    # .tuned() = suggest_schedule + suggest_widths + rebuild in one call
    run = probe.tuned(res.n_iterations, n_stages=3, quantum=2)
    assert run.widths is not None and run.widths[0] == 8
    # constructor merges same-capacity stages, so the kept bounds are a
    # subset of the suggested ones
    assert set(t for t, _ in run.schedule) <= set(suggest_schedule(
        res.n_iterations, ac.max_iter, n_stages=3))
    ref = multistart_optimize(mop, x0, ac, dtype=jnp.float64)
    _assert_canon_close(run(x0), ref)
