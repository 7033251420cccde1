"""Batched / sharded multistart optimization.

The TPU-native replacement for the reference's ``Threads.@threads``
benchmark loop over independent optimizer runs
(``examples/large_scale_benchmarks.jl:253-275``, SURVEY.md §2 parallelism
inventory): the whole solver is a pure function, so

* ``jax.vmap`` over the starting-point axis turns N independent
  trust-region runs into batched dense algebra (batched Gram solves, batched
  ADMM QPs -> MXU-saturating GEMMs), with per-instance termination handled by
  the while-loop batching rule (finished instances become no-ops);
* ``jax.sharding`` over a device ``Mesh`` splits the batch across chips.
  Instances are independent — no collectives are required (SURVEY.md §5.8),
  so the sharding is pure data parallelism over ICI and scales linearly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from morbit_tpu.core.algorithm import OptimizeResult, Solver
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.mop import MOP, CompiledMOP, compile_mop


def build_solver(mop, algo_config: Optional[AlgorithmConfig] = None,
                 dtype=jnp.float32) -> Solver:
    ac = algo_config or AlgorithmConfig()
    cmop = mop if isinstance(mop, CompiledMOP) else compile_mop(mop, ac.combine_models)
    return Solver(cmop, ac, dtype)


def multistart_optimize(
    mop,
    x0_batch,
    algo_config: Optional[AlgorithmConfig] = None,
    dtype=jnp.float32,
    mesh: Optional[Mesh] = None,
    donate: bool = False,
) -> OptimizeResult:
    """Run one full optimize() per row of ``x0_batch`` (B, n), batched.

    With ``mesh`` (1-D over axis name 'batch'), the batch is sharded across
    devices; B must be divisible by the device count.
    """
    solver = build_solver(mop, algo_config, dtype)
    x0_batch = jnp.asarray(x0_batch, dtype)

    run = jax.vmap(solver.solve)
    if mesh is not None:
        in_sharding = NamedSharding(mesh, P("batch", None))
        run = jax.jit(run, in_shardings=(in_sharding,))
        x0_batch = jax.device_put(x0_batch, in_sharding)
    else:
        run = jax.jit(run)
    return run(x0_batch)


def default_mesh(axis: str = "batch") -> Mesh:
    devs = np.array(jax.devices())
    return Mesh(devs, (axis,))


def _cap_at(solver, cum_iters: int) -> int:
    """Database capacity bound after ``cum_iters`` outer iterations —
    ``resolved_db_capacity`` evaluated at ``max_iter=cum_iters`` (monotone in
    ``max_iter``), clamped to the full-run capacity. Exact: a lane that has
    executed only ``t`` outer iterations can hold at most this many rows
    (same safe upper bound that sizes the full run)."""
    import dataclasses as _dc

    ac = solver.ac
    full = solver.db_capacity
    # an explicit capacity (e.g. suggest_db_capacity) CLIPS the per-stage
    # heuristic instead of disabling staging: the heuristic at t iterations
    # is a safe fill bound whatever the total capacity is, so stages below
    # the explicit cap still run tighter
    cap = _dc.replace(ac, max_iter=int(cum_iters),
                      db_capacity=-1).resolved_db_capacity(
        solver.mop.n_vars, *solver._cap_terms)
    return min(int(cap), int(full))


def _resize_dbs(states, new_cap: int):
    """Grow (zero-row pad) or trim each group database to ``new_cap`` rows
    along the capacity axis. Exact: rows are append-only, row indices are
    stable under end-padding, and trimming only ever removes rows above
    every lane's fill count (callers pass the per-stage bound)."""
    import dataclasses as _dc

    def fix(g):
        data = g.db.data
        cap = data.shape[-2]
        if new_cap == cap:
            return g
        if new_cap > cap:
            pad = jnp.zeros(data.shape[:-2] + (new_cap - cap, data.shape[-1]),
                            data.dtype)
            data2 = jnp.concatenate([data, pad], axis=-2)
        else:
            data2 = data[..., :new_cap, :]
        return g._replace(db=_dc.replace(g.db, data=data2))

    return states._replace(groups=tuple(fix(g) for g in states.groups))


def _traj_cap_at(solver, cum_iters: int) -> int:
    """Trajectory row bound after ``cum_iters`` outer iterations: exactly
    one stamp per iterate plus the initialization stamp, so
    ``resolved_trajectory_capacity`` at ``max_iter=cum_iters`` covers it.
    An explicit user ``trajectory_capacity`` is honored verbatim."""
    import dataclasses as _dc

    ac = solver.ac
    if ac.trajectory_capacity > 0:
        return solver.T
    cap = _dc.replace(ac, max_iter=int(cum_iters)) \
             .resolved_trajectory_capacity()
    return min(int(cap), int(solver.T))


def _resize_traj(states, new_T: int):
    """Grow (zero-row pad) or trim the trajectory to ``new_T`` rows.  Exact
    for the same reason as :func:`_resize_dbs`: stamps are append-only
    one-hot row writes at ``count``, stable under end-padding, and callers
    pass a bound that exceeds every lane's stamp count."""
    import dataclasses as _dc

    traj = states.traj
    data = traj.data
    T = data.shape[-2]
    if new_T == T:
        return states
    if new_T > T:
        pad = jnp.zeros(data.shape[:-2] + (new_T - T, data.shape[-1]),
                        data.dtype)
        data2 = jnp.concatenate([data, pad], axis=-2)
    else:
        data2 = data[..., :new_T, :]
    return states._replace(traj=_dc.replace(traj, data=data2))


def fleet_eligible(ac: AlgorithmConfig) -> bool:
    """Whether the fleet-loop big-buffer exemption (:func:`_fleet_bounded`)
    is sound for this config.  It requires the databases and the trajectory
    to be strictly APPEND-ONLY below their fill counter:

    * ``use_db=False`` rewrites rows < count every iteration
      (``compact_to_row``), and
    * ``var_scaler_update == 'model'`` rescales every stored site in place,

    so both disqualify; everything else preserves the invariant pinned in
    ``database.add_site`` (inserts touch only the slot at ``count``,
    ``eval_missing`` only fills values of not-yet-evaluated rows)."""
    return bool(ac.use_db) and ac.var_scaler_update != "model"


def _fleet_splice_big_buffers(selected, new):
    """Take the (possibly junk-bearing) db/trajectory ``data`` buffers from
    ``new`` into the lane-frozen ``selected`` state — see
    :func:`_fleet_bounded` for why this is exact."""
    groups = tuple(
        go._replace(db=dataclasses.replace(go.db, data=gn.db.data))
        for gn, go in zip(new.groups, selected.groups))
    traj = dataclasses.replace(selected.traj, data=new.traj.data)
    return selected._replace(groups=groups, traj=traj)


def _fleet_bounded(solver, k: Optional[int] = None):
    """Batch-level while_loop over ``vmap(iterate)`` with the big
    append-only buffers exempt from lane freezing ("fleet loop").

    A ``vmap``-ed ``solve_from_state`` is a batched ``while_loop``: JAX's
    while-batching rule freezes finished lanes by selecting EVERY carry
    leaf per trip (``where(lane_continues, new, old)``) — including the
    capacity-sized ``db.data`` (cap, n+m+1) and ``traj.data`` (T, W)
    buffers, whose selects dominate the capacity-proportional per-trip
    floor (tools/profile_trip_fixed.py, tools/profile_fleet.py: 16.6 ->
    13.8 ms/batch at the bench config on v5e).

    Both buffers are APPEND-ONLY with a ``count`` fill pointer: writes land
    one-hot at ``count`` (``database.add_site``, ``Solver._stamp``) and
    every read masks by ``count`` (``database.valid_mask``, explicit row
    indices from model metas).  With ``count`` itself frozen by the normal
    select, the junk rows a re-executed ``iterate`` writes for a stopped
    lane land at ``slot >= count`` and are INVISIBLE to every read — so the
    big ``data`` leaves can skip the freeze select entirely.  Per-lane math
    is bit-identical to the plain vmapped solve; only the invisible buffer
    tails (rows >= count) differ (:func:`canonicalize_buffer_tails` zeroes
    them for comparisons/checkpoints).  Soundness guards:
    :func:`fleet_eligible`.

    ``k``: static per-lane iteration bound (``None`` = run to completion).
    The scalar trip counter bounds every lane identically to the per-lane
    ``j`` carry in the vmapped form: a lane active at trip j has executed
    exactly j iterations since entry.
    """
    from morbit_tpu.core.enums import STOP_CODE

    def run(states):
        def cond(c):
            st, j = c
            alive = jnp.any(st.stop_code == STOP_CODE.CONTINUE)
            return alive if k is None else alive & (j < k)

        def body(c):
            st, j = c
            active = st.stop_code == STOP_CODE.CONTINUE
            new = jax.vmap(solver.iterate)(st)

            def sel(a, b):
                m = active.reshape(active.shape + (1,) * (a.ndim - 1))
                return jnp.where(m, a, b)

            out = jax.tree_util.tree_map(sel, new, st)
            return _fleet_splice_big_buffers(out, new), j + jnp.int32(1)

        st, _ = jax.lax.while_loop(cond, body, (states, jnp.int32(0)))
        return st

    return run


def canonicalize_buffer_tails(states):
    """Zero the invisible tail rows (``row >= count``) of every group
    database and of the trajectory buffer.

    The solver's contract is that those rows are dead storage (every read
    masks by the fill counter); the fleet loop (:func:`_fleet_bounded`)
    leaves junk there where the plain vmapped solve leaves frozen/zero
    rows.  Canonicalizing makes states from different runners bit-comparable
    and checkpoint files deterministic.  Works on unbatched and batched
    states alike."""

    def zero_tail(data, count):
        rows = jnp.arange(data.shape[-2])
        m = rows < count[..., None] if count.ndim else rows < count
        return jnp.where(m[..., None], data, jnp.zeros((), data.dtype))

    groups = tuple(
        g._replace(db=dataclasses.replace(
            g.db, data=zero_tail(g.db.data, g.db.count)))
        for g in states.groups)
    traj = dataclasses.replace(
        states.traj, data=zero_tail(states.traj.data, states.traj.count))
    return states._replace(groups=groups, traj=traj)


class StagedMultistart:
    """One-jit staged-capacity multistart (no host syncs, no compaction).

    A plain ``vmap``-ed solve allocates the database at the worst-case
    capacity ``resolved_db_capacity(max_iter)`` from iteration 0, and the
    per-iteration device cost is dominated by capacity-proportional work
    (O(capacity) selection scans, one-hot insert writes, while-loop boundary
    buffer copies). But a lane that has executed only ``t`` outer iterations
    can hold at most ``resolved_db_capacity(max_iter=t)`` rows — so the
    early iterations (where ALL lanes are active) can run at a much smaller
    capacity, bit-exactly (rows are append-only and indices are stable under
    end-padding; the same invariant :class:`CompactedMultistart` stages on).

    This runner unrolls a static ``schedule`` of cumulative iteration bounds
    inside ONE jitted program: each stage is a lane-bounded
    ``while_loop`` (``stop_code == CONTINUE and j < k``) at the capacity its
    bound implies, databases are zero-row padded between stages, and the
    final stage runs to completion at full capacity. Unlike
    :class:`CompactedMultistart` there are no host round-trips, no lane
    gather/scatter, and exactly one compile — the TPU-native answer to the
    reference benchmark loop's dynamic scheduling
    (``examples/large_scale_benchmarks.jl:253-275``) for the common case
    where the budget (``max_iter``) far exceeds the typical lane's
    iteration count.

    Results equal :func:`multistart_optimize` exactly: per-lane math is
    unchanged, only the (masked, append-only) buffer tails differ
    (tests/test_multistart.py).

    ``schedule``: increasing cumulative iteration bounds strictly below
    ``max_iter`` (default: ``max_iter/16, /8, /4, /2`` — geometric, so the
    capacity-cost integral tracks the lane-retirement CDF within ~2x without
    problem knowledge). Stages whose capacity already equals the next
    stage's are merged away.

    ``fleet``: run each stage as a batch-level "fleet loop" with the big
    append-only buffers exempt from lane freezing (:func:`_fleet_bounded`)
    — same per-lane math, measurably cheaper trips. ``None`` (default)
    auto-enables when :func:`fleet_eligible`; ``True`` raises if the config
    disqualifies. With fleet on, the dead buffer tails (rows >= count) of
    the returned state carry junk instead of zeros — canonicalize with
    :func:`canonicalize_buffer_tails` before comparing states across
    runners.

    ``widths``: optional per-stage LANE widths — on-device lane compaction
    (the TPU-native answer to the reference benchmark loop never spending a
    core on a finished run, ``examples/large_scale_benchmarks.jl:253-275``,
    without :class:`CompactedMultistart`'s per-stage host round-trips).
    Lane retirement is heavily front-loaded (1024 -> ~565 active after 10
    iterations -> ~121 after 20 at the reference budget,
    tools/profile_compaction.py), yet a batched while_loop pays every trip
    for ALL lanes. Before a stage whose width ``w < B``, the batch is
    stably argsorted active-lanes-first ON DEVICE and the stage while_loop
    runs on the first ``w`` lanes only; frozen lanes rejoin the sort at the
    next boundary, and the mandatory full-width to-completion stage at the
    end catches any lane a too-narrow width starved — so ANY widths are
    equivalent (per-lane math is permutation-invariant under vmap), only
    the wall-clock varies.  Equivalence caveat: a compacted stage compiles
    at batch width ``w``, and XLA fuses/vectorizes each width differently
    (width 1 lowers batched ops to unbatched kernels), so per-lane floats
    match the plain solve only up to FMA/reassociation (measured <= 7e-12
    relative at f64); every integer observable (stop codes, iteration and
    eval counts) stays bit-identical — tests/test_multistart.py
    ``test_staged_widths_match_plain``.  Lane order is restored once at
    the end. Length must
    be ``len(self.schedule)`` (one per bounded stage) or that plus 1, where
    the extra last entry adds a compacted to-completion stage BEFORE the
    full-width catch-all (which then usually runs zero trips). Entries
    ``>= B`` disable compaction for that stage. Combined with ``mesh``,
    compaction runs PER SHARD (``jax.shard_map``, no collectives): a global
    lane sort across shards would be a collective resharding, but instances
    are independent, so each shard stably sorts and compacts its own lanes
    with ``ceil(width / n_devices)`` head lanes — same exactness guarantee
    (the per-shard full-width catch-all finishes any lane a locally
    unbalanced retirement starves).
    """

    def __init__(self, mop, algo_config: Optional[AlgorithmConfig] = None,
                 dtype=jnp.float32, schedule: Optional[tuple] = None,
                 mesh: Optional[Mesh] = None, fleet: Optional[bool] = None,
                 widths: Optional[tuple] = None):
        self.solver = build_solver(mop, algo_config, dtype)
        self.dtype = dtype
        if fleet is None:
            fleet = fleet_eligible(self.solver.ac)
        elif fleet and not fleet_eligible(self.solver.ac):
            raise ValueError(
                "fleet=True requires use_db=True and "
                "var_scaler_update != 'model' (append-only invariant)")
        self.fleet = bool(fleet)
        max_iter = self.solver.ac.max_iter
        if schedule is None:
            schedule = tuple(sorted({max(1, max_iter // d)
                                     for d in (16, 8, 4, 2)}))
        schedule = tuple(int(t) for t in schedule if 0 < int(t) < max_iter)
        # merge stages that would run at the same capacities (pure overhead)
        caps = [(_cap_at(self.solver, t), _traj_cap_at(self.solver, t))
                for t in schedule]
        full = (self.solver.db_capacity, self.solver.T)
        keep = []
        for i, (t, c) in enumerate(zip(schedule, caps)):
            nxt = caps[i + 1] if i + 1 < len(caps) else full
            if c[0] < nxt[0] or c[1] < nxt[1]:
                keep.append((t, c))
        self.schedule = tuple(keep)
        if widths is not None:
            widths = tuple(int(w) for w in widths)
            if len(widths) not in (len(self.schedule), len(self.schedule) + 1):
                raise ValueError(
                    f"widths must have one entry per bounded stage "
                    f"({len(self.schedule)} after merging; schedule="
                    f"{tuple(t for t, _ in self.schedule)}), optionally "
                    f"plus one for a compacted to-completion stage")
            if any(w < 1 for w in widths):
                raise ValueError("widths entries must be >= 1")
        self.widths = widths
        self.mesh = mesh
        if mesh is not None and widths is not None:
            # per-shard lane compaction: a GLOBAL lane sort across shards
            # would be a collective resharding, but instances are independent
            # (pure data parallelism, SURVEY §5.8), so each shard may sort
            # and compact its OWN lanes locally. shard_map runs _run_impl
            # per shard with no collectives; widths divide across shards
            # (ceil, so the global head is never starved below the requested
            # width). Exactness is unchanged — per-lane math is
            # permutation-invariant and the full-width catch-all still runs
            # per shard (tests/test_multistart.py::
            # test_staged_widths_sharded_mesh_match_plain).
            n_sh = int(mesh.devices.size)
            local = tuple(max(1, -(-w // n_sh)) for w in widths)
            # check_vma=False: the body is collective-free by construction,
            # and the strict varying-manual-axes check rejects while_loop
            # carries whose init is an unvarying constant (e.g. the RBF
            # round-4 wave counter) even though every output IS per-shard.
            f = jax.shard_map(
                lambda x0b: self._run_impl(x0b, widths=local),
                mesh=mesh, in_specs=(P("batch"),), out_specs=P("batch"),
                check_vma=False)
            self._run = jax.jit(f)
        elif mesh is not None:
            in_sharding = NamedSharding(mesh, P("batch", None))
            self._run = jax.jit(self._run_impl, in_shardings=(in_sharding,))
        else:
            self._run = jax.jit(self._run_impl)

    def _run_impl(self, x0_batch, widths=None):
        from morbit_tpu.core.enums import STOP_CODE

        solver = self.solver

        def bounded(k):
            if self.fleet:
                return _fleet_bounded(solver, k)

            def one(s):
                def cond(c):
                    st, j = c
                    return (st.stop_code == STOP_CODE.CONTINUE) & (j < k)

                def body(c):
                    st, j = c
                    return solver.iterate(st), j + jnp.int32(1)

                st, _ = jax.lax.while_loop(cond, body, (s, jnp.int32(0)))
                return st

            return jax.vmap(one)

        states = jax.vmap(solver.initialize)(x0_batch)
        B = x0_batch.shape[0]
        widths = self.widths if widths is None else widths
        order = None  # composed lane permutation (states[i] = orig[order[i]])

        def compacted(states, order, w, run):
            """Sort active lanes to the front (stable, on device), run the
            stage on the first ``w`` lanes only, and splice the frozen tail
            back. Exact: lanes are independent under vmap, so permutation +
            slicing replays identical per-lane math; starved active lanes
            (active count > w) simply wait for a later stage — the final
            full-width catch-all runs every remaining lane to completion."""
            active = states.stop_code == STOP_CODE.CONTINUE
            perm = jnp.argsort(jnp.where(active, 0, 1).astype(jnp.int32),
                               stable=True)
            states = jax.tree_util.tree_map(lambda a: a[perm], states)
            order = perm if order is None else order[perm]
            head = jax.tree_util.tree_map(lambda a: a[:w], states)
            tail = jax.tree_util.tree_map(lambda a: a[w:], states)
            head = run(head)
            states = jax.tree_util.tree_map(
                lambda h, tl: jnp.concatenate([h, tl], axis=0), head, tail)
            return states, order

        prev = 0
        for i, (t, (cap, tcap)) in enumerate(self.schedule):
            states = _resize_traj(_resize_dbs(states, cap), tcap)
            w = B if widths is None else min(widths[i], B)
            if w < B:
                states, order = compacted(states, order, w,
                                          bounded(t - prev))
            else:
                states = bounded(t - prev)(states)
            prev = t
        states = _resize_traj(_resize_dbs(states, solver.db_capacity),
                              solver.T)
        to_completion = (_fleet_bounded(solver, None) if self.fleet
                         else jax.vmap(solver.solve_from_state))
        if widths is not None and len(widths) == len(self.schedule) + 1 \
                and widths[-1] < B:
            states, order = compacted(states, order, widths[-1],
                                      to_completion)
        # full-width catch-all: zero trips unless a width starved a lane
        states = to_completion(states)
        if order is not None:
            inv = jnp.argsort(order, stable=True)
            states = jax.tree_util.tree_map(lambda a: a[inv], states)
        n_evals = jax.vmap(solver._total_evals)(states.groups)
        return OptimizeResult(
            x=states.x, fx=states.fx, stop_code=states.stop_code,
            n_iterations=states.iter_counter - 1, n_evals=n_evals,
            state=states)

    def __call__(self, x0_batch) -> OptimizeResult:
        x0_batch = jnp.asarray(x0_batch, self.dtype)
        if self.mesh is not None:
            x0_batch = jax.device_put(
                x0_batch, NamedSharding(self.mesh, P("batch", None)))
        return self._run(x0_batch)

    def tuned(self, n_iterations, n_stages: int = 5, quantum: int = 32,
              slack: float = 1.1,
              db_capacity: Optional[int] = None) -> "StagedMultistart":
        """Probe-protocol convenience: a compaction-tuned clone of this
        runner from a probe fleet's per-lane iteration counts.

        .. code-block:: python

            probe = StagedMultistart(mop, ac)
            res = probe(x0)                  # a full, exact result
            runner = probe.tuned(res.n_iterations,
                                 db_capacity=suggest_db_capacity(res))

        Combines :func:`suggest_schedule` (quantile-placed stage bounds)
        and :func:`suggest_widths` (per-stage lane-compaction widths).
        Exact for any probe (see the class docstring); pays one extra
        compile, so it's for REPEATED fleets — measured 42.0k vs 18.4k
        runs/s over the plain staged runner at the reference-default
        budget (bench_points_r3.json). Mesh, dtype, and fleet mode carry
        over (with ``mesh``, compaction runs per shard).

        ``db_capacity`` (usually :func:`suggest_db_capacity` of the probe)
        prices the per-trip capacity-linear work at the measured db FILL
        instead of the worst-case heuristic bound (the round-4/5 roadmap's
        per-trip capacity pricing: ref-budget batch cost is ~purely
        capacity-linear). Bit-exact iff no lane overflows — check
        :func:`capacity_overflowed` on the result and rerun at the default
        capacity when it fires (the sticky flag makes the tight-cap run
        self-verifying)."""
        cmop, ac = self.solver.mop, self.solver.ac
        if db_capacity is not None:
            import dataclasses as _dc

            ac = _dc.replace(ac, db_capacity=int(db_capacity))
        sched = suggest_schedule(n_iterations, ac.max_iter, n_stages)
        tmp = StagedMultistart(cmop, ac, self.dtype, schedule=sched)
        ws = suggest_widths(tmp, n_iterations, slack=slack, quantum=quantum)
        return StagedMultistart(cmop, ac, self.dtype, schedule=sched,
                                widths=ws, mesh=self.mesh)


def suggest_db_capacity(result, margin: float = 1.25,
                        quantum: int = 32) -> int:
    """Probe-derived database capacity: the max db FILL across lanes and
    groups of a probe fleet, padded by ``margin`` and rounded up to
    ``quantum`` rows.

    The default ``resolved_db_capacity`` heuristic is a WORST-CASE bound
    (~O(model points) inserts on every iteration); measured fills at the
    reference budget are ~5-10x below it, and per-trip cost is ~purely
    capacity-linear (CLAUDE.md round-3/4 findings: 113.6 ms/batch at cap
    1507 vs 232.4 at cap 3014, intercept ~0). Running repeated fleets at
    the probed fill prices every capacity-linear term (selection scans,
    one-hot inserts, loop-carry copies) at what the workload actually
    uses.

    Safety: capacity never enters the numerics — an undersized run drops
    inserts and raises the per-group sticky ``db.overflow`` flag
    (``core/database.py``). Check :func:`capacity_overflowed` on each
    result; if it fires, rerun that fleet at the default capacity. A probe
    with the same iteration budget bounds later fills well in practice
    (``margin`` covers start-point variation), but the flag — not the
    margin — is the correctness guarantee.

    Exactness caveat (same as ``widths``): within one compiled program
    capacity is inert, and the CPU f64 lock asserts full observable
    equality — but a DIFFERENT capacity compiles to a differently-fused
    XLA program, so f32 lanes near a stop-test boundary may flip
    (measured: 8/1024 stop codes at the reference budget). Use the probe
    capacity consistently across a fleet campaign."""
    import numpy as _np

    counts = [int(_np.max(_np.asarray(g.db.count)))
              for g in result.state.groups]
    q = max(1, int(quantum))
    need = int(_np.ceil(max(counts) * float(margin) / q)) * q
    return max(q, need)


def capacity_overflowed(result) -> bool:
    """True if any group database dropped an insert (sticky overflow flag,
    any lane) — the guard for :func:`suggest_db_capacity`-tightened runs."""
    import numpy as _np

    return bool(any(bool(_np.any(_np.asarray(g.db.overflow)))
                    for g in result.state.groups))


def suggest_widths(runner: "StagedMultistart", n_iterations,
                   slack: float = 1.1, quantum: int = 64,
                   batch: Optional[int] = None) -> tuple:
    """Derive a per-stage ``widths`` schedule from a measured per-lane
    iteration count (``OptimizeResult.n_iterations`` of a probe fleet).

    Lane retirement is workload-dependent, so the right compaction widths
    cannot be static defaults; but ANY widths are exact (the full-width
    catch-all finishes starved lanes — see :class:`StagedMultistart`), so a
    probe-derived schedule is safe even when later fleets retire
    differently — only the wall-clock varies.  Protocol: run one probe
    fleet with ``widths=None`` (or on CPU), then rebuild the runner with
    ``widths=suggest_widths(runner, probe.n_iterations)`` for the repeated
    fleets.  This mirrors how the reference benchmark loop adapts to
    per-run length via dynamic thread scheduling
    (``examples/large_scale_benchmarks.jl:253-275``) — here the adaptation
    happens once, at schedule-pick time, keeping the hot path a single
    compiled program.

    Width for the stage entered after cumulative bound ``t`` is the lane
    count with ``n_iterations > t``, padded by ``slack`` (criticality
    micro-steps consume loop trips without advancing the iteration counter,
    so trip-retirement lags iteration-retirement), rounded up to
    ``quantum`` lanes (fewer distinct widths, sublane-friendly shapes).
    The returned tuple has ``len(runner.schedule) + 1`` entries: the extra
    final entry compacts the to-completion stage too.
    """
    import numpy as _np

    n_iter = _np.asarray(n_iterations)
    B = int(batch if batch is not None else n_iter.shape[0])
    q = max(1, int(quantum))

    def width(count):
        need = int(_np.ceil(count * float(slack) / q)) * q
        return max(q, min(B, need))

    bounds = tuple(t for t, _ in runner.schedule)
    ws = [B]  # first stage: every lane is active
    for t in bounds:
        ws.append(width(int((n_iter > t).sum())))
    return tuple(ws)


def suggest_schedule(n_iterations, max_iter: int,
                     n_stages: int = 5) -> tuple:
    """Derive quantile-spaced stage bounds from a probe fleet's per-lane
    iteration counts (the schedule-side companion of
    :func:`suggest_widths`; same probe protocol and the same safety
    argument — ANY schedule is exact, only the wall-clock varies).

    The default geometric schedule (``max_iter/16, /8, /4, /2``) is built
    for UNKNOWN retirement; once a probe measured it, two things beat it
    (measured at the reference budget, two-parabolas B=1024): (a) bounds at
    evenly spaced retirement QUANTILES track the lane-retirement CDF where
    it actually bends, and (b) capping the last bound near the p99
    iteration count makes the to-completion stage (which the geometric
    default enters at ``max_iter/2``, long after every lane retired) run at
    its compacted narrow width. Measured: quantile bounds ``(5,10,15,20,
    26)`` with probe-derived widths reach 42.0k runs/s vs 38.0k for the
    geometric ``(6,12,25,50)`` (+10%); finer 10-14 stage schedules REGRESS
    (each extra boundary costs ~0.35 ms of argsort+permute+resize at full
    batch), so few quantile-placed stages win.

    Returns increasing bounds strictly below ``max_iter``: the quantiles
    ``i/n_stages`` for ``i = 1..n_stages-1`` plus a p99 cap bound,
    deduplicated. Feed to ``StagedMultistart(schedule=...)``, then derive
    ``widths`` for it with :func:`suggest_widths`.
    """
    import numpy as _np

    ni = _np.asarray(n_iterations)
    qs = [(i + 1) / n_stages for i in range(n_stages - 1)] + [0.99]
    bounds = sorted({int(_np.quantile(ni, q)) for q in qs})
    return tuple(t for t in bounds if 0 < t < max_iter)


def staged_multistart(mop, x0_batch,
                      algo_config: Optional[AlgorithmConfig] = None,
                      dtype=jnp.float32, schedule: Optional[tuple] = None,
                      mesh: Optional[Mesh] = None,
                      widths: Optional[tuple] = None) -> OptimizeResult:
    """One-shot convenience wrapper for :class:`StagedMultistart` (repeated
    fleets should construct the runner once to reuse the compiled program)."""
    return StagedMultistart(mop, algo_config, dtype, schedule, mesh,
                            widths=widths)(x0_batch)


class CompactedMultistart:
    """Reusable compacted-multistart runner (see :func:`compacted_multistart`).

    Holds the solver and every jitted stage/gather/scatter program so that
    REPEATED fleets (a benchmark loop, a service) pay compilation once per
    (bucket, k) shape instead of once per call — a fresh
    ``compacted_multistart`` call rebuilds its jits and recompiles every
    bucket program (~40s each on the TPU tunnel)."""

    def __init__(self, mop, algo_config: Optional[AlgorithmConfig] = None,
                 dtype=jnp.float32, stage_iters: int = 10,
                 bucket_ladder: Optional[tuple] = None,
                 stage_schedule: Optional[tuple] = None,
                 grow_db: bool = True):
        self.solver = build_solver(mop, algo_config, dtype)
        self.dtype = dtype
        self.stage_iters = int(stage_iters) if stage_iters is not None else 10
        self.bucket_ladder = bucket_ladder
        # explicit per-stage iteration counts (overrides stage_iters):
        # retirement is front-loaded, so short early stages + long late
        # stages beat a fixed length; after the schedule is exhausted the
        # next stage runs to completion. Each distinct (bucket, k) compiles
        # one program — keep the distinct k values few.
        self.stage_schedule = (tuple(int(k) for k in stage_schedule)
                               if stage_schedule is not None else None)
        # per-stage GROWING database capacity: per-iteration device cost is
        # dominated by capacity-proportional work (full-buffer layout
        # copies at while-loop boundaries + O(capacity) selection scans —
        # measured 795.6 vs 163.5 ms/batch at caps 1507 vs 160 on v5e), but
        # a lane that has executed only t iterations can hold at most
        # resolved_db_capacity(max_iter=t) rows. Each stage therefore runs
        # at the capacity its cumulative iteration bound implies, and the
        # database is grown by zero-row padding between stages — bit-exact
        # (rows are append-only, indices stay valid, and the formula is the
        # same safe upper bound that sizes the full run).
        self.grow_db = bool(grow_db)
        self._init = jax.jit(jax.vmap(self.solver.initialize))
        self._stage = jax.jit(self._stage_impl, static_argnums=1,
                              donate_argnums=0)
        self._gather = jax.jit(
            lambda st, idx: jax.tree_util.tree_map(lambda a: a[idx], st))
        self._scatter = jax.jit(
            lambda full, part, idx: jax.tree_util.tree_map(
                lambda f, p: f.at[idx].set(p), full, part),
            donate_argnums=0)
        self._totals = jax.jit(jax.vmap(self.solver._total_evals))

    def _cap_at(self, cum_iters: int) -> int:
        if not self.grow_db:
            return self.solver.db_capacity
        return _cap_at(self.solver, cum_iters)

    _resize_dbs = staticmethod(_resize_dbs)

    def _stage_impl(self, states, k):
        # run at most k further outer iterations per lane (k static); the
        # final stage passes k > max_iter and runs to completion — the
        # iterate() pre-checks guarantee termination
        from morbit_tpu.core.enums import STOP_CODE

        solver = self.solver

        def one(s):
            def cond(c):
                st, j = c
                return (st.stop_code == STOP_CODE.CONTINUE) & (j < k)

            def body(c):
                st, j = c
                return solver.iterate(st), j + jnp.int32(1)

            st, _ = jax.lax.while_loop(cond, body, (s, jnp.int32(0)))
            return st

        return jax.vmap(one)(states)

    def __call__(self, x0_batch) -> OptimizeResult:
        from morbit_tpu.core.enums import STOP_CODE

        x0_batch = jnp.asarray(x0_batch, self.dtype)
        B = x0_batch.shape[0]
        max_iter = self.solver.ac.max_iter
        stage_iters = self.stage_iters
        bucket_ladder = self.bucket_ladder
        if bucket_ladder is None:
            bucket_ladder = tuple(max(1, B >> s) for s in range(5))
        ladder = sorted({int(b) for b in bucket_ladder if b <= B},
                        reverse=True)
        if not ladder or ladder[0] != B:
            ladder = [B] + [b for b in ladder if b < B]

        full_cap = self.solver.db_capacity
        active = self._init(x0_batch)
        full = None  # set on first stage; while uncompacted, full IS active
        glob_idx = jnp.arange(B)
        compacted = False
        schedule = self.stage_schedule
        n_stages_max = (len(schedule) + 1 if schedule is not None else
                        (max_iter + 2 + stage_iters - 1) // stage_iters + 1)
        cum_iters = 0

        for i_stage in range(n_stages_max):
            bucket = active.x.shape[0]
            if schedule is not None:
                k = (schedule[i_stage] if i_stage < len(schedule)
                     else max_iter + 2)
            else:
                k = stage_iters if bucket > ladder[-1] else max_iter + 2
            # run this stage at the capacity its iteration bound implies
            cum_iters = min(cum_iters + k, max_iter + 2)
            active = self._resize_dbs(active, self._cap_at(cum_iters))
            active = self._stage(active, k)
            # NOTE on donation: ``stage`` donates its input, so ``full``
            # must never alias a stage input. While the batch is uncompacted
            # the stage output covers every lane and simply becomes
            # ``full``; after the first compaction ``gather`` materializes
            # fresh arrays for ``active``, so ``full`` and ``active`` are
            # disjoint from then on. ``full`` always carries the FULL
            # database capacity; a reduced-capacity stage output is padded
            # back up before becoming/merging into it.
            if not compacted:
                full = self._resize_dbs(active, full_cap)
            else:
                full = self._scatter(full, self._resize_dbs(active, full_cap),
                                     glob_idx)
            if k > max_iter:
                break
            # only the tiny packed-int vector crosses the tunnel per stage
            stop = np.asarray(active.ints[:, 2])
            # padded duplicate lanes carry a duplicated global index; mask
            # them out so each live lane is tracked once
            first_occurrence = np.zeros(len(stop), bool)
            _, first_pos = np.unique(np.asarray(glob_idx), return_index=True)
            first_occurrence[first_pos] = True
            sel = np.nonzero((stop == int(STOP_CODE.CONTINUE)) &
                             first_occurrence)[0]
            if sel.size == 0:
                break
            new_bucket = next((b for b in reversed(ladder) if b >= sel.size),
                              ladder[0])
            if new_bucket == bucket:
                continue
            # pad with finished lanes: their while-loop condition is false
            # on entry, so they do zero work, and re-scattering their
            # unchanged state is a no-op write
            done_pool = np.nonzero(stop != int(STOP_CODE.CONTINUE))[0]
            pad_src = done_pool if done_pool.size else sel[:1]
            pad = np.resize(pad_src, new_bucket - sel.size)
            take = jnp.asarray(np.concatenate([sel, pad]), jnp.int32)
            glob_idx = glob_idx[take]
            active = self._gather(active, take)
            compacted = True

        n_evals = self._totals(full.groups)
        return OptimizeResult(
            x=full.x, fx=full.fx, stop_code=full.stop_code,
            n_iterations=full.iter_counter - 1, n_evals=n_evals, state=full)


def compacted_multistart(
    mop,
    x0_batch,
    algo_config: Optional[AlgorithmConfig] = None,
    dtype=jnp.float32,
    stage_iters: int = 10,
    bucket_ladder: Optional[tuple] = None,
    stage_schedule: Optional[tuple] = None,
) -> OptimizeResult:
    """Straggler-free multistart: staged solve with lane compaction.

    A plain ``vmap``-ed solve is straggler-bound: the while-loop batching
    rule keeps executing the loop body for ALL lanes until the slowest lane
    stops, and convergence is heavily front-loaded (at the reference-default
    budget on two-parabolas the mean is ~12 iterations while the longest
    lane runs ~46; measured in tools/profile_compaction.py). This runs the
    batch in *stages* of ``stage_iters`` outer iterations, and between
    stages gathers the still-running lanes into the smallest batch bucket
    that holds them, so converged lanes stop consuming device time — the
    TPU-native analogue of the reference benchmark loop's dynamic thread
    scheduling (``examples/large_scale_benchmarks.jl:253-275``), which never
    spends a core on a finished run.

    Compaction is EXACT: lanes are independent under ``vmap`` (pure data
    parallelism, SURVEY.md §5.8), so gathering a lane into a smaller batch
    replays bit-identical per-lane math; results equal
    :func:`multistart_optimize` exactly (tests/test_multistart.py).

    ``bucket_ladder`` lists the allowed batch sizes (descending; default
    B, B/2, B/4, B/8, B/16). Each distinct bucket compiles one stage
    program, so keep the ladder short. Between stages only the packed int
    bookkeeping vector crosses to the host (stop codes), not the state.

    One-shot convenience wrapper: REPEATED fleets should construct a
    :class:`CompactedMultistart` once and call it per batch, which reuses
    the compiled bucket programs instead of recompiling them every call.
    """
    runner = CompactedMultistart(mop, algo_config, dtype,
                                 stage_iters=stage_iters,
                                 bucket_ladder=bucket_ladder,
                                 stage_schedule=stage_schedule)
    return runner(x0_batch)


def parametric_multistart(
    mop_builder,
    x0_batch,
    theta_batch,
    algo_config: Optional[AlgorithmConfig] = None,
    dtype=jnp.float32,
    mesh: Optional[Mesh] = None,
) -> OptimizeResult:
    """Batch over problem *data*, not just starting points.

    ``mop_builder(theta) -> MOP`` builds the problem from a parameter pytree;
    its objective/constraint closures may capture ``theta`` (a tracer here),
    so one compiled program solves a different problem instance per batch row
    — the TPU-native analogue of the reference benchmark harness's
    problem-grid rows (``examples/large_scale_benchmarks.jl:69-118``,
    SURVEY.md §2 #29) without one compile per problem. Rows of ``x0_batch``
    (B, n) pair with rows of every leaf of ``theta_batch`` (B, ...).

    Static structure (n_vars, bounds, group/output layout, configs) must not
    depend on ``theta`` — only array values may. With ``mesh`` (1-D over
    axis 'batch'), the batch shards across devices like
    :func:`multistart_optimize`.
    """
    ac = algo_config or AlgorithmConfig()

    def one(x0, theta):
        mop = mop_builder(theta)
        cmop = mop if isinstance(mop, CompiledMOP) else compile_mop(
            mop, ac.combine_models)
        solver = Solver(cmop, ac, dtype)
        return solver.solve(x0)

    def cast(a):
        a = jnp.asarray(a)
        # float parameter leaves follow the solve dtype; integer/bool leaves
        # (categorical parameters) keep their dtype
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    x0_batch = jnp.asarray(x0_batch, dtype)
    theta_batch = jax.tree_util.tree_map(cast, theta_batch)
    run = jax.jit(jax.vmap(one))
    if mesh is not None:
        in_sharding = NamedSharding(mesh, P("batch"))
        x0_batch = jax.device_put(
            x0_batch, NamedSharding(mesh, P("batch", None)))
        theta_batch = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, in_sharding), theta_batch)
    return run(x0_batch, theta_batch)
