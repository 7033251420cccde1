"""Auxiliary subsystem tests: db recycling, verbosity report, auto scaler,
RBF meta reuse, trajectory utilities."""

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.utils.logging import print_report, trajectory_arrays


def _rbf_mop(kernel="multiquadric"):
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    cfg = RbfConfig(kernel=kernel)
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    return mop


def test_populated_db_saves_evaluations():
    """Database recycling (``algorithm.jl:286-297``,
    ``example_two_parabolas.jl:179-190``)."""
    mop = _rbf_mop()
    res1 = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=10)
    res2 = optimize(mop, jnp.array([2.0, -2.0]), max_iter=10,
                    populated_db=res1.state.groups)
    res3 = optimize(mop, jnp.array([2.0, -2.0]), max_iter=10)
    assert int(res2.n_evals) < int(res3.n_evals)
    assert np.all(np.isfinite(np.asarray(res2.x)))


def test_populated_db_rescaled_across_different_bounds():
    """Ingested databases are re-transformed to the CURRENT scaler
    (``algorithm.jl:286-297``, ``Databases.jl:300``): recycling into a run
    with different box bounds (hence a different unit-cube scaler) must
    land the stored sites at their true positions."""
    def build(lb, ub):
        mop = MOP(lb, ub)
        cfg = RbfConfig(kernel="multiquadric")
        mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
        mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
        return mop

    res1 = optimize(build([-4.0, -4.0], [4.0, 4.0]),
                    jnp.array([-3.0, 2.5]), max_iter=10)
    mop2 = build([-8.0, -6.0], [6.0, 8.0])
    res2 = optimize(mop2, jnp.array([2.0, -2.0]), max_iter=10,
                    populated_db=res1.state)
    res3 = optimize(mop2, jnp.array([2.0, -2.0]), max_iter=10)
    # recycled sites land correctly -> model reuse saves true evaluations
    assert int(res2.n_evals) < int(res3.n_evals)
    assert np.all(np.isfinite(np.asarray(res2.x)))
    # the recycled rows, untransformed with run 2's scaler, must coincide
    # with run 1's rows untransformed with run 1's scaler
    g1, g2 = res1.state.groups[0], res2.state.groups[0]
    k = int(g1.db.count)
    s1, o1 = res1.state.scal.scale, res1.state.scal.offset
    s2, o2 = res2.state.scal.scale, res2.state.scal.offset
    x1 = (np.asarray(g1.db.X)[:k] - np.asarray(o1)) / np.asarray(s1)
    x2 = (np.asarray(g2.db.X)[:k] - np.asarray(o2)) / np.asarray(s2)
    assert np.allclose(x1, x2, atol=1e-10)


def test_populated_db_after_untransform_final_database():
    """``untransform_final_database=True`` hands back unscaled sites with an
    identity scaler, so recycling that state re-transforms correctly."""
    mop = _rbf_mop()
    res1 = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=10,
                    untransform_final_database=True)
    # the returned scaler is the identity
    assert np.allclose(np.asarray(res1.state.scal.scale), 1.0)
    res2 = optimize(mop, jnp.array([2.0, -2.0]), max_iter=10,
                    populated_db=res1.state)
    res3 = optimize(mop, jnp.array([2.0, -2.0]), max_iter=10)
    assert int(res2.n_evals) < int(res3.n_evals)
    assert np.all(np.isfinite(np.asarray(res2.x)))


def test_auto_scaler_unbounded():
    """:auto FD-Jacobian scaling for unbounded problems
    (``VarScaler.jl:139-238``)."""
    mop = MOP(2)
    mop.add_exact_objective(lambda x: jnp.sum((100 * x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((100 * x + 1.0) ** 2))
    res = optimize(mop, jnp.array([-0.03, 0.025]), max_iter=25,
                   var_scaler="auto")
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 2e-3  # Pareto set: diagonal in [-0.01, 0.01]


def test_rbf_meta_reuse_shares_training_sets():
    """Different kernels with equal geometry signature share rounds 1-3
    point sets (``test/rbf_models.jl:121-168``)."""
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2),
                      model_cfg=RbfConfig(kernel="cubic"))
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2),
                      model_cfg=RbfConfig(kernel="gaussian"))
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=8)
    g0, g1 = res.state.groups
    n0 = int(g0.model.n_train)
    n1 = int(g1.model.n_train)
    k = min(n0, n1, 3)
    s0 = np.asarray(g0.db.X)[np.asarray(g0.model.idx[:k])]
    s1 = np.asarray(g1.db.X)[np.asarray(g1.model.idx[:k])]
    assert np.allclose(s0, s1)


def test_report_and_trajectory_utils(capsys):
    res = optimize(_rbf_mop(), jnp.array([-3.0, 2.5]), max_iter=5, verbosity=2)
    out = capsys.readouterr().out
    assert "FINISHED" in out and "INITIALIZATION" in out
    tr = trajectory_arrays(res)
    assert tr["x"].shape[0] == int(res.state.traj.count)
    assert np.isneginf(tr["omega"][0])


def test_trajectory_x_indices_provenance():
    """The stamped per-group ``x_indices`` map (``IterDataIterSaveable.jl:189-205``):
    each trajectory entry's index points at the database row holding that
    iterate's (scaled site, values)."""
    from morbit_tpu.core import scaling

    mop = _rbf_mop()
    res = optimize(mop, jnp.array([-3.0, 2.5]), max_iter=10)
    arrs = trajectory_arrays(res)
    idx = arrs["x_indices"]
    assert idx.shape == (len(arrs["x"]), len(res.state.groups))
    scal = res.state.scal
    for i in range(len(arrs["x"])):
        x_s = np.asarray(scaling.transform(scal, jnp.asarray(arrs["x"][i])))
        for g, st in enumerate(res.state.groups):
            row = np.asarray(st.db.X[idx[i, g]])
            assert np.allclose(row, x_s, atol=1e-10), (i, g, row, x_s)


def test_function_eval_counts():
    """Per-function counter view (``CountedFunc``, ``globals.jl:74-112``):
    members of one group share the group counter; a shared callable
    (RefVecFun) reports the shared count under both registrations."""
    import jax.numpy as jnp

    from morbit_tpu import optimize
    from morbit_tpu.core.mop import MOP, compile_mop
    from morbit_tpu.models.configs import ExactConfig, RbfConfig
    from morbit_tpu.utils.logging import function_eval_counts

    f = lambda x: jnp.sum((x - 1.0) ** 2)[None]
    g = lambda x: jnp.sum((x + 1.0) ** 2)[None]
    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    cfg = RbfConfig(kernel="cubic")
    mop.add_objective(f, model_cfg=cfg)
    mop.add_objective(g, model_cfg=cfg)        # same group as f
    mop.add_objective(f, model_cfg=cfg)        # duplicate -> shared counter
    mop.add_objective(g, model_cfg=ExactConfig())  # own group
    cmop = compile_mop(mop)
    res = optimize(cmop, [0.4, -0.3], max_iter=4)
    counts = function_eval_counts(res, cmop)
    assert len(counts) == 4
    assert counts[0] == counts[1] == counts[2] > 0   # one combined group
    assert counts[3] > 0                             # exact group counts too


def test_save_model_meta_stamps():
    """``save_model_meta`` stamps each iteration's per-group training set
    (``[n_train, db row indices...]``) into the trajectory — the model-meta
    ``IterSaveable`` content (``RbfModel.jl:162-175``,
    ``IterDataIterSaveable.jl:189-216``). Post-hoc, every stamp row must
    reconstruct a valid training set from the final database."""
    import jax.numpy as jnp
    import numpy as np

    from morbit_tpu import optimize
    from morbit_tpu.core.mop import MOP, compile_mop
    from morbit_tpu.models.configs import RbfConfig

    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2)[None],
                      model_cfg=RbfConfig(kernel="cubic"))
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2)[None],
                      model_cfg=RbfConfig(kernel="cubic"))
    cmop = compile_mop(mop)
    res = optimize(cmop, [0.4, -0.3], max_iter=4, save_model_meta=True)

    traj = res.state.traj
    count = int(res.state.traj.count)
    meta = np.asarray(traj.model_meta)[:count]       # (count, MW)
    assert traj.MW > 0 and meta.shape[1] == traj.MW
    db = res.state.groups[0].db
    cap_train = meta.shape[1] - 1                    # one combined group
    # init stamp precedes the first model build: n_train == 0
    assert meta[0, 0] == 0
    for k in range(1, count):
        n_train = meta[k, 0]
        idx = meta[k, 1:1 + cap_train]
        assert 1 <= n_train <= cap_train
        used = idx[:n_train]
        assert np.all((used >= 0) & (used < int(db.count)))
    # the last stamp matches the final model state exactly
    m = res.state.groups[0].model
    assert meta[-1, 0] == int(np.asarray(m.n_train))
    np.testing.assert_array_equal(meta[-1, 1:], np.asarray(m.idx))

    # flag off: no meta columns, identical trajectory geometry
    res0 = optimize(cmop, [0.4, -0.3], max_iter=4)
    assert res0.state.traj.MW == 0
    np.testing.assert_allclose(np.asarray(res0.state.traj.x)[:count],
                               np.asarray(traj.x)[:count], rtol=0, atol=0)
