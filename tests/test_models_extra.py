"""Lagrange models, PS descent, RBF round 4, Taylor FD stencil tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.descent import PascolettiSerafiniConfig
from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import LagrangeConfig, RbfConfig, TaylorConfig
from morbit_tpu.models.rbf_round4 import run_round4
from morbit_tpu.ops.rbf import apply_kernel, poly_basis


def _two_parabolas(cfg):
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
    mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
    return mop


@pytest.mark.parametrize("degree", [1, 2])
def test_lagrange_e2e(degree):
    res = optimize(_two_parabolas(LagrangeConfig(degree=degree)),
                   jnp.array([-3.0, 2.5]), max_iter=15)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.2


def test_ps_descent_rbf():
    cfg = PascolettiSerafiniConfig(n_samples=128, polish_iters=25)
    res = optimize(_two_parabolas(RbfConfig(kernel="multiquadric")),
                   jnp.array([-3.0, 2.5]), max_iter=20, descent_method=cfg)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.25


def test_ps_descent_with_reference_direction():
    cfg = PascolettiSerafiniConfig(reference_direction=(1.0, 1.0),
                                   n_samples=128, polish_iters=25)
    res = optimize(_two_parabolas(RbfConfig(kernel="multiquadric")),
                   jnp.array([-3.0, 2.5]), max_iter=20, descent_method=cfg)
    assert np.all(np.isfinite(np.asarray(res.x)))


def test_taylor_fd_gradients_match_truth():
    """FD Taylor model reproduces gradient/Hessian of a quadratic exactly
    (up to stencil truncation; quadratics are exact for CFD)."""
    from morbit_tpu.models.taylor import _build_stencil

    n = 3
    O, G, H = _build_stencil(n, 2, "cfd1")
    h = 1e-3
    A = np.array([[2.0, 0.5, 0.0], [0.5, 3.0, 1.0], [0.0, 1.0, 1.5]])
    b = np.array([1.0, -2.0, 0.5])

    def f(x):
        return 0.5 * x @ A @ x + b @ x

    x0 = np.array([0.3, -0.2, 0.7])
    sites = x0[None, :] + h * O
    vals = np.array([f(s) for s in sites])[:, None]
    g = (G @ vals / h)[:, 0]
    Hm = np.einsum("ijs,sm->ij", H, vals) / h ** 2
    assert np.allclose(g, A @ x0 + b, atol=1e-6)
    assert np.allclose(Hm, A, atol=1e-4)


def test_round4_invariants():
    """After round 4: Z orthogonal to the poly block, L L' = Z' Phi Z,
    L Linv = I, and the point count respects max_points."""
    rng = np.random.default_rng(0)
    n, n_init, maxp, cap = 2, 3, 6, 20
    kernel, pdeg = "cubic", 1

    db_X = jnp.array(rng.uniform(0, 1, (cap, n)))
    cand = jnp.ones((cap,), bool)
    init_sites = jnp.zeros((maxp, n))
    init_sites = init_sites.at[:n_init].set(jnp.array(rng.uniform(0, 1, (n_init, n))))

    st = run_round4(db_X, cand, init_sites, n_init, kernel, 3.0, pdeg,
                    max_points=maxp, chol_pivot=jnp.asarray(1e-14))
    N = int(st.N)
    zc = int(st.zc)
    assert n_init <= N <= maxp
    assert zc == N - n_init
    if zc == 0:
        return

    sites = np.asarray(st.sites[:N])
    Z = np.asarray(st.Z[:N, :zc])
    Pi = np.stack([np.asarray(poly_basis(jnp.array(s), pdeg)) for s in sites])
    # null-space property
    assert np.allclose(Z.T @ Pi, 0.0, atol=1e-9)
    # Gram consistency
    d = sites[:, None, :] - sites[None, :, :]
    Phi = np.asarray(apply_kernel(kernel, jnp.array((d ** 2).sum(-1)), 3.0))
    L = np.asarray(st.L[:zc, :zc])
    assert np.allclose(L @ L.T, Z.T @ Phi @ Z, atol=1e-8)
    Linv = np.asarray(st.Linv[:zc, :zc])
    assert np.allclose(L @ Linv, np.eye(zc), atol=1e-8)


def test_rbf_round4_e2e_uses_extra_points():
    """With optimized sampling and a large DB the model should train on more
    than n+1 points eventually (``test/rbf_models.jl:73-86`` spirit)."""
    cfg = RbfConfig(kernel="cubic", max_model_points=6)
    res = optimize(_two_parabolas(cfg), jnp.array([-3.0, 2.5]), max_iter=15)
    st = res.state.groups[0].model
    assert int(st.n_train) >= 3
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.2


def test_lagrange_static_stamp_mode():
    """optimized_sampling=False: one fixed lambda-poised [0,1]^n stamp reused
    every iteration (``LagrangeModel.jl:537-573``)."""
    from morbit_tpu.models.configs import LagrangeConfig

    res = optimize(_two_parabolas(LagrangeConfig(degree=2,
                                                 optimized_sampling=False)),
                   jnp.array([-3.0, 2.5]), max_iter=12)
    x = np.asarray(res.x)
    assert abs(x[0] - x[1]) < 0.2
    st = res.state.groups[0].model
    assert bool(st.fully_linear)


def test_lagrange_stamp_persistence(tmp_path):
    """save_path persists the static lambda-poised stamp across processes
    (the JLD2 save_path + io_lock analogue, ``LagrangeModel.jl:77-80,537-573``):
    a second Ops instance with a cold in-process cache loads the same stamp
    from disk instead of recomputing."""
    import numpy as np

    from morbit_tpu.core.config import AlgorithmConfig
    from morbit_tpu.core.mop import MOP, compile_mop
    from morbit_tpu.core import scaling
    from morbit_tpu.models.configs import LagrangeConfig
    from morbit_tpu.models.lagrange import LagrangeOps

    import jax.numpy as jnp

    cfg = LagrangeConfig(degree=1, optimized_sampling=False,
                         save_path=str(tmp_path))
    mop = MOP([-1.0, -1.0], [1.0, 1.0])
    mop.add_objective(lambda x: jnp.sum(x ** 2)[None], model_cfg=cfg)
    cm = compile_mop(mop)
    ac = AlgorithmConfig()
    scal = scaling.get_var_scaler(jnp.asarray(cm.lb), jnp.asarray(cm.ub),
                                  ac.var_scaler)

    ops1 = LagrangeOps(cm.groups[0], cm.n_vars, jnp.float64, ac, scal)
    pts1, B1 = ops1._static_stamp()
    f = ops1._stamp_file()
    assert f is not None and f.exists()

    # simulate a fresh process: cold class-level cache
    LagrangeOps._stamp_cache.clear()
    ops2 = LagrangeOps(cm.groups[0], cm.n_vars, jnp.float64, ac, scal)
    pts2, B2 = ops2._static_stamp()
    np.testing.assert_array_equal(pts1, pts2)
    np.testing.assert_array_equal(B1, B2)

    # a corrupted/absent file is not consulted when the cache is warm
    f.unlink()
    pts3, _ = ops2._static_stamp()
    np.testing.assert_array_equal(pts1, pts3)


def test_taylor_direct_second_order_stamp():
    """hess_stamp='cfd2' (direct diagonal second-derivative stamp — an
    extension beyond the reference's order-1-only stamps,
    ``RecursiveFiniteDifferences.jl:73-182``): exact on quadratics, fewer
    stencil sites than the FD-of-FD composition, and matching autodiff on a
    smooth function."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from morbit_tpu.models.taylor import _build_stencil

    n = 3
    O_c, G_c, H_c = _build_stencil(n, 2, "cfd1", "compose")
    O_d, G_d, H_d = _build_stencil(n, 2, "cfd1", "cfd2")
    assert O_d.shape[0] < O_c.shape[0]  # tighter stencil

    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)); A = A + A.T
    b = rng.normal(size=n)
    f = lambda X: 0.5 * np.einsum("si,ij,sj->s", X, A, X) + X @ b
    h = 1e-3
    x0 = rng.normal(size=n)

    for O, H in ((O_c, H_c), (O_d, H_d)):
        Y = f(x0[None, :] + h * O)
        Hest = np.einsum("ijs,s->ij", H, Y) / h ** 2
        np.testing.assert_allclose(Hest, A, atol=1e-5)

    # end-to-end through a Taylor model on a smooth non-quadratic
    from morbit_tpu.core.config import AlgorithmConfig
    from morbit_tpu.core.mop import MOP, compile_mop
    from morbit_tpu.core.algorithm import Solver
    from morbit_tpu.models.configs import TaylorConfig

    mop = MOP([-2.0, -2.0], [2.0, 2.0])
    fn = lambda x: (jnp.exp(0.3 * x[0]) + jnp.sin(x[1]) + x[0] * x[1])[None]
    mop.add_objective(fn, model_cfg=TaylorConfig(degree=2, hess_stamp="cfd2"))
    mop.add_objective(lambda x: jnp.sum(x ** 2)[None],
                      model_cfg=TaylorConfig(degree=2, hess_stamp="cfd2"))
    solver = Solver(compile_mop(mop), AlgorithmConfig(max_iter=2), jnp.float64)
    st = solver.initialize(jnp.asarray([0.3, -0.4]))
    ops = solver.container.ops[0]
    model = st.groups[0].model
    H = model.H[0]
    x_s = st.x_s
    import morbit_tpu.core.scaling as sc
    f_scaled = lambda xs: fn(sc.untransform(st.scal, xs))[0]
    H_true = jax.hessian(f_scaled)(x_s)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_true), atol=1e-4)
