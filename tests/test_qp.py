"""Batched ADMM QP solver tests against scipy ground truth and KKT checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from morbit_tpu.ops.qp import solve_qp


def _scipy_qp(P, q, A, l, u):
    """Reference solution via scipy SLSQP on the same problem."""
    n = len(q)

    def obj(z):
        return 0.5 * z @ P @ z + q @ z

    def jac(z):
        return P @ z + q

    cons = []
    finite_u = np.isfinite(u)
    finite_l = np.isfinite(l)
    eq = (u - l) <= 1e-12
    ineq_u = finite_u & ~eq
    ineq_l = finite_l & ~eq
    if eq.any():
        cons.append({"type": "eq", "fun": lambda z: A[eq] @ z - l[eq],
                     "jac": lambda z: A[eq]})
    if ineq_u.any():
        cons.append({"type": "ineq", "fun": lambda z: u[ineq_u] - A[ineq_u] @ z,
                     "jac": lambda z: -A[ineq_u]})
    if ineq_l.any():
        cons.append({"type": "ineq", "fun": lambda z: A[ineq_l] @ z - l[ineq_l],
                     "jac": lambda z: A[ineq_l]})
    res = scipy.optimize.minimize(obj, np.zeros(n), jac=jac, constraints=cons,
                                  method="SLSQP", options={"maxiter": 500, "ftol": 1e-14})
    return res.x, res.fun


@pytest.mark.parametrize("trial", range(8))
def test_random_strictly_convex_qp(trial):
    rng = np.random.default_rng(trial)
    n, m = 5, 8
    B = rng.standard_normal((n, n))
    P = B @ B.T + np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    l = -rng.random(m) - 0.2
    u = rng.random(m) + 0.2

    sol = solve_qp(jnp.array(P), jnp.array(q), jnp.array(A), jnp.array(l), jnp.array(u))
    zs, fs = _scipy_qp(P, q, A, l, u)
    assert float(sol.prim_res) < 1e-7
    assert np.isclose(float(sol.obj), fs, rtol=1e-5, atol=1e-7)
    assert np.allclose(np.asarray(sol.z), zs, atol=1e-5)


def test_equality_constrained_qp():
    # min ||z||^2 s.t. sum(z) = 1 -> z = 1/n
    n = 4
    P = 2 * np.eye(n)
    q = np.zeros(n)
    A = np.ones((1, n))
    l = u = np.ones(1)
    sol = solve_qp(jnp.array(P), jnp.array(q), jnp.array(A), jnp.array(l), jnp.array(u))
    assert np.allclose(np.asarray(sol.z), np.full(n, 0.25), atol=1e-8)


def test_lp_via_zero_P():
    # min -z1 - z2 s.t. 0 <= z <= 1, z1 + z2 <= 1.5 -> opt value -1.5
    n = 2
    P = np.zeros((n, n))
    q = np.array([-1.0, -1.0])
    A = np.vstack([np.eye(n), np.ones((1, n))])
    l = np.array([0.0, 0.0, -np.inf])
    u = np.array([1.0, 1.0, 1.5])
    sol = solve_qp(jnp.array(P), jnp.array(q), jnp.array(A), jnp.array(l), jnp.array(u))
    assert np.isclose(float(sol.obj), -1.5, atol=1e-6)
    assert float(sol.prim_res) < 1e-7


def test_padded_rows_are_noops():
    n = 3
    P = np.eye(n)
    q = np.array([1.0, -2.0, 0.5])
    A = np.vstack([np.eye(n), np.zeros((4, n))])
    l = np.concatenate([np.full(n, -10.0), np.full(4, -np.inf)])
    u = np.concatenate([np.full(n, 10.0), np.full(4, np.inf)])
    sol = solve_qp(jnp.array(P), jnp.array(q), jnp.array(A), jnp.array(l), jnp.array(u))
    # unconstrained optimum -P^{-1} q
    assert np.allclose(np.asarray(sol.z), -q, atol=1e-6)


def test_vmapped_batch():
    rng = np.random.default_rng(7)
    batch, n, m = 16, 4, 6
    Bm = rng.standard_normal((batch, n, n))
    P = jnp.array(Bm @ Bm.transpose(0, 2, 1) + np.eye(n))
    q = jnp.array(rng.standard_normal((batch, n)))
    A = jnp.array(rng.standard_normal((batch, m, n)))
    l = jnp.array(-rng.random((batch, m)) - 0.5)
    u = jnp.array(rng.random((batch, m)) + 0.5)
    sols = jax.vmap(lambda *a: solve_qp(*a))(P, q, A, l, u)
    assert np.all(np.asarray(sols.prim_res) < 1e-6)
    for i in range(0, batch, 5):
        zs, fs = _scipy_qp(np.asarray(P[i]), np.asarray(q[i]), np.asarray(A[i]),
                           np.asarray(l[i]), np.asarray(u[i]))
        assert np.isclose(float(sols.obj[i]), fs, rtol=1e-4, atol=1e-6)


def test_steepest_descent_shape_lp():
    """The actual min-max LP shape from the reference (descent.jl:91-135):
    variables (d, alpha), min alpha s.t. Df d <= alpha * ||rows||, -1<=d<=1,
    lb <= x + d <= ub."""
    Df = np.array([[2.0, 0.0], [0.0, 2.0]])  # two-parabola-ish Jacobian at origin
    n = 2
    rows = np.linalg.norm(Df, axis=1)
    nv = n + 1  # (d, alpha)
    P = np.zeros((nv, nv))
    q = np.zeros(nv); q[-1] = 1.0
    # rows: Df d - alpha*||row|| <= 0 ; d box; trust box
    A = np.block([
        [Df, -rows[:, None]],
        [np.eye(n), np.zeros((n, 1))],
    ])
    l = np.concatenate([np.full(2, -np.inf), np.full(n, -1.0)])
    u = np.concatenate([np.zeros(2), np.full(n, 1.0)])
    sol = solve_qp(jnp.array(P), jnp.array(q), jnp.array(A), jnp.array(l), jnp.array(u))
    # optimum: d = -(1,1)... alpha = -2*? ; analytic: min alpha with 2 d_i <= 2 alpha
    # => alpha = min over d in box of max_i d_i*2/2 => d = (-1,-1), alpha = -1
    assert np.isclose(float(sol.obj), -1.0, atol=1e-6)
    assert np.allclose(np.asarray(sol.z[:2]), [-1.0, -1.0], atol=1e-5)


def test_f32_early_exit_matches_fixed_budget():
    """The opt-in residual early exit (OSQP ``check_termination`` analogue,
    Stellato et al. §5.1; for sequential/unbatched solves — off by default:
    measured slower for large vmapped fleets, see solve_qp docstring) must
    return the same solutions as the fixed 400-iteration budget: the
    active-set polish recovers the vertex once ADMM is past the exit
    tolerance."""
    rng = np.random.default_rng(7)
    for _ in range(6):
        n, m = 5, 7
        B = rng.normal(size=(n, n))
        P = (B @ B.T + 0.5 * np.eye(n)).astype(np.float32)
        q = rng.normal(size=n).astype(np.float32)
        A = rng.normal(size=(m, n)).astype(np.float32)
        l = np.full(m, -np.inf, np.float32)
        u = rng.uniform(0.5, 2.0, size=m).astype(np.float32)
        args = tuple(jnp.asarray(a) for a in (P, q, A, l, u))
        fast = solve_qp(*args, iters=400, exit_eps=1e-5)  # early exit
        slow = solve_qp(*args, iters=400, exit_eps=0)     # fixed budget
        assert np.allclose(np.asarray(fast.z), np.asarray(slow.z),
                           atol=5e-5), "early exit changed the solution"
        assert float(fast.prim_res) < 1e-4
