"""Unrolled tiny-matrix solvers vs jnp.linalg ground truth.

These are the TPU hot-path replacements for XLA's batched LU/Cholesky
(tools/profile_linalg.py: ~200x at (1024, 9, 9) f32 on v5e); correctness
must hold unbatched, under vmap, and at both dtypes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.ops.batched_linalg import (
    chol_factor,
    chol_solve,
    gj_inverse,
    gj_solve,
    solve_small,
)


@pytest.mark.parametrize("k", [1, 2, 3, 5, 9])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_gj_solve_matches_lu(k, dtype):
    rng = np.random.default_rng(k)
    A = jnp.asarray(rng.normal(size=(k, k)) + 3 * np.eye(k), dtype)
    b = jnp.asarray(rng.normal(size=(k,)), dtype)
    x = gj_solve(A, b)
    ref = jnp.linalg.solve(A, b[:, None])[:, 0]
    tol = 1e-5 if dtype == jnp.float32 else 1e-12
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=tol, atol=tol)


def test_gj_solve_needs_pivoting():
    # zero pivot at (0, 0): fails without row pivoting
    A = jnp.asarray([[0.0, 1.0], [1.0, 0.0]], jnp.float64)
    b = jnp.asarray([2.0, 3.0], jnp.float64)
    x = gj_solve(A, b)
    np.testing.assert_allclose(np.asarray(x), [3.0, 2.0], atol=1e-14)


def test_gj_solve_matrix_rhs_and_inverse():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(4, 4)) + 4 * np.eye(4), jnp.float64)
    B = jnp.asarray(rng.normal(size=(4, 3)), jnp.float64)
    X = gj_solve(A, B)
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(B), atol=1e-12)
    np.testing.assert_allclose(np.asarray(A @ gj_inverse(A)), np.eye(4), atol=1e-12)


def test_gj_solve_under_vmap():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(64, 5, 5)) + 3 * np.eye(5), jnp.float32)
    b = jnp.asarray(rng.normal(size=(64, 5)), jnp.float32)
    X = jax.jit(jax.vmap(gj_solve))(A, b)
    ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(X), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_gj_singular_gives_nonfinite():
    A = jnp.zeros((3, 3), jnp.float32)
    b = jnp.ones((3,), jnp.float32)
    x = gj_solve(A, b)
    assert not bool(jnp.all(jnp.isfinite(x)))


@pytest.mark.parametrize("k", [1, 3, 6])
def test_chol_factor_solve(k):
    rng = np.random.default_rng(k)
    G = rng.normal(size=(k, k))
    M = jnp.asarray(G @ G.T + k * np.eye(k), jnp.float64)
    L = chol_factor(M)
    np.testing.assert_allclose(np.asarray(L), np.asarray(jnp.linalg.cholesky(M)),
                               atol=1e-12)
    b = jnp.asarray(rng.normal(size=(k,)), jnp.float64)
    x = chol_solve(L, b)
    np.testing.assert_allclose(np.asarray(M @ x), np.asarray(b), atol=1e-10)


def test_chol_breakdown_detectable():
    M = jnp.asarray([[1.0, 2.0], [2.0, 1.0]], jnp.float32)  # indefinite
    L = chol_factor(M)
    assert not bool(jnp.all(jnp.isfinite(L)))


def test_solve_small_dispatch():
    rng = np.random.default_rng(2)
    A64 = jnp.asarray(rng.normal(size=(3, 3)) + 3 * np.eye(3), jnp.float64)
    b64 = jnp.asarray(rng.normal(size=(3,)), jnp.float64)
    # float64 path goes through jnp.linalg.solve — results identical bitwise
    np.testing.assert_array_equal(
        np.asarray(solve_small(A64, b64)),
        np.asarray(jnp.linalg.solve(A64, b64[:, None])[:, 0]))
    A32, b32 = A64.astype(jnp.float32), b64.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(solve_small(A32, b32)),
                               np.asarray(gj_solve(A32, b32)))


@pytest.mark.parametrize("k", [25, 40, 77])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_blocked_gj_matches_lu(k, dtype):
    from morbit_tpu.ops.batched_linalg import blocked_gj_solve

    rng = np.random.default_rng(k)
    A = jnp.asarray(rng.normal(size=(k, k)) + 3 * np.eye(k), dtype)
    b = jnp.asarray(rng.normal(size=(k, 2)), dtype)
    x = blocked_gj_solve(A, b)
    ref = jnp.linalg.solve(A, b)
    tol = 5e-4 if dtype == jnp.float32 else 1e-10
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=tol, atol=tol)


def test_blocked_gj_needs_pivoting():
    """KKT-like system with a zero trailing block: unpivoted elimination
    hits zero diagonals (the RBF KKT shape, ``fit_rbf``)."""
    from morbit_tpu.ops.batched_linalg import blocked_gj_solve

    rng = np.random.default_rng(0)
    p, q = 30, 4
    Phi = rng.normal(size=(p, p))
    Phi = Phi @ Phi.T + 0.1 * np.eye(p)
    Pi = rng.normal(size=(p, q))
    K = np.block([[Phi, Pi], [Pi.T, np.zeros((q, q))]])
    b = rng.normal(size=(p + q,))
    x = blocked_gj_solve(jnp.asarray(K, jnp.float64), jnp.asarray(b, jnp.float64))
    np.testing.assert_allclose(np.asarray(K @ np.asarray(x)), b, atol=1e-8)


def test_blocked_gj_under_vmap():
    from morbit_tpu.ops.batched_linalg import blocked_gj_solve

    rng = np.random.default_rng(1)
    k, B = 33, 7
    A = jnp.asarray(rng.normal(size=(B, k, k)) + 4 * np.eye(k), jnp.float64)
    b = jnp.asarray(rng.normal(size=(B, k)), jnp.float64)
    X = jax.jit(jax.vmap(blocked_gj_solve))(A, b)
    ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(X), np.asarray(ref), atol=1e-9)


def test_solve_small_midsize_dispatch():
    from morbit_tpu.ops.batched_linalg import solve_small

    rng = np.random.default_rng(2)
    k = 50
    A = jnp.asarray(rng.normal(size=(k, k)) + 4 * np.eye(k), jnp.float32)
    b = jnp.asarray(rng.normal(size=(k,)), jnp.float32)
    x = solve_small(A, b)
    ref = jnp.linalg.solve(jnp.asarray(A, jnp.float64),
                           jnp.asarray(b, jnp.float64)[:, None])[:, 0]
    np.testing.assert_allclose(np.asarray(x, np.float64), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
