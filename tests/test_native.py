"""Native C++ QP engine tests: cross-check against the on-device kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu import native
from morbit_tpu.ops.qp import solve_qp


@pytest.mark.parametrize("trial", range(5))
def test_native_matches_jax_qp(trial):
    rng = np.random.default_rng(trial)
    n, m = 5, 8
    B = rng.standard_normal((n, n))
    P = B @ B.T + np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    l = -rng.random(m) - 0.2
    u = rng.random(m) + 0.2

    z_c, y_c, obj_c, pr_c, dr_c, ok_c = native.qp_solve(P, q, A, l, u)
    sol_j = solve_qp(jnp.array(P), jnp.array(q), jnp.array(A),
                     jnp.array(l), jnp.array(u))
    assert ok_c
    assert pr_c < 1e-7
    assert np.isclose(obj_c, float(sol_j.obj), rtol=1e-5, atol=1e-7)
    assert np.allclose(z_c, np.asarray(sol_j.z), atol=1e-5)


def test_native_lp_with_inf_rows():
    n = 2
    P = np.zeros((n, n))
    q = np.array([-1.0, -1.0])
    A = np.vstack([np.eye(n), np.ones((1, n)), np.zeros((2, n))])
    l = np.array([0.0, 0.0, -np.inf, -np.inf, -np.inf])
    u = np.array([1.0, 1.0, 1.5, np.inf, np.inf])
    z, y, obj, pr, dr, ok = native.qp_solve(P, q, A, l, u)
    assert ok and np.isclose(obj, -1.5, atol=1e-6)


def test_native_batch():
    rng = np.random.default_rng(9)
    Bn, n, m = 6, 3, 5
    Bm = rng.standard_normal((Bn, n, n))
    P = Bm @ Bm.transpose(0, 2, 1) + np.eye(n)
    q = rng.standard_normal((Bn, n))
    A = rng.standard_normal((Bn, m, n))
    l = -rng.random((Bn, m)) - 0.5
    u = rng.random((Bn, m)) + 0.5
    z, y, info = native.qp_solve_batch(P, q, A, l, u)
    assert z.shape == (Bn, n)
    assert np.all(info[:, 1] < 1e-6)  # primal residuals
