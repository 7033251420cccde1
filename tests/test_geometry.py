"""Geometry kernel tests (project/local-bounds/intersect_bounds).

Ground truth via brute-force line search, mirroring the closed-form
``_intersect_bounds`` semantics of the reference (``src/utilities.jl:156``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.ops import geometry as geo


def test_project_into_box():
    z = jnp.array([-2.0, 0.5, 3.0])
    lb = jnp.array([0.0, 0.0, 0.0])
    ub = jnp.array([1.0, 1.0, 1.0])
    assert np.allclose(geo.project_into_box(z, lb, ub), [0.0, 0.5, 1.0])


def test_local_bounds():
    x = jnp.array([0.5, 0.9])
    lb, ub = geo.local_bounds(x, 0.2, jnp.zeros(2), jnp.ones(2))
    assert np.allclose(lb, [0.3, 0.7])
    assert np.allclose(ub, [0.7, 1.0])


def _brute_force_sigma(x, d, lb, ub, A=None, b=None):
    """Largest sigma >= 0 keeping x + sigma d feasible (grid + refine)."""
    def feas(s):
        p = x + s * d
        ok = np.all(p >= lb - 1e-12) and np.all(p <= ub + 1e-12)
        if A is not None:
            ok = ok and np.all(A @ p - b <= 1e-12)
        return ok

    if not feas(0.0):
        return 0.0
    lo, hi = 0.0, 1.0
    while feas(hi) and hi < 1e8:
        lo, hi = hi, hi * 2
    if hi >= 1e8:
        return np.inf
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if feas(mid):
            lo = mid
        else:
            hi = mid
    return lo


@pytest.mark.parametrize("trial", range(20))
def test_intersect_bounds_box_only(trial):
    rng = np.random.default_rng(trial)
    n = 4
    lb = -rng.random(n) - 0.5
    ub = rng.random(n) + 0.5
    x = rng.uniform(lb, ub)
    d = rng.standard_normal(n)
    sigma = geo.intersect_bounds(jnp.array(x), jnp.array(d), jnp.array(lb), jnp.array(ub))
    expected = _brute_force_sigma(x, d, lb, ub)
    assert np.isclose(float(sigma), expected, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("trial", range(10))
def test_intersect_bounds_with_ineq(trial):
    rng = np.random.default_rng(100 + trial)
    n, q = 3, 5
    lb = np.full(n, -2.0)
    ub = np.full(n, 2.0)
    x = rng.uniform(-0.5, 0.5, n)
    d = rng.standard_normal(n)
    A = rng.standard_normal((q, n))
    b = A @ x + rng.random(q) + 0.1  # strictly feasible at x
    sigma = geo.intersect_bounds(
        jnp.array(x), jnp.array(d), jnp.array(lb), jnp.array(ub),
        jnp.array(A), jnp.array(b),
    )
    expected = _brute_force_sigma(x, d, lb, ub, A, b)
    assert np.isclose(float(sigma), expected, rtol=1e-8, atol=1e-10)


def test_intersect_bounds_zero_direction():
    x = jnp.zeros(3)
    d = jnp.zeros(3)
    sigma = geo.intersect_bounds(x, d, -jnp.ones(3), jnp.ones(3))
    assert np.isinf(float(sigma))


def test_intersect_bounds_on_boundary_moving_out():
    # start on the upper bound moving outward -> sigma = 0
    x = jnp.array([1.0, 0.0])
    d = jnp.array([1.0, 0.0])
    sigma = geo.intersect_bounds(x, d, -jnp.ones(2), jnp.ones(2))
    assert float(sigma) == 0.0


def test_intersect_bounds_absmax_and_neg():
    x = jnp.array([0.8, 0.0])
    d = jnp.array([1.0, 0.0])
    neg, pos = geo.intersect_bounds(x, d, -jnp.ones(2), jnp.ones(2), ret_mode="both")
    assert np.isclose(float(pos), 0.2)
    assert np.isclose(float(neg), -1.8)
    am = geo.intersect_bounds(x, d, -jnp.ones(2), jnp.ones(2), ret_mode="absmax")
    assert np.isclose(float(am), -1.8)


def test_masked_ineq_rows_ignored():
    x = jnp.zeros(2)
    d = jnp.array([1.0, 0.0])
    A = jnp.array([[1.0, 0.0], [100.0, 0.0]])
    b = jnp.array([0.5, 0.01])
    mask = jnp.array([True, False])
    sigma = geo.intersect_bounds(x, d, None, None, A, b, ineq_mask=mask)
    assert np.isclose(float(sigma), 0.5)
