"""RBF fit/eval/jacobian tests: interpolation property, masking, autodiff.

Mirrors the reference test strategy (``test/rbf_models.jl:104-115``): the
model must interpolate its training values and the Jacobian must agree with
autodiff ground truth of the model itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.ops.rbf import (
    RBF_KERNELS,
    eval_rbf,
    fit_rbf,
    rbf_jacobian,
    poly_dim,
)


def _f(x):
    return jnp.stack([jnp.sum(x ** 2), jnp.sum((x - 1.0) ** 3)])


@pytest.mark.parametrize("kernel", RBF_KERNELS)
@pytest.mark.parametrize("poly_deg", [-1, 0, 1])
def test_interpolation(kernel, poly_deg):
    rng = np.random.default_rng(0)
    n, n_pts, cap = 3, 7, 12
    sites = jnp.array(rng.uniform(-1, 1, (cap, n)))
    mask = jnp.arange(cap) < n_pts
    vals = jax.vmap(_f)(sites)

    fit = fit_rbf(sites, vals, mask, kernel=kernel, poly_deg=poly_deg)
    for i in range(n_pts):
        out = eval_rbf(fit, sites[i], kernel, poly_deg)
        assert np.allclose(np.asarray(out), np.asarray(vals[i]), atol=1e-7), (
            kernel, poly_deg, i)


@pytest.mark.parametrize("kernel", RBF_KERNELS)
def test_masked_rows_do_not_affect_fit(kernel):
    rng = np.random.default_rng(1)
    n, n_pts, cap = 2, 5, 9
    sites_valid = rng.uniform(-1, 1, (n_pts, n))
    vals_valid = np.asarray(jax.vmap(_f)(jnp.array(sites_valid)))

    garbage = rng.uniform(-1, 1, (cap - n_pts, n))
    sites = jnp.array(np.vstack([sites_valid, garbage]))
    vals = jnp.array(np.vstack([vals_valid, rng.standard_normal((cap - n_pts, 2))]))
    mask = jnp.arange(cap) < n_pts

    sites2 = jnp.array(np.vstack([sites_valid, 100.0 + garbage]))
    vals2 = jnp.array(np.vstack([vals_valid, np.zeros((cap - n_pts, 2))]))

    fit1 = fit_rbf(sites, vals, mask, kernel=kernel, poly_deg=1)
    fit2 = fit_rbf(sites2, vals2, mask, kernel=kernel, poly_deg=1)
    x = jnp.array(rng.uniform(-1, 1, n))
    out1 = eval_rbf(fit1, x, kernel, 1)
    out2 = eval_rbf(fit2, x, kernel, 1)
    assert np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-8)


@pytest.mark.parametrize("kernel", RBF_KERNELS)
def test_jacobian_matches_finite_differences(kernel):
    rng = np.random.default_rng(2)
    n, n_pts, cap = 3, 8, 8
    sites = jnp.array(rng.uniform(-1, 1, (cap, n)))
    mask = jnp.ones(cap, bool)
    vals = jax.vmap(_f)(sites)
    fit = fit_rbf(sites, vals, mask, kernel=kernel, poly_deg=1)

    x = jnp.array(rng.uniform(-0.5, 0.5, n))
    J = np.asarray(rbf_jacobian(fit, x, kernel, 1))
    h = 1e-6
    for j in range(n):
        e = np.zeros(n); e[j] = h
        fp = np.asarray(eval_rbf(fit, x + jnp.array(e), kernel, 1))
        fm = np.asarray(eval_rbf(fit, x - jnp.array(e), kernel, 1))
        assert np.allclose(J[:, j], (fp - fm) / (2 * h), atol=1e-4)


def test_jacobian_at_training_site_is_finite():
    # autodiff safety at r = 0 (tps/cubic have log/sqrt singularities)
    rng = np.random.default_rng(3)
    n = 2
    sites = jnp.array(rng.uniform(-1, 1, (5, n)))
    mask = jnp.ones(5, bool)
    vals = jax.vmap(_f)(sites)
    for kernel in RBF_KERNELS:
        fit = fit_rbf(sites, vals, mask, kernel=kernel, poly_deg=1)
        J = np.asarray(rbf_jacobian(fit, sites[0], kernel, 1))
        assert np.all(np.isfinite(J)), kernel


def test_linear_reproduction_deg1():
    """With a degree-1 tail, affine functions are reproduced exactly."""
    rng = np.random.default_rng(4)
    n = 3
    a = rng.standard_normal(n)
    sites = jnp.array(rng.uniform(-1, 1, (n + 3, n)))
    mask = jnp.ones(n + 3, bool)
    vals = (np.asarray(sites) @ a + 0.7)[:, None]
    for kernel in ["cubic", "multiquadric", "thin_plate_spline"]:
        fit = fit_rbf(sites, jnp.array(vals), mask, kernel=kernel, poly_deg=1)
        x = jnp.array(rng.uniform(-2, 2, n))  # extrapolates too
        out = float(eval_rbf(fit, x, kernel, 1)[0])
        assert np.isclose(out, float(np.asarray(x) @ a + 0.7), atol=1e-6), kernel


def test_poly_dim():
    assert poly_dim(4, -1) == 0
    assert poly_dim(4, 0) == 1
    assert poly_dim(4, 1) == 5
