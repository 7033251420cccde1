"""Equivalence of the lane-batched fused ADMM kernel (ops/qp_lane.py).

The fused kernel must reproduce the plain vmapped XLA stage loop: same
formulas, same op order, batch rearranged onto trailing (8, 128) tiles.
Runs the Pallas path in interpreter mode on CPU (tests/conftest.py forces
the CPU backend).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import morbit_tpu.ops.qp_lane as qpl
from morbit_tpu.ops.qp import solve_qp


def _random_problems(B, n, m, seed=0):
    """Batch of tiny FEASIBLE bounded QPs in OSQP form (the real descent
    LPs always carry box rows and a feasible interior): identity box rows,
    random rows made feasible around a random interior point, plus
    one-sided / loose / equality rows. Strictly convex P so the ADMM
    fixpoint is unique and sharply determined."""
    assert m > n
    rng = np.random.default_rng(seed)
    P = np.zeros((B, n, n), np.float32)
    for b in range(B):
        G = rng.normal(size=(n, n)).astype(np.float32)
        P[b] = 0.1 * (G @ G.T) + 0.01 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    A = rng.normal(size=(B, m, n)).astype(np.float32)
    A[:, -n:] = np.eye(n, dtype=np.float32)          # box rows
    zstar = rng.uniform(-0.5, 0.5, size=(B, n)).astype(np.float32)
    Az = np.einsum("bmn,bn->bm", A, zstar)
    slack = np.abs(rng.normal(size=(B, m))).astype(np.float32) + 0.3
    lo, hi = Az - slack, Az + slack
    lo[:, -n:], hi[:, -n:] = -1.0, 1.0               # -1 <= z <= 1
    # row 0: one-sided (l = -inf), row 1: loose (both inf), row 2: equality
    lo[:, 0] = -np.inf
    lo[:, 1], hi[:, 1] = -np.inf, np.inf
    lo[:, 2] = hi[:, 2] = Az[:, 2]
    return (jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
            jnp.asarray(lo), jnp.asarray(hi))


@pytest.mark.parametrize("B,n,m", [(8, 3, 6), (4, 2, 4)])
def test_lane_admm_matches_vmapped_core(monkeypatch, B, n, m):
    monkeypatch.setattr(qpl, "FORCE_INTERPRET", True)
    monkeypatch.setattr(qpl, "_MIN_B", 1)
    args = _random_problems(B, n, m)

    def solve(P, q, A, l, u):
        return solve_qp(P, q, A, l, u, iters=200, adapt_every=50)

    fused = jax.jit(jax.vmap(solve))(*args)

    monkeypatch.setattr(qpl, "QP_LANE", False)
    plain = jax.jit(jax.vmap(solve))(*args)

    # same splitting recursion, rearranged batch layout. On lanes where the
    # plain path converged (status_ok) the fixpoint is sharply determined
    # and the paths agree to f32 roundoff; unconverged lanes amplify
    # rounding-order differences through the splitting recursion (both
    # paths return status_ok=False there and the solver's omega=-inf
    # failure handling takes over), so only statuses are compared.
    ok = np.asarray(plain.status_ok)
    np.testing.assert_array_equal(np.asarray(fused.status_ok), ok)
    zf, zp = np.asarray(fused.z), np.asarray(plain.z)
    np.testing.assert_allclose(zf[ok], zp[ok], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(fused.obj)[ok],
                               np.asarray(plain.obj)[ok],
                               rtol=2e-3, atol=2e-3)


def test_lane_padding_batch_not_multiple_of_tile(monkeypatch):
    """B that is not a multiple of the 1024-lane tile pads with lane-0
    copies; results for the real lanes must be unaffected."""
    monkeypatch.setattr(qpl, "FORCE_INTERPRET", True)
    monkeypatch.setattr(qpl, "_MIN_B", 1)
    args = _random_problems(5, 3, 6, seed=3)

    def solve(P, q, A, l, u):
        return solve_qp(P, q, A, l, u, iters=20, adapt_every=10)

    fused = jax.jit(jax.vmap(solve))(*args)
    monkeypatch.setattr(qpl, "QP_LANE", False)
    plain = jax.jit(jax.vmap(solve))(*args)
    np.testing.assert_allclose(np.asarray(fused.z), np.asarray(plain.z),
                               rtol=2e-4, atol=2e-4)


def test_small_batch_and_f64_fall_back(monkeypatch):
    """Below _MIN_B (and for float64) the batching rule must take the plain
    jax.vmap(core) path — kernel never invoked."""
    called = {"n": 0}
    orig = qpl._pallas_admm

    def spy(*a, **k):
        called["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(qpl, "_pallas_admm", spy)
    monkeypatch.setattr(qpl, "FORCE_INTERPRET", True)
    args = _random_problems(4, 3, 6, seed=1)   # B=4 < _MIN_B

    def solve(P, q, A, l, u):
        return solve_qp(P, q, A, l, u, iters=20, adapt_every=10)

    jax.jit(jax.vmap(solve))(*args)
    assert called["n"] == 0

    args64 = tuple(jnp.asarray(a, jnp.float64) for a in args)
    monkeypatch.setattr(qpl, "_MIN_B", 1)
    jax.jit(jax.vmap(solve))(*args64)
    assert called["n"] == 0
