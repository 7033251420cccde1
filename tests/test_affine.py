"""Affinely-independent point filter tests vs a NumPy reimplementation of the
reference iterator semantics (``src/models/AffinelyIndependentPoints.jl``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.ops.affine import (
    affinely_independent_points,
    householder_q,
    orthogonal_complement,
)


def _np_orth_complement(Y):
    """Julia `_orthogonal_complement_matrix`: Q[:, k:] with inf-normalized cols."""
    n = Y.shape[0]
    if Y.shape[1] == 0:
        return np.eye(n)
    Q, _ = np.linalg.qr(Y, mode="complete")
    Z = Q[:, Y.shape[1]:]
    norms = np.max(np.abs(Z), axis=0)
    norms[norms == 0] = 1.0
    return Z / norms


def _np_filter(x0, seeds, pivot, n_pick, Y=None):
    """Reference iterator: first pick = unconditional argmax inf-norm, then
    greedy argmax of projection onto complement with pivot test."""
    n = len(x0)
    shifted = [s - x0 for s in seeds]
    Y = np.zeros((n, 0)) if Y is None else Y.copy()
    chosen = []
    remaining = list(range(len(seeds)))
    if not remaining:
        return chosen, Y
    # first pick
    i = max(remaining, key=lambda j: np.max(np.abs(shifted[j])))
    Y = np.hstack([Y, shifted[i][:, None]])
    chosen.append(i)
    remaining.remove(i)
    Z = _np_orth_complement(Y)
    while len(chosen) < n_pick and remaining:
        scores = {j: np.max(np.abs(Z @ (Z.T @ shifted[j]))) for j in remaining}
        i = max(remaining, key=lambda j: scores[j])
        if scores[i] <= pivot:
            break
        Y = np.hstack([Y, shifted[i][:, None]])
        chosen.append(i)
        remaining.remove(i)
        Z = _np_orth_complement(Y)
    return chosen, Y


def test_householder_q_matches_lapack():
    rng = np.random.default_rng(0)
    n, k = 5, 3
    Y = np.zeros((n, n))
    Y[:, :k] = rng.standard_normal((n, k))
    Q = np.asarray(householder_q(jnp.array(Y), k))
    Qref, _ = np.linalg.qr(Y[:, :k], mode="complete")
    # complement columns must agree up to LAPACK convention (exactly)
    assert np.allclose(np.abs(Q[:, k:]), np.abs(Qref[:, k:]), atol=1e-12)
    # orthogonality
    assert np.allclose(Q.T @ Q, np.eye(n), atol=1e-12)
    # complement orthogonal to Y
    assert np.allclose(Q[:, k:].T @ Y[:, :k], 0.0, atol=1e-12)


def test_complement_of_empty_is_identity_scaled():
    Z = np.asarray(orthogonal_complement(jnp.zeros((4, 4)), 0))
    assert np.allclose(np.abs(Z), np.eye(4), atol=1e-12)


@pytest.mark.parametrize("trial", range(10))
def test_selection_matches_reference_semantics(trial):
    rng = np.random.default_rng(trial)
    n, n_seeds = 4, 12
    x0 = rng.uniform(-1, 1, n)
    seeds = rng.uniform(-1, 1, (n_seeds, n))
    pivot = 0.1

    ref_chosen, _ = _np_filter(x0, list(seeds), pivot, n)

    sel = affinely_independent_points(
        jnp.array(x0), jnp.array(seeds), jnp.ones(n_seeds, bool), pivot, n
    )
    got = [int(i) for i in np.asarray(sel.order) if i >= 0][: int(sel.n_picked)]
    assert got == ref_chosen
    assert int(sel.n_picked) == len(ref_chosen)


def test_degenerate_seeds_stop_early():
    # all seeds on a line -> at most 1 + (rank of span) picks exceed pivot
    n = 3
    x0 = np.zeros(n)
    base = np.array([1.0, 0.0, 0.0])
    seeds = np.stack([t * base for t in [1.0, 0.5, -0.7, 0.3]])
    sel = affinely_independent_points(
        jnp.array(x0), jnp.array(seeds), jnp.ones(4, bool), 1e-3, n
    )
    assert int(sel.n_picked) == 1


def test_masked_seeds_excluded():
    n = 2
    x0 = np.zeros(n)
    seeds = np.array([[5.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    mask = np.array([False, True, True])
    sel = affinely_independent_points(
        jnp.array(x0), jnp.array(seeds), jnp.array(mask), 1e-3, n
    )
    got = [int(i) for i in np.asarray(sel.order) if i >= 0]
    assert 0 not in got
    assert int(sel.n_picked) == 2


def test_warm_start_span():
    # Y already spans e1 -> picks should prefer seeds with e2 component
    n = 2
    x0 = np.zeros(n)
    Y = np.zeros((n, n)); Y[0, 0] = 1.0
    seeds = np.array([[2.0, 0.0], [0.1, 0.5]])
    sel = affinely_independent_points(
        jnp.array(x0), jnp.array(seeds), jnp.ones(2, bool), 1e-3, 1,
        Y_init=jnp.array(Y), k_init=1,
    )
    # first pick is unconditional argmax-norm (seed 0) per reference semantics
    got = [int(i) for i in np.asarray(sel.order) if i >= 0]
    assert got == [0]
