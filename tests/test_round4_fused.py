"""Fused Pallas round-4 acceptance vs the plain run_round4 core.

Both paths implement the identical acceptance semantics (first passer in
database order per wave, Cholesky-bounded — ``src/models/RbfModel.jl:352-499``):
one as ``lax.while_loop`` waves under vmap (``models/rbf_round4.py``), one as
a lane-tiled static wave loop inside a Pallas kernel
(``ops/round4_lane.py``). Acceptance masks must agree exactly away from
pivot-boundary float ties; at float64 the agreement is exact (measured).
Runs the kernel in interpreter mode (no TPU needed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.models.rbf_round4 import run_round4
from morbit_tpu.ops import prepare_fused
from morbit_tpu.ops.prepare_fused import make_batched_round4
from morbit_tpu.ops.rbf import poly_dim


def _case(rng, T, C, n, maxN, dup_frac, dtype):
    X = rng.uniform(0, 1, (T, C, n))
    ndup = int(C * dup_frac)
    for t in range(T):
        src = rng.integers(0, C, ndup)
        dst = rng.integers(0, C, ndup)
        X[t, dst] = X[t, src] + rng.normal(0, 1e-6, (ndup, n))
    X = jnp.asarray(X, dtype)
    cand = jnp.asarray(rng.uniform(size=(T, C)) < 0.7)
    count = jnp.asarray(rng.integers(1, maxN, (T,)), jnp.int32)
    init = jnp.asarray(rng.uniform(0, 1, (T, maxN, n)), dtype)
    rowmask = jnp.arange(maxN)[None, :] < count[:, None]
    init = jnp.where(rowmask[..., None], init, 0.0)
    param = jnp.asarray(rng.uniform(0.5, 2.0, (T,)), dtype)
    return X, cand, init, count, param


@pytest.mark.parametrize("kernel,poly_deg", [("multiquadric", 1),
                                             ("cubic", 1),
                                             ("multiquadric", 0)])
def test_pallas_round4_matches_core(kernel, poly_deg, monkeypatch):
    monkeypatch.setattr(prepare_fused, "FORCE_INTERPRET", True)
    monkeypatch.setattr(prepare_fused, "R4_FUSED", True)
    T, C, n, maxN = 8, 23, 2, 6
    dtype = jnp.float64  # exact acceptance agreement (no boundary ties)
    rng = np.random.default_rng(11)
    X, cand, init, count, param = _case(rng, T, C, n, maxN, 0.4, dtype)
    # deg-0 tails reject less readily; raise the pivot so rejections occur
    chol_pivot = 0.3 if poly_deg == 0 else 1e-2

    static_param = 3 if kernel in ("cubic", "thin_plate_spline") else None
    r4 = make_batched_round4(
        n_vars=n, C=C, dtype=dtype, kernel=kernel,
        static_param=static_param, poly_deg=poly_deg, max_points=maxN,
        chol_pivot=chol_pivot)
    acc_k, N_k = jax.vmap(r4)(X, cand, init, count, param)

    def ref_one(Xi, ci, si, cnt, par):
        st = run_round4(
            Xi, ci, si, cnt, kernel=kernel,
            param=(par if static_param is None else static_param),
            poly_deg=poly_deg, max_points=maxN,
            chol_pivot=jnp.asarray(chol_pivot, dtype))
        return st.accepted, st.N

    acc_r, N_r = jax.vmap(ref_one)(X, cand, init, count, param)
    np.testing.assert_array_equal(np.asarray(N_k), np.asarray(N_r))
    np.testing.assert_array_equal(np.asarray(acc_k), np.asarray(acc_r))
    # rejections must actually occur for the case to be discriminating
    assert int(np.asarray(N_r).min()) < maxN


def test_unbatched_round4_uses_core():
    rng = np.random.default_rng(0)
    X, cand, init, count, param = _case(rng, 1, 17, 2, 6, 0.3, jnp.float32)
    r4 = make_batched_round4(
        n_vars=2, C=17, dtype=jnp.float32, kernel="multiquadric",
        static_param=None, poly_deg=1, max_points=6, chol_pivot=1e-2)
    acc, N = r4(X[0], cand[0], init[0], count[0], param[0])
    assert np.asarray(acc).shape == (17,)
    assert np.asarray(N).shape == ()
