"""Fused Pallas rounds-1-3 selection vs the plain-vmap core.

Both paths execute the SAME ``rbf_selection_core`` (one inside a lane-tiled
Pallas kernel, one under plain vmap), so outputs must agree: exactly for the
integer selections, to float tolerance for the proposed sites.
Runs the kernel in interpreter mode (no TPU needed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.ops import prepare_fused
from morbit_tpu.ops.prepare_fused import make_batched_selection


def _random_case(rng, B, cap, n, dtype=jnp.float32):
    X = jnp.asarray(rng.uniform(0, 1, (B, cap, n)), dtype)
    count = jnp.asarray(rng.integers(1, cap, (B,)), jnp.int32)
    x_s = jnp.asarray(rng.uniform(0.2, 0.8, (B, n)), dtype)
    x_index = jnp.zeros((B,), jnp.int32)
    delta = jnp.asarray(rng.uniform(0.01, 0.3, (B,)), dtype)
    lb = jnp.zeros((B, n), dtype)
    ub = jnp.ones((B, n), dtype)
    max_new = jnp.asarray(rng.integers(0, 10, (B,)), jnp.int32)
    return X, count, x_s, x_index, delta, lb, ub, max_new


@pytest.mark.parametrize("efl", [False, True])
@pytest.mark.parametrize("n", [2, 3])
def test_pallas_selection_matches_core(efl, n, monkeypatch):
    monkeypatch.setattr(prepare_fused, "FORCE_INTERPRET", True)
    B, cap = 8, 23
    ac = AlgorithmConfig()
    cfg = RbfConfig(kernel="multiquadric")
    rng = np.random.default_rng(42 + n)
    args = _random_case(rng, B, cap, n)

    sel = make_batched_selection(n, jnp.float32, ac, cfg, efl)
    pallas_out = jax.vmap(sel)(*args)

    monkeypatch.setattr(prepare_fused, "FORCE_INTERPRET", False)
    monkeypatch.setattr(prepare_fused, "DISABLE", True)
    sel_plain = make_batched_selection(n, jnp.float32, ac, cfg, efl)
    plain_out = jax.vmap(sel_plain)(*args)

    names = ["r1_idx", "r1_cnt", "r2_idx", "r2_cnt", "sites3", "active3",
             "n_new", "dirs", "dirs_count", "fully_linear"]
    for name, a, b in zip(names, pallas_out, plain_out):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_unbatched_call_uses_core():
    ac = AlgorithmConfig()
    cfg = RbfConfig(kernel="multiquadric")
    rng = np.random.default_rng(0)
    args = _random_case(rng, 1, 17, 2)
    single = tuple(a[0] for a in args)
    sel = make_batched_selection(2, jnp.float32, ac, cfg, False)
    out = sel(*single)
    assert out[0].shape == (2,)
    assert np.asarray(out[1]).shape == ()


def test_kernel_shape_gates():
    """Fused kernels stay in their hardware-proven shape regime: bench-like
    shapes route to Pallas, reference-budget ZDT shapes fall back to the
    plain XLA lowering (the round-3 grid showed Mosaic-compile failures at
    maxN*C = 4410 and cap ~2000 — see prepare_fused gate comments)."""
    from morbit_tpu.ops import prepare_fused as pf

    # round-4: two-parabolas bench shapes fit, ZDT n=5 shapes do not
    bench = dict(max_points=6, C=60, n=2, pd=3)
    zdt5 = dict(max_points=21, C=210, n=5, pd=6)
    zdt10 = dict(max_points=66, C=660, n=10, pd=11)
    assert pf._r4_tile(bench) >= 32
    assert pf._r4_tile(zdt5) == 0
    assert pf._r4_tile(zdt10) == 0
    # selection gates
    assert pf._SELECTION_MAX_N >= 2 and pf._SELECTION_MAX_CAP >= 157
