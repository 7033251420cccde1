"""Traced ensure_fully_linear flag == static variants, value for value.

The criticality micro-step restructure shares ONE per-trip model update
between normal surrogate updates and criticality rebuild passes by passing
``ensure_fully_linear`` as a traced flag (``algorithm.jl:575-579``). These
tests pin that the traced variants reproduce the corresponding static
variants exactly: the unified selection computes round 2 and both round-3
proposals and masks per the flag, so every selected output must equal the
value the static structure computes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import LagrangeConfig, RbfConfig
from morbit_tpu.ops import prepare_fused
from morbit_tpu.ops.prepare_fused import make_batched_selection

from tests.test_prepare_fused import _random_case


def _assert_outputs_equal(a_out, b_out, exact_floats=True):
    names = ["r1_idx", "r1_cnt", "r2_idx", "r2_cnt", "sites3", "active3",
             "n_new", "dirs", "dirs_count", "fully_linear"]
    for name, a, b in zip(names, a_out, b_out):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind in "fc" and not exact_floats:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize("efl", [False, True])
@pytest.mark.parametrize("n", [2, 3])
def test_traced_selection_matches_static_vmapped(efl, n):
    """Plain-XLA path (CPU): traced flag == static variant, bit for bit."""
    B, cap = 8, 23
    ac = AlgorithmConfig()
    cfg = RbfConfig(kernel="multiquadric")
    rng = np.random.default_rng(7 + n)
    args = _random_case(rng, B, cap, n)

    sel_static = make_batched_selection(n, jnp.float32, ac, cfg, efl)
    static_out = jax.vmap(sel_static)(*args)

    sel_traced = make_batched_selection(n, jnp.float32, ac, cfg, "traced")
    flags = jnp.full((B,), bool(efl))
    traced_out = jax.vmap(sel_traced)(*args, flags)
    _assert_outputs_equal(traced_out, static_out)

    # mixed per-lane flags: each lane matches its own static variant
    mixed = jnp.asarray(rng.integers(0, 2, (B,)) > 0)
    mixed_out = jax.vmap(sel_traced)(*args, mixed)
    other = jax.vmap(make_batched_selection(n, jnp.float32, ac, cfg,
                                            not efl))(*args)
    for mo, so, oo in zip(mixed_out, static_out, other):
        want_this = np.asarray(mixed) == bool(efl)
        sel_ref = np.where(
            want_this.reshape((-1,) + (1,) * (np.asarray(so).ndim - 1)),
            np.asarray(so), np.asarray(oo))
        np.testing.assert_array_equal(np.asarray(mo), sel_ref)


@pytest.mark.parametrize("efl", [False, True])
def test_traced_selection_matches_static_unbatched(efl):
    n, cap = 2, 17
    ac = AlgorithmConfig()
    cfg = RbfConfig(kernel="multiquadric")
    rng = np.random.default_rng(3)
    args = tuple(a[0] for a in _random_case(rng, 1, cap, n))

    static_out = make_batched_selection(n, jnp.float32, ac, cfg, efl)(*args)
    traced_out = make_batched_selection(n, jnp.float32, ac, cfg, "traced")(
        *args, jnp.asarray(bool(efl)))
    _assert_outputs_equal(traced_out, static_out)


@pytest.mark.parametrize("efl", [False, True])
def test_traced_selection_pallas_interpret(efl, monkeypatch):
    """The Pallas kernel body accepts the traced flag too (interpret mode)."""
    n, B, cap = 2, 8, 23
    ac = AlgorithmConfig()
    cfg = RbfConfig(kernel="multiquadric")
    rng = np.random.default_rng(11)
    args = _random_case(rng, B, cap, n)
    flags = jnp.asarray(rng.integers(0, 2, (B,)) > 0) if efl else \
        jnp.zeros((B,), bool)

    monkeypatch.setattr(prepare_fused, "FORCE_INTERPRET", True)
    sel = make_batched_selection(n, jnp.float32, ac, cfg, "traced")
    pallas_out = jax.vmap(sel)(*args, flags)

    monkeypatch.setattr(prepare_fused, "FORCE_INTERPRET", False)
    monkeypatch.setattr(prepare_fused, "DISABLE", True)
    sel_plain = make_batched_selection(n, jnp.float32, ac, cfg, "traced")
    plain_out = jax.vmap(sel_plain)(*args, flags)
    _assert_outputs_equal(pallas_out, plain_out, exact_floats=False)


def _lagrange_ops_and_ctx(allow_not_linear, dtype=jnp.float64):
    """A LagrangeOps + populated db + ModelContext on a tiny 2-var group."""
    from morbit_tpu.core import database as dbm
    from morbit_tpu.core.mop import MOP, compile_mop
    from morbit_tpu.core import scaling
    from morbit_tpu.models.lagrange import LagrangeOps

    mop = MOP(np.zeros(2), np.ones(2))
    mop.add_objective(lambda x: jnp.sum((x - 0.3) ** 2), n_out=1,
                      model_cfg=LagrangeConfig(
                          degree=2, allow_not_linear=allow_not_linear))
    cmop = compile_mop(mop, False)
    ac = AlgorithmConfig()
    scal = scaling.get_var_scaler(
        np.zeros(2, dtype=np.float64), np.ones(2, dtype=np.float64), "none")
    ops = LagrangeOps(cmop.groups[0], 2, dtype, ac, scal)

    rng = np.random.default_rng(5)
    db = dbm.init_database(16, 2, 1, dtype)
    for i in range(6):
        site = jnp.asarray(rng.uniform(0.1, 0.9, (2,)), dtype)
        db, _ = dbm.add_site(db, site, do_add=True)
    from morbit_tpu.models.base import ModelContext
    ctx = ModelContext(
        x_s=jnp.asarray([0.4, 0.6], dtype),
        x_index=jnp.asarray(0, jnp.int32),
        delta=jnp.asarray(0.2, dtype),
        n_evals=jnp.asarray(3, jnp.int32),
        scal=scal,
        key=jax.random.PRNGKey(0),
    )
    return ops, db, ctx


@pytest.mark.parametrize("efl", [False, True])
def test_lagrange_traced_matches_static(efl):
    ops, db, ctx = _lagrange_ops_and_ctx(allow_not_linear=True)
    st0 = ops.init_state()

    # jit both sides: eager-vs-jit fusion differences show up at the 1e-14
    # level in f64 and are not what this test pins
    st_s, db_s = jax.jit(
        lambda s, d: ops.prepare(s, d, ctx, ensure_fully_linear=efl)
    )(st0, db)
    st_t, db_t = jax.jit(
        lambda s, d, f: ops.prepare(s, d, ctx, ensure_fully_linear=f)
    )(st0, db, jnp.asarray(bool(efl)))

    for a, b in zip(jax.tree_util.tree_leaves((st_s, db_s)),
                    jax.tree_util.tree_leaves((st_t, db_t))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
