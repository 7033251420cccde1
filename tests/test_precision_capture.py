"""Raw primitives must replay the trace-time matmul precision at lowering.

``jax.default_matmul_precision`` is a trace-time context; the solver enters
it INSIDE its jitted entry points (``core/algorithm.py:_highest_matmul_precision``),
so lowering — where ``mlir.lower_fun`` re-traces each raw primitive's core —
runs after the context exits.  Unfixed, the ADMM/selection/round-4 cores'
float32 matmuls silently dropped to bf16 passes on TPU and unbatched solves
exited CRITICAL at iteration 1 (``tools/repro_qp_bisect.py``).  The fix
captures the ambient precision at bind time (``ops/precision.py``) and
replays it in the deferred re-traces; these tests pin that structurally by
inspecting the lowered StableHLO — platform-independent, so they catch the
regression on the CPU test runner.
"""

import jax
import jax.numpy as jnp

from morbit_tpu.ops.qp import solve_qp


def _lowered_text(fn, *args):
    return jax.jit(fn).lower(*args).as_text()


def test_qp_primitive_lowering_keeps_highest_precision():
    n, m = 3, 6
    P = jnp.eye(n, dtype=jnp.float32)
    q = jnp.ones((n,), jnp.float32)
    A = jnp.ones((m, n), jnp.float32)
    l = jnp.full((m,), -1.0, jnp.float32)
    u = jnp.full((m,), 1.0, jnp.float32)

    def traced_only(P, q, A, l, u):
        # context exits when tracing completes — before lowering re-traces
        # the qp_admm primitive core (the in-solver pattern)
        with jax.default_matmul_precision("highest"):
            return solve_qp(P, q, A, l, u, iters=8, adapt_every=4).z

    text = _lowered_text(traced_only, P, q, A, l, u)
    assert "qp_admm" not in text  # primitive fully lowered, not left opaque
    assert "HIGHEST" in text

    # control: with no context anywhere, nothing should request HIGHEST
    def bare(P, q, A, l, u):
        return solve_qp(P, q, A, l, u, iters=8, adapt_every=4).z

    assert "HIGHEST" not in _lowered_text(bare, P, q, A, l, u)


def test_selection_primitive_lowering_keeps_highest_precision():
    from morbit_tpu.core.config import AlgorithmConfig
    from morbit_tpu.models.configs import RbfConfig
    from morbit_tpu.ops.prepare_fused import make_batched_selection

    ac = AlgorithmConfig()
    cfg = RbfConfig()
    n, cap = 2, 12
    sel = make_batched_selection(n, jnp.float32, ac, cfg,
                                 ensure_fully_linear=False)
    X = jnp.zeros((cap, n), jnp.float32)
    x_s = jnp.zeros((n,), jnp.float32)
    lb = jnp.zeros((n,), jnp.float32)
    ub = jnp.ones((n,), jnp.float32)

    def traced_only(X, x_s, lb, ub):
        with jax.default_matmul_precision("highest"):
            return sel(X, 3, x_s, 0, jnp.float32(0.1), lb, ub, n)[4]

    assert "HIGHEST" in _lowered_text(traced_only, X, x_s, lb, ub)
