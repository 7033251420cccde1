"""Trace-time matmul-precision capture for raw primitives.

``jax.default_matmul_precision`` is a TRACE-time context.  The solver enters
it inside its jitted entry points (``core/algorithm.py:_highest_matmul_precision``),
so tracing sees it — but raw primitives whose lowering re-traces a core
function via ``mlir.lower_fun`` run that re-trace at LOWERING time, after the
context has exited.  On TPU the core's float32 matmuls then silently drop to
bfloat16 passes: the descent LP returns ``omega=-inf`` and unbatched solves
exit CRITICAL at iteration 1 (repro: ``tools/repro_qp_bisect.py``, which shows
the same jaxpr succeed/fail purely on the ambient precision at lowering).

Fix: capture the ambient precision at *bind* time (trace time, context
active) as a primitive param and replay it around every deferred re-trace of
the core — the impl, the ``lower_fun`` lowering, and the batching rule.
"""

from __future__ import annotations

import contextlib

import jax


def current_matmul_precision():
    """The ambient ``default_matmul_precision`` value, or ``None``."""
    prec = jax.config.jax_default_matmul_precision
    return None if prec is None else str(prec)


def matmul_precision_ctx(precision):
    """Context manager re-entering a captured precision (no-op for ``None``)."""
    if precision is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(precision)
