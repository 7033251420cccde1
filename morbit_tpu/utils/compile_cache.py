"""Persistent XLA compilation cache wiring.

Compile times dominate cold starts here (round-3 artifacts: 1,528 s
compile+first-run for the plain vmapped bench config, 84-190 s for the
staged/width runners, and the n=10/15 ZDT grid rows cost 1,350/3,510 s
each — ``bench_points_r3.json``, CLAUDE.md). The cache persists compiled
executables across processes/sessions so each program is paid for once
per (program, backend, jax version) instead of once per session.

Call :func:`enable_persistent_cache` BEFORE the first ``jax.jit``
execution. ``tests/conftest.py`` wires it for the suite; ``bench.py`` and
the benchmark/profiling tools wire it for TPU runs.
"""

from __future__ import annotations

import os
import pathlib

_DEFAULT_DIR = str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Default location is ``<repo>/.jax_cache`` (gitignored). Entries are only
    written for compiles slower than ``min_compile_secs`` (don't churn the
    disk for trivial kernels). Returns the directory used. Safe to call
    multiple times."""
    import jax

    cache_dir = cache_dir or os.environ.get("MORBIT_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # cache every slow compile regardless of serialized size
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
