"""Batched / sharded multistart optimization.

The TPU-native replacement for the reference's ``Threads.@threads``
benchmark loop over independent optimizer runs
(``examples/large_scale_benchmarks.jl:253-275``, SURVEY.md §2 parallelism
inventory): the whole solver is a pure function, so

* ``jax.vmap`` over the starting-point axis turns N independent
  trust-region runs into batched dense algebra (batched Gram solves, batched
  ADMM QPs -> MXU-saturating GEMMs), with per-instance termination handled by
  the while-loop batching rule (finished instances become no-ops);
* ``jax.sharding`` over a device ``Mesh`` splits the batch across chips.
  Instances are independent — no collectives are required (SURVEY.md §5.8),
  so the sharding is pure data parallelism over ICI and scales linearly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from morbit_tpu.core.algorithm import OptimizeResult, Solver
from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.mop import MOP, CompiledMOP, compile_mop


def build_solver(mop, algo_config: Optional[AlgorithmConfig] = None,
                 dtype=jnp.float32) -> Solver:
    ac = algo_config or AlgorithmConfig()
    cmop = mop if isinstance(mop, CompiledMOP) else compile_mop(mop, ac.combine_models)
    return Solver(cmop, ac, dtype)


def multistart_optimize(
    mop,
    x0_batch,
    algo_config: Optional[AlgorithmConfig] = None,
    dtype=jnp.float32,
    mesh: Optional[Mesh] = None,
    donate: bool = False,
) -> OptimizeResult:
    """Run one full optimize() per row of ``x0_batch`` (B, n), batched.

    With ``mesh`` (1-D over axis name 'batch'), the batch is sharded across
    devices; B must be divisible by the device count.
    """
    solver = build_solver(mop, algo_config, dtype)
    x0_batch = jnp.asarray(x0_batch, dtype)

    run = jax.vmap(solver.solve)
    if mesh is not None:
        in_sharding = NamedSharding(mesh, P("batch", None))
        run = jax.jit(run, in_shardings=(in_sharding,))
        x0_batch = jax.device_put(x0_batch, in_sharding)
    else:
        run = jax.jit(run)
    return run(x0_batch)


def default_mesh(axis: str = "batch") -> Mesh:
    devs = np.array(jax.devices())
    return Mesh(devs, (axis,))


def parametric_multistart(
    mop_builder,
    x0_batch,
    theta_batch,
    algo_config: Optional[AlgorithmConfig] = None,
    dtype=jnp.float32,
    mesh: Optional[Mesh] = None,
) -> OptimizeResult:
    """Batch over problem *data*, not just starting points.

    ``mop_builder(theta) -> MOP`` builds the problem from a parameter pytree;
    its objective/constraint closures may capture ``theta`` (a tracer here),
    so one compiled program solves a different problem instance per batch row
    — the TPU-native analogue of the reference benchmark harness's
    problem-grid rows (``examples/large_scale_benchmarks.jl:69-118``,
    SURVEY.md §2 #29) without one compile per problem. Rows of ``x0_batch``
    (B, n) pair with rows of every leaf of ``theta_batch`` (B, ...).

    Static structure (n_vars, bounds, group/output layout, configs) must not
    depend on ``theta`` — only array values may. With ``mesh`` (1-D over
    axis 'batch'), the batch shards across devices like
    :func:`multistart_optimize`.
    """
    ac = algo_config or AlgorithmConfig()

    def one(x0, theta):
        mop = mop_builder(theta)
        cmop = mop if isinstance(mop, CompiledMOP) else compile_mop(
            mop, ac.combine_models)
        solver = Solver(cmop, ac, dtype)
        return solver.solve(x0)

    def cast(a):
        a = jnp.asarray(a)
        # float parameter leaves follow the solve dtype; integer/bool leaves
        # (categorical parameters) keep their dtype
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    x0_batch = jnp.asarray(x0_batch, dtype)
    theta_batch = jax.tree_util.tree_map(cast, theta_batch)
    run = jax.jit(jax.vmap(one))
    if mesh is not None:
        in_sharding = NamedSharding(mesh, P("batch"))
        x0_batch = jax.device_put(
            x0_batch, NamedSharding(mesh, P("batch", None)))
        theta_batch = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, in_sharding), theta_batch)
    return run(x0_batch, theta_batch)
