"""morbit_tpu — TPU-native multiobjective trust-region solver framework.

A brand-new JAX/XLA framework with the capabilities of the Julia reference
``manuelbb-upb/Morbit.jl`` (derivative-free multiobjective trust-region
optimization with RBF / Taylor / Lagrange surrogates), re-designed TPU-first:

* the whole solver iteration is a pure ``State -> State`` function executed
  under ``jax.lax.while_loop`` with static shapes, so entire optimizer runs
  stay on device (reference: the Julia driver loop ``src/algorithm.jl:940``);
* evaluation databases are fixed-capacity HBM arrays with fill counters and
  validity masks (reference: ``src/Databases.jl`` ``ArrayDB``);
* the LP/QP trust-region subproblems (multiobjective steepest descent,
  normal step) are fixed-iteration batched ADMM solves with active-set
  polish, replacing the OSQP C library (reference: ``src/descent.jl:91``);
* RBF Gram/KKT systems are batched dense solves, replacing the external
  ``RadialBasisFunctionModels.jl`` dependency (``src/models/RbfModel.jl:759``);
* ``jax.vmap`` over problem instances / multistart seeds and
  ``jax.sharding`` over TPU meshes turn the small dense algebra into
  TPU-saturating batched GEMMs (reference analogue: ``Threads.@threads``
  benchmark loop, ``examples/large_scale_benchmarks.jl:253``).
"""

from morbit_tpu.core.enums import ITER_TYPE, STOP_CODE, RADIUS_UPDATE
from morbit_tpu.core.config import AlgorithmConfig

__version__ = "0.1.0"

__all__ = [
    "ITER_TYPE",
    "STOP_CODE",
    "RADIUS_UPDATE",
    "AlgorithmConfig",
]


def __getattr__(name):  # lazy exports (importing jax machinery on demand)
    if name in ("MOP", "compile_mop", "CompiledMOP"):
        from morbit_tpu.core import mop
        return getattr(mop, name)
    if name in ("optimize", "initialize_state", "OptimizeResult", "Solver",
                "SolverState"):
        from morbit_tpu.core import algorithm
        return getattr(algorithm, name)
    if name in ("ExactConfig", "RbfConfig", "TaylorConfig", "LagrangeConfig"):
        from morbit_tpu.models import configs
        return getattr(configs, name)
    if name in ("SteepestDescentConfig", "PascolettiSerafiniConfig"):
        from morbit_tpu.core import descent
        return getattr(descent, name)
    if name in ("multistart_optimize", "default_mesh", "build_solver",
                "staged_multistart", "StagedMultistart",
                "compacted_multistart", "CompactedMultistart",
                "parametric_multistart"):
        from morbit_tpu.parallel import multistart
        return getattr(multistart, name)
    raise AttributeError(f"module 'morbit_tpu' has no attribute {name!r}")
