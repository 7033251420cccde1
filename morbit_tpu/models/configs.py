"""Surrogate model configurations (static dataclasses).

One config type per model family of the reference:

* :class:`ExactConfig`   — ``src/models/ExactModel.jl:22-119``
* :class:`RbfConfig`     — ``src/models/RbfModel.jl:58-112``
* :class:`TaylorConfig`  — ``src/models/TaylorModel.jl:70-117`` (both the
  finite-difference and the callback/autodiff flavor, selected by ``mode``)
* :class:`LagrangeConfig`— ``src/models/LagrangeModel.jl``

Configs are hashable static metadata: two functions with equal combinable
configs are fitted as one vector model (``do_groupings``,
``SurrogateContainer.jl:2-46``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Union

from morbit_tpu.ops.rbf import RBF_KERNELS


@dataclasses.dataclass(frozen=True)
class ExactConfig:
    """No surrogate: forward evals/Jacobians to the true function.

    Gradients come from user callbacks if provided on the function, else
    ``jax.jacfwd`` (the ``AutoDiffWrapper`` analogue, ``src/DiffFn.jl:56``).
    """

    max_evals: int = 2 ** 31 - 1

    @property
    def combinable(self) -> bool:
        return False


@dataclasses.dataclass(frozen=True)
class RbfConfig:
    """RBF surrogate configuration (``src/models/RbfModel.jl:66-112``)."""

    kernel: str = "cubic"
    # float, or a callable Delta -> shape parameter (the reference's
    # "string containing Δ" feature, ``RbfModel.jl:135-143``); NaN -> kernel default
    shape_parameter: Union[float, Callable] = math.nan
    polynomial_degree: int = 1
    theta_enlarge_1: float = 2.0
    theta_enlarge_2: float = 2.0
    theta_pivot: float = 0.25  # default 1/(2*theta_enlarge_1)
    theta_pivot_cholesky: float = 1e-7
    # declared-but-unread in the reference too (``RbfModel.jl:89`` is its only
    # occurrence there); kept for config-surface parity, intentionally a no-op
    require_linear: bool = True
    max_model_points: int = -1   # -1 -> (n+1)(n+2)/2
    use_max_points: bool = False
    optimized_sampling: bool = True
    max_evals: int = 2 ** 31 - 1

    def __post_init__(self):
        assert self.kernel in RBF_KERNELS, f"kernel must be one of {RBF_KERNELS}"
        assert self.theta_enlarge_1 >= 1 and self.theta_enlarge_2 >= 1
        assert self.theta_enlarge_1 * self.theta_pivot <= 1 + 1e-12

    @property
    def combinable(self) -> bool:
        return True

    def signature(self):
        """Geometry signature for cross-group meta reuse
        (``RbfModel.jl:114``)."""
        return (self.theta_pivot, self.theta_enlarge_1, self.theta_enlarge_2,
                self.optimized_sampling)

    def resolved_max_points(self, n_vars: int) -> int:
        if self.max_model_points > 0:
            return max(self.max_model_points, 1)
        return (n_vars + 1) * (n_vars + 2) // 2


@dataclasses.dataclass(frozen=True)
class TaylorConfig:
    """Degree-1/2 Taylor polynomial models (``src/models/TaylorModel.jl``).

    ``mode``:
    * 'fd'       — 2-phase finite differences through the database (the
      recommended ``TaylorConfig`` path, ``TaylorModel.jl:70-93``); stencil
      selected by ``fd_stamp`` ('cfd1'|'ffd1'|'bfd1' first-order schemes,
      flat site grids replacing the reference's recursion trees).
    * 'callback' — user gradient/Hessian callbacks or autodiff
      (``TaylorCallbackConfig``, ``TaylorModel.jl:293-327``).
    """

    degree: int = 2
    mode: str = "fd"
    fd_stamp: str = "cfd1"
    fd_stepsize: float = 0.001  # matches RFD CFDStamp default grid scaling
    # Hessian construction for degree 2: 'compose' = FD-of-FD recursion
    # (the reference's behavior — RecursiveFiniteDifferences builds only
    # order-1 stamps); 'cfd2'/'cfd2_4' = direct second-derivative stamp on
    # the diagonal (extension: tighter stencil, fewer sites)
    hess_stamp: str = "compose"
    max_evals: int = 2 ** 31 - 1

    def __post_init__(self):
        assert 1 <= self.degree <= 2
        assert self.mode in ("fd", "callback")
        from morbit_tpu.models.taylor import STAMPS, STAMPS2
        assert self.fd_stamp in STAMPS
        assert self.hess_stamp == "compose" or self.hess_stamp in STAMPS2

    @property
    def combinable(self) -> bool:
        return self.mode == "fd"

    def resolved_max_points(self, n_vars: int) -> int:
        """Stencil site count — the per-rebuild database working set. Used
        by the database-capacity heuristic (``resolved_db_capacity``); a
        degree-2 FD stencil needs ~2 n^2 sites, far more than the RBF
        ``(n+1)(n+2)/2`` bound the heuristic previously assumed for every
        model family (round-2 review finding: Taylor fits silently
        truncated under ``use_db=False``)."""
        if self.mode != "fd":
            return 1
        from morbit_tpu.models.taylor import _build_stencil
        O, _, _ = _build_stencil(n_vars, self.degree, self.fd_stamp,
                                 self.hess_stamp)
        return int(O.shape[0])


@dataclasses.dataclass(frozen=True)
class LagrangeConfig:
    """Degree-1/2 Lagrange interpolation models (``src/models/LagrangeModel.jl``).

    The poised-set construction follows Conn et al. Algorithms 6.2/6.3; the
    NLopt polynomial maximization is replaced by multistart projected
    gradient ascent on |l_i| over the scaled box (SURVEY.md §7 hard part 4).
    """

    degree: int = 2
    theta_enlarge: float = 2.0
    lambda_poise: float = 1.5
    allow_not_linear: bool = False
    optimized_sampling: bool = True
    max_evals: int = 2 ** 31 - 1
    # multistart ascent controls (the ``algo1/2_max_evals`` analogue of the
    # NLopt replacement, ``LagrangeModel.jl:81-91``): the top
    # ``ascent_restarts`` grid candidates are refined with ``ascent_iters``
    # projected-gradient steps each
    ascent_restarts: int = 8
    ascent_iters: int = 40
    # Cross-process persistence of the static lambda-poised stamp
    # (``optimized_sampling=False``): directory where the stamp is saved and
    # looked up, the ``save_path`` + ``io_lock`` analogue of the reference
    # (``LagrangeModel.jl:77-80,537-573``). ``None`` keeps the in-process
    # cache only. Concurrent writers are safe via atomic tmp-file + rename
    # (replacing the reference's lock).
    save_path: Optional[str] = None

    def __post_init__(self):
        assert 1 <= self.degree <= 2

    @property
    def combinable(self) -> bool:
        return True

    def resolved_max_points(self, n_vars: int) -> int:
        """Poised-set size p — the per-rebuild database working set
        (database-capacity heuristic; see :meth:`TaylorConfig.resolved_max_points`)."""
        if self.degree == 1:
            return n_vars + 1
        return (n_vars + 1) * (n_vars + 2) // 2


SurrogateConfig = Union[ExactConfig, RbfConfig, TaylorConfig, LagrangeConfig]
