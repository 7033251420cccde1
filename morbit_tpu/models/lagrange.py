"""Lagrange interpolation surrogates (degree 1/2) — placeholder.

Reference: ``src/models/LagrangeModel.jl`` (poised set via Conn et al.
Algorithm 6.2, Lambda-poisedness via Algorithm 6.3). Full implementation
lands after the end-to-end slice; see SURVEY.md §7 step 9.
"""

from __future__ import annotations

from morbit_tpu.models.base import SurrogateOps


class LagrangeOps(SurrogateOps):
    def __init__(self, group, n_vars, dtype, ac, scal):
        raise NotImplementedError(
            "LagrangeConfig surrogates are not implemented yet")
