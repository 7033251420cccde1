"""Exact "surrogate": forwards to the true function.

Reference: ``src/models/ExactModel.jl:22-119``. Evaluation at a scaled site
untransforms and calls the true function (counting budget — the reference
wraps it in a ``CountedFunc``); the Jacobian applies the unscaling chain rule
``Jf(x) @ J_unscale`` with user-callback or autodiff derivatives. Always
fully linear.
"""

from __future__ import annotations

import jax.numpy as jnp

from morbit_tpu.core import scaling
from morbit_tpu.models.base import SurrogateOps


class ExactOps(SurrogateOps):
    counts_on_eval = True

    def init_state(self):
        return ()

    def eval(self, state, x_s, scal=None):
        scal = scal if scal is not None else self.scal
        x = scaling.untransform(scal, x_s)
        return self.group.eval_unscaled(x)

    def jac(self, state, x_s, scal=None):
        scal = scal if scal is not None else self.scal
        x = scaling.untransform(scal, x_s)
        J = self.group.jac_unscaled(x)           # (m, n) wrt unscaled x
        return J / scal.scale[None, :]           # chain rule: d(untransform) = diag(1/scale)

    def fully_linear(self, state):
        return jnp.asarray(True)
