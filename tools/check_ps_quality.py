"""PS front-quality evidence run (round-4 VERDICT weak item 3).

The slack PS locks in tests/test_zdt_quality.py rest on the docstring
claim "PS stops on the 1e-3 tolerance well before the front". This
measures it: PS+RBF on ZDT1 at (a) the locked config (tolerances 1e-3,
max_iter=25), (b) tolerances OFF at the same iteration budget, and
(c) tolerances off at a deeper budget — if the front error improves
materially toward the steepest-descent level as budget grows, the PS step
is healthy and the locks can be tightened to the measurement; if not,
there is a bug to find.

CPU float64 (test conditions).  Usage: python tools/check_ps_quality.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.descent import PascolettiSerafiniConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import multistart_optimize
from morbit_tpu.problems.synthetic import halton_starts, make_zdt, zdt_front
from morbit_tpu.utils.compile_cache import enable_persistent_cache


def front_err(name, fx):
    front = zdt_front(name)
    d = np.linalg.norm(fx[:, None, :] - front[None, :, :], axis=2)
    return d.min(axis=1)


def run(name="zdt1", n_starts=8, **ac_kw):
    mop = make_zdt(name, 5, model_cfg=RbfConfig(kernel="cubic"))
    ac = AlgorithmConfig(max_evals=1000 * 5,
                         descent_method=PascolettiSerafiniConfig(), **ac_kw)
    res = multistart_optimize(mop, halton_starts(n_starts, mop.lb, mop.ub),
                              ac, dtype=jnp.float64)
    fe = front_err(name, np.asarray(res.fx))
    ev = np.asarray(res.n_evals)
    return {
        "config": ac_kw,
        "front_err_min": round(float(fe.min()), 4),
        "front_err_med": round(float(np.median(fe)), 4),
        "front_err_max": round(float(fe.max()), 4),
        "evals_min": int(ev.min()), "evals_med": float(np.median(ev)),
        "evals_max": int(ev.max()),
    }


def main():
    enable_persistent_cache()
    for kw in (
        dict(max_iter=25, f_tol_rel=1e-3, x_tol_rel=1e-3),  # the locked cfg
        dict(max_iter=25, f_tol_rel=0.0, x_tol_rel=0.0),
        dict(max_iter=60, f_tol_rel=0.0, x_tol_rel=0.0),
    ):
        print(json.dumps(run(**kw)), flush=True)


if __name__ == "__main__":
    main()
