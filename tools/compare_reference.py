"""One-command Julia-reference parity check (round-4 VERDICT item 8).

The day a Julia runtime is available, run the exporter there and this
comparator here:

    julia tools/export_reference_trajectory.jl 2 ref2.json   # on the Julia box
    python tools/compare_reference.py ref2.json              # here

The exported document carries its own ``config`` key ("1".."4" | "ps" —
see ``tools/export_reference_trajectory.jl``); this script rebuilds the
matching morbit_tpu problem, runs the float64 solve with the SAME
algorithm settings, and prints the ``utils.parity`` comparison verdict
(iterates <= 1e-8, identical it_stat classifications, equal eval counts —
the BASELINE.json bar). Exit code 0 on parity, 1 otherwise.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.mop import MOP
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.problems.synthetic import make_zdt
from morbit_tpu.utils.parity import compare_trajectories, export_trajectory

X0_2D = [-3.141592653589793, 2.71828]


def build_config(config: str):
    """Mirror of the scenario table in export_reference_trajectory.jl.
    Returns (mop, x0, optimize kwargs)."""
    f1 = lambda x: jnp.sum((x - 1.0) ** 2)
    f2 = lambda x: jnp.sum((x + 1.0) ** 2)
    if config == "1":
        mop = MOP(2)
        mop.add_exact_objective(f1)
        mop.add_exact_objective(f2)
        return mop, X0_2D, dict(max_iter=20)
    if config == "2":
        mop = MOP(2)
        cfg = RbfConfig(kernel="multiquadric")
        mop.add_objective(f1, model_cfg=cfg)
        mop.add_objective(f2, model_cfg=cfg)
        return mop, X0_2D, dict(max_iter=15)
    if config == "3":
        n = 10
        mop = make_zdt("zdt1", n, model_cfg=RbfConfig(kernel="cubic"))
        return (mop, np.linspace(0.15, 0.85, n),
                dict(max_iter=20, f_tol_rel=1e-6, x_tol_rel=1e-6))
    if config == "4":
        mop = MOP([-4.0, -4.0], [4.0, 4.0])
        mop.add_exact_objective(f1)
        mop.add_exact_objective(f2)
        mop.add_ineq_constraint([[1.0, 1.0]], [1.0])
        mop.add_nl_ineq_constraint(lambda x: jnp.sum(x ** 2) - 2.25)
        return mop, [-3.0, 2.5], dict(max_iter=25)
    if config == "ps":
        from morbit_tpu.core.descent import PascolettiSerafiniConfig

        mop = MOP([-4.0, -4.0], [4.0, 4.0])
        mop.add_exact_objective(f1)
        mop.add_exact_objective(f2)
        return mop, [-3.0, 2.5], dict(
            max_iter=8,
            descent_method=PascolettiSerafiniConfig(
                reference_direction=(1.0, 1.0)))
    raise SystemExit(f"unknown config {config!r} in exported document")


def compare_file(path: str, x_tol: float = 1e-8) -> dict:
    """Run our solve for the document's config and compare trajectories."""
    with open(path) as f:
        ref = json.load(f)
    from morbit_tpu.core.algorithm import optimize

    mop, x0, kwargs = build_config(str(ref.get("config", "1")))
    res = optimize(mop, jnp.asarray(x0, jnp.float64), dtype=jnp.float64,
                   **kwargs)
    ours = export_trajectory(res)
    rep = compare_trajectories(ours, ref, x_tol=x_tol)
    rep["config"] = str(ref.get("config"))
    return rep


def main():
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    rep = compare_file(sys.argv[1])
    print(json.dumps(rep, indent=2))
    sys.exit(0 if rep["parity"] else 1)


if __name__ == "__main__":
    main()
