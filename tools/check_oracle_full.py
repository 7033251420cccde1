"""Smoke harness for the full-scope oracle (tests/oracle_full.py).

Runs one labeled config on both sides and prints a field-by-field diff.
Usage: python tools/check_oracle_full.py [label ...]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.mop import MOP
from morbit_tpu.utils.logging import trajectory_arrays
from tests.oracle_full import GroupSpec, solve_oracle_full


def two_parabolas_np():
    F = lambda x: np.array([np.sum((x - 1.0) ** 2), np.sum((x + 1.0) ** 2)])
    J = lambda x: np.stack([2.0 * (x - 1.0), 2.0 * (x + 1.0)])
    return F, J


def build(label):
    from morbit_tpu.models.configs import ExactConfig, RbfConfig, TaylorConfig

    lb, ub = [-4.0, -4.0], [4.0, 4.0]
    F, J = two_parabolas_np()
    x0 = np.array([-3.0, 2.5])
    kw = dict(max_iter=12)
    ospec = dict()

    if label.startswith("rbf"):
        kernel = {"rbf-mq": "multiquadric", "rbf-cubic": "cubic",
                  "rbf-gauss": "gaussian"}.get(label.split("+")[0], "multiquadric")
        cfg = RbfConfig(kernel=kernel, max_model_points=3)
        mop = MOP(lb, ub)
        mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
        mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
        groups = [GroupSpec(role="obj", m=2, F=F, J=J, kind="rbf",
                            kernel=kernel)]
        if "critical" in label:
            kw.update(max_iter=30, f_tol_rel=0.0, x_tol_rel=0.0)
    elif label.startswith("taylor"):
        deg = 2 if "2" in label else 1
        cfg = TaylorConfig(degree=deg, mode="fd")
        mop = MOP(lb, ub)
        mop.add_objective(lambda x: jnp.sum((x - 1.0) ** 2), model_cfg=cfg)
        mop.add_objective(lambda x: jnp.sum((x + 1.0) ** 2), model_cfg=cfg)
        groups = [GroupSpec(role="obj", m=2, F=F, J=J, kind="taylor",
                            taylor_degree=deg)]
    elif label.startswith("nl"):
        mop = MOP(lb, ub)
        mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
        mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
        mop.add_nl_ineq_constraint(lambda x: jnp.sum(x ** 2) - 2.25,
                                   model_cfg=ExactConfig())
        F1 = lambda x: np.array([np.sum((x - 1.0) ** 2)])
        J1 = lambda x: (2.0 * (x - 1.0))[None, :]
        F2 = lambda x: np.array([np.sum((x + 1.0) ** 2)])
        J2 = lambda x: (2.0 * (x + 1.0))[None, :]
        Fc = lambda x: np.array([np.sum(x ** 2) - 2.25])
        Jc = lambda x: (2.0 * x)[None, :]
        groups = [GroupSpec(role="obj", m=1, F=F1, J=J1),
                  GroupSpec(role="obj", m=1, F=F2, J=J2),
                  GroupSpec(role="nl_ineq", m=1, F=Fc, J=Jc)]
        kw.update(max_iter=25)
        if "rest" in label:
            kw.update(delta_0=0.01)
    elif label.startswith("ps"):
        mop = MOP(lb, ub)
        mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
        mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
        F1 = lambda x: np.array([np.sum((x - 1.0) ** 2)])
        J1 = lambda x: (2.0 * (x - 1.0))[None, :]
        F2 = lambda x: np.array([np.sum((x + 1.0) ** 2)])
        J2 = lambda x: (2.0 * (x + 1.0))[None, :]
        groups = [GroupSpec(role="obj", m=1, F=F1, J=J1),
                  GroupSpec(role="obj", m=1, F=F2, J=J2)]
        from morbit_tpu.core.descent import PascolettiSerafiniConfig

        kw.update(max_iter=8,
                  descent_method=PascolettiSerafiniConfig(
                      reference_direction=(1.0, 1.0)))
        ospec.update(descent="ps", ps_reference_direction=(1.0, 1.0))
    else:
        raise SystemExit(f"unknown label {label}")
    return mop, groups, lb, ub, x0, kw, ospec


def run(label):
    mop, groups, lb, ub, x0, kw, ospec = build(label)
    okw = dict(kw)
    okw.pop("descent_method", None)
    res = optimize(mop, jnp.asarray(x0), dtype=jnp.float64, **kw)
    tr = trajectory_arrays(res)
    orc = solve_oracle_full(lb, ub, groups, x0, **okw, **ospec)

    print(f"== {label}")
    print("stop:", int(res.stop_code), orc.stop_code,
          " iters:", int(res.n_iterations), orc.n_iterations)
    print("evals:", [int(g.n_evals) for g in res.state.groups],
          orc.group_evals)
    it_repo = tr["it_stat"].astype(int).tolist()
    print("it_stat repo :", it_repo)
    print("it_stat oracle:", orc.traj_it_stat)
    xi_repo = tr["x_indices"].astype(int).tolist()
    print("x_idx repo :", xi_repo)
    print("x_idx oracle:", orc.traj_x_index)
    for name in ("x", "fx", "delta", "rho", "omega", "steplength"):
        a = np.asarray(tr[name], float)
        b = np.asarray(getattr(orc, "traj_" + name), float)
        if a.shape != b.shape:
            print(f"{name}: SHAPE {a.shape} vs {b.shape}")
            continue
        fin = np.isfinite(a) & np.isfinite(b)
        err = float(np.max(np.abs(a[fin] - b[fin]), initial=0.0))
        inf_mismatch = int(np.sum(np.isfinite(a) != np.isfinite(b)))
        print(f"{name}: max|err|={err:.3e} nonfinite-mismatch={inf_mismatch}")


if __name__ == "__main__":
    labels = sys.argv[1:] or ["rbf-mq"]
    for lab in labels:
        run(lab)
