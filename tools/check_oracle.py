"""Quick probe: sequential SciPy oracle vs the jitted solver (f64 CPU)."""
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

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
from oracle_sequential import solve_oracle


def two_parabolas():
    mop = MOP([-4.0, -4.0], [4.0, 4.0])
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    F = lambda x: np.array([np.sum((x - 1.0) ** 2), np.sum((x + 1.0) ** 2)])
    J = lambda x: np.stack([2.0 * (x - 1.0), 2.0 * (x + 1.0)])
    return mop, F, J, np.array([-4.0, -4.0]), np.array([4.0, 4.0])


def main():
    mop, F, J, lb, ub = two_parabolas()
    x0 = np.array([-3.0, 2.5])
    kw = dict(max_iter=10)
    res = optimize(mop, jnp.asarray(x0), dtype=jnp.float64, **kw)
    tr = trajectory_arrays(res)
    orc = solve_oracle(F, J, lb, ub, x0, **kw)

    print("solver: stop", int(res.stop_code), "iters", int(res.n_iterations),
          "evals", int(res.n_evals))
    print("oracle: stop", orc.stop_code, "iters", orc.n_iterations,
          "evals", orc.n_evals)
    print("stamps solver", len(tr["x"]), "oracle", len(orc.traj_x))
    print("it_stat solver", tr["it_stat"].astype(int).tolist())
    print("it_stat oracle", orc.traj_it_stat)
    k = min(len(tr["x"]), len(orc.traj_x))
    for name, a, b in [
        ("x", tr["x"][:k], np.array(orc.traj_x[:k])),
        ("fx", tr["fx"][:k], np.array(orc.traj_fx[:k])),
        ("delta", tr["delta"][:k], np.array(orc.traj_delta[:k])),
        ("rho", tr["rho"][:k], np.array(orc.traj_rho[:k])),
        ("omega", tr["omega"][:k], np.array(orc.traj_omega[:k])),
        ("steplength", tr["steplength"][:k], np.array(orc.traj_steplength[:k])),
    ]:
        fin = np.isfinite(a) & np.isfinite(b)
        err = np.max(np.abs(a - b), initial=0.0, where=fin)
        inf_mismatch = np.any(np.isfinite(a) != np.isfinite(b))
        print(f"{name:10s} max|err|={err:.3e} inf_mismatch={inf_mismatch}")
    print("x_idx solver", tr["x_indices"][:k].ravel().astype(int).tolist())
    print("x_idx oracle", orc.traj_x_index[:k])




def probe(mop, F, J, lb, ub, x0, label, **kw):
    res = optimize(mop, jnp.asarray(x0), dtype=jnp.float64, **kw)
    tr = trajectory_arrays(res)
    orc = solve_oracle(F, J, lb, ub, x0, **kw)
    g_evals = [int(st.n_evals) for st in res.state.groups]
    k = min(len(tr["x"]), len(orc.traj_x))
    errs = {}
    for name, a, b in [
        ("x", tr["x"][:k], np.array(orc.traj_x[:k])),
        ("delta", tr["delta"][:k], np.array(orc.traj_delta[:k])),
        ("omega", tr["omega"][:k], np.array(orc.traj_omega[:k])),
    ]:
        fin = np.isfinite(a) & np.isfinite(b)
        errs[name] = float(np.max(np.abs(np.where(fin, a, 0) - np.where(fin, b, 0)), initial=0.0))
    print(f"[{label}] solver stop={int(res.stop_code)} it={int(res.n_iterations)} "
          f"gev={g_evals} | oracle stop={orc.stop_code} it={orc.n_iterations} "
          f"ev={orc.n_evals} | stamps {len(tr['x'])}/{len(orc.traj_x)} "
          f"it_stat_eq={tr['it_stat'].astype(int).tolist() == orc.traj_it_stat} errs={errs}")


def three_var():
    mop = MOP([-2.0, -2.0, -2.0], [3.0, 3.0, 3.0])
    mop.add_exact_objective(
        lambda x: (x[0] - 1.0) ** 2 + 2.0 * x[1] ** 2 + 0.5 * x[2] ** 2)
    mop.add_exact_objective(
        lambda x: (x[0] + 1.0) ** 2 + (x[1] - 0.5) ** 2 + x[2] ** 2
        + 0.1 * x[0] * x[1])
    F = lambda x: np.array([
        (x[0] - 1.0) ** 2 + 2.0 * x[1] ** 2 + 0.5 * x[2] ** 2,
        (x[0] + 1.0) ** 2 + (x[1] - 0.5) ** 2 + x[2] ** 2 + 0.1 * x[0] * x[1]])
    J = lambda x: np.array([
        [2.0 * (x[0] - 1.0), 4.0 * x[1], 1.0 * x[2]],
        [2.0 * (x[0] + 1.0) + 0.1 * x[1], 2.0 * (x[1] - 0.5) + 0.1 * x[0],
         2.0 * x[2]]])
    return mop, F, J, np.array([-2.0, -2.0, -2.0]), np.array([3.0, 3.0, 3.0])


def more():
    mop, F, J, lb, ub = two_parabolas()
    probe(mop, F, J, lb, ub, np.array([-3.0, 2.5]), "crit",
          max_iter=40, f_tol_rel=0.0, x_tol_rel=0.0)
    mop, F, J, lb, ub = two_parabolas()
    probe(mop, F, J, lb, ub, np.array([-3.0, 2.5]), "budget",
          max_iter=40, max_evals=25)
    mop, F, J, lb, ub = three_var()
    probe(mop, F, J, lb, ub, np.array([2.0, -1.5, 2.5]), "3var", max_iter=12)
    mop, F, J, lb, ub = three_var()
    probe(mop, F, J, lb, ub, np.array([2.0, -1.5, 2.5]), "3var-crit",
          max_iter=60, f_tol_rel=0.0, x_tol_rel=0.0)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        more()
        sys.exit(0)
    main()
