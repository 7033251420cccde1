"""Feature-grid benchmark harness with resume + saving.

Reference: ``examples/large_scale_benchmarks.jl`` + helpers — a settings
table over (problem x n_vars x model x descent x Halton starts), run in
parallel (``Threads.@threads`` there; batched ``vmap`` groups here), with
incremental saving and resume-from-partial
(``fill_from_partial_results!``, ``large_scale_benchmarks.jl:131-134``).
Observations recorded per run: ``n_evals``, final iterate ``x``, final
criticality ``omega``, iterations, stop code
(``large_scale_benchmarks.jl:124,239-241``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.core.descent import PascolettiSerafiniConfig
from morbit_tpu.models.configs import LagrangeConfig, RbfConfig, TaylorConfig
from morbit_tpu.parallel.multistart import build_solver
from morbit_tpu.problems.synthetic import (
    halton_starts,
    make_dtlz,
    make_two_parabolas,
    make_zdt,
)

# model grid of the reference benchmarks (``large_scale_benchmarks.jl:69-118``)
MODEL_CFGS = {
    "rbf_cubic": lambda: RbfConfig(kernel="cubic"),
    "rbf_multiquadric": lambda: RbfConfig(kernel="multiquadric"),
    "taylor1": lambda: TaylorConfig(degree=1, mode="fd"),
    "taylor2": lambda: TaylorConfig(degree=2, mode="fd"),
    "lagrange1": lambda: LagrangeConfig(degree=1),
    "lagrange2": lambda: LagrangeConfig(degree=2),
    "exact": lambda: None,
}

DESCENTS = {
    "steepest_descent": "steepest_descent",
    # reference-default PS budgets (``_ps_max_evals``: 500*(n+1) global-only,
    # ``descent.jl:414-432``) — round-4 budget-parity change
    "ps": lambda: PascolettiSerafiniConfig(),
    # repo-native cheap PS variant (round-2/3 artifact rows used this class
    # of override)
    "ps_small": lambda: PascolettiSerafiniConfig(n_samples=128,
                                                 polish_iters=25),
}


def make_problem(name: str, n_vars: int, model: str):
    cfg = MODEL_CFGS[model]()
    if name.startswith("zdt"):
        return make_zdt(name, n_vars, model_cfg=cfg)
    if name.startswith("dtlz"):
        return make_dtlz(int(name[4:]), n_vars, M=2, model_cfg=cfg)
    if name == "two_parabolas":
        assert n_vars == 2
        return make_two_parabolas(model_cfg=cfg, lb=[-4.0, -4.0], ub=[4.0, 4.0])
    raise ValueError(f"unknown problem {name!r}")


@dataclasses.dataclass(frozen=True)
class Setting:
    """One row group of the settings table (shared solver, many starts)."""

    problem: str
    n_vars: int
    model: str
    descent: str
    n_starts: int

    @property
    def key(self) -> str:
        return f"{self.problem}-n{self.n_vars}-{self.model}-{self.descent}-s{self.n_starts}"


def generate_all_settings(
    problems: Sequence[str] = ("zdt1", "zdt2", "zdt3"),
    n_vars_list: Sequence[int] = (2, 5, 10),
    models: Sequence[str] = ("rbf_cubic", "taylor1", "lagrange1", "lagrange2"),
    descents: Sequence[str] = ("steepest_descent",),
    n_starts: int = 8,
):
    """Cartesian settings grid (``generate_all_settings`` analogue)."""
    out = []
    for p in problems:
        for n in n_vars_list:
            for m in models:
                for d in descents:
                    out.append(Setting(p, n, m, d, n_starts))
    return out


def _default_config(setting: Setting, **overrides) -> AlgorithmConfig:
    """Reference benchmark defaults (``large_scale_benchmarks.jl:181,203-210``):
    max_evals = 1000*n_vars, max_iter = 100, delta_0 = 0.1, delta_max = 0.5,
    tolerances 1e-3."""
    kw = dict(
        max_evals=1000 * setting.n_vars,
        max_iter=100,
        delta_0=0.1,
        delta_max=0.5,
        f_tol_rel=1e-3,
        x_tol_rel=1e-3,
        descent_method=(DESCENTS[setting.descent]()
                        if callable(DESCENTS[setting.descent])
                        else DESCENTS[setting.descent]),
    )
    kw.update(overrides)
    return AlgorithmConfig(**kw)


def perform_test(setting: Setting, dtype=jnp.float32, mesh=None,
                 steady_state: bool = False, staged: bool = False,
                 **cfg_overrides):
    """Run one settings group: multistart over Halton starting points.

    Returns a dict of observation arrays (one row per start). ``wall_s``
    includes the jit compile (it is the first call); with
    ``steady_state=True`` a second call on a DISTINCT start batch of the
    same shape is timed separately (``steady_state_s`` /
    ``steady_runs_per_sec``) — repeat-identical calls would hit the device
    result cache and lie (CLAUDE.md perf notes), so fresh starts are used.
    ``staged=True`` runs the staged-capacity ``StagedMultistart`` runner
    (bit-exact vs the plain vmapped solve; the round-3/4 production
    configuration)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mop = make_problem(setting.problem, setting.n_vars, setting.model)
    ac = _default_config(setting, **cfg_overrides)
    n_s = setting.n_starts
    x0_all = halton_starts(n_s * (2 if steady_state else 1), mop.lb, mop.ub)

    x0_all = jnp.asarray(x0_all, dtype)
    if staged:
        from morbit_tpu.parallel.multistart import StagedMultistart

        runner = StagedMultistart(mop, ac, dtype)
        run = jax.jit(lambda xb: runner._run_impl(xb))
        if mesh is not None:
            sh = NamedSharding(mesh, P("batch", None))
            x0_all = jax.device_put(x0_all, sh)
    elif mesh is not None:
        solver = build_solver(mop, ac, dtype)
        run = jax.vmap(solver.solve)
        sh = NamedSharding(mesh, P("batch", None))
        run = jax.jit(run, in_shardings=(sh,))
        x0_all = jax.device_put(x0_all, sh)
    else:
        solver = build_solver(mop, ac, dtype)
        run = jax.jit(jax.vmap(solver.solve))

    t0 = time.perf_counter()
    res = run(x0_all[:n_s])
    jax.block_until_ready(res.x)
    wall = time.perf_counter() - t0

    steady = None
    if steady_state:
        t0 = time.perf_counter()
        res2 = run(x0_all[n_s:])
        jax.block_until_ready(res2.x)
        steady = time.perf_counter() - t0

    traj = res.state.traj
    counts = np.asarray(traj.count)
    last = np.clip(counts - 1, 0, traj.omega.shape[1] - 1)
    omega_final = np.asarray(traj.omega)[np.arange(len(counts)), last]
    out = {
        "x": np.asarray(res.x),
        "fx": np.asarray(res.fx),
        "n_evals": np.asarray(res.n_evals),
        "n_iterations": np.asarray(res.n_iterations),
        "stop_code": np.asarray(res.stop_code),
        "omega": omega_final,
        "wall_s": wall,
    }
    if steady is not None:
        out["steady_state_s"] = steady
        out["steady_runs_per_sec"] = round(n_s / steady, 3)
        out["compile_s_approx"] = round(wall - steady, 3)
    return out


def run_benchmarks(settings, save_path: Optional[str] = None, resume: bool = True,
                   dtype=jnp.float32, mesh=None, verbose: bool = True,
                   steady_state: bool = False, staged: bool = False,
                   **cfg_overrides):
    """Run all settings groups with incremental JSON saving and resume."""
    results = {}
    if save_path and resume and os.path.exists(save_path):
        with open(save_path) as f:
            results = json.load(f)
        if verbose:
            print(f"resumed {len(results)} finished settings from {save_path}")

    for s in settings:
        if s.key in results:
            continue
        try:
            obs = perform_test(s, dtype=dtype, mesh=mesh,
                               steady_state=steady_state, staged=staged,
                               **cfg_overrides)
            results[s.key] = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                              for k, v in obs.items()}
            if verbose:
                print(f"{s.key}: evals={obs['n_evals'].tolist()} "
                      f"wall={obs['wall_s']:.2f}s")
        except Exception as e:  # keep going like the reference's try/catch
            results[s.key] = {"error": repr(e)}
            if verbose:
                print(f"{s.key}: ERROR {e!r}")
        if save_path:
            with open(save_path, "w") as f:
                json.dump(results, f)
    return results
