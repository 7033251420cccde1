"""Host-side run reporting.

The reference installs a ConsoleLogger with four custom log levels
(``src/custom_logging.jl:18-66``) and prints per-iteration banners and a
final report (``algorithm.jl:651-659``, ``:890-897``, ``_fin_info_str``
``:114-129``). Inside a jitted while-loop there is no iteration-time host
printing; instead every iteration stamps the full ``IterSaveable`` record
into the trajectory ring buffer, and these helpers render the same
information after the run.
"""

from __future__ import annotations

import numpy as np

from morbit_tpu.core.enums import ITER_TYPE, STOP_CODE


def _fmt_vec(v, n=5):
    v = np.asarray(v).ravel()
    body = ", ".join(f"{x:.5f}" for x in v[:n])
    return "[" + body + (", …" if v.size > n else "") + "]"


def print_report(result, verbosity: int = 1, out=print):
    """Final report (+ per-iteration lines at verbosity >= 2)."""
    traj = result.state.traj
    count = int(traj.count)
    if verbosity >= 2:
        for i in range(count):
            stat = ITER_TYPE(int(traj.it_stat[i])).name
            out(f"| iter {i:3d}  {stat:<14s} x={_fmt_vec(traj.x[i])} "
                f"Δ={float(traj.delta[i]):.3e} ω={float(traj.omega[i]):.3e} "
                f"ρ={float(traj.rho[i]):.3e} "
                f"‖s‖={float(traj.steplength[i]):.3e}")
    code = STOP_CODE(int(result.stop_code)).name
    out("|--------------------------------------------")
    out(f"| FINISHED ({code})")
    out("|--------------------------------------------")
    out(f"| Stopped in iteration:  {int(result.n_iterations)}")
    out(f"| No. evaluations: {int(result.n_evals)}")
    out("| final unscaled vectors:")
    out(f"| iterate: {_fmt_vec(result.x, 10)}")
    out(f"| value:   {_fmt_vec(result.fx, 10)}")
    for line in overflow_warnings(result.state):
        out(f"| WARNING: {line}")


def overflow_warnings(state):
    """Capacity-overflow warnings for a solver state (empty list if none).

    The reference's ``ArrayDB`` and filter are unbounded; the fixed-capacity
    TPU buffers raise sticky overflow flags instead of silently dropping
    writes (``Database.overflow``, ``FilterState.overflow``)."""
    import numpy as np

    lines = []
    for gi, g in enumerate(state.groups):
        if bool(np.any(np.asarray(g.db.overflow))):
            lines.append(
                f"group {gi} database overflowed its capacity "
                f"({g.db.data.shape[-2]} rows): model training sets are "
                "missing dropped points — raise db_capacity / use the "
                "auto heuristic")
    if bool(np.any(np.asarray(state.filter.overflow))):
        lines.append(
            f"filter overflowed its capacity "
            f"({state.filter.theta.shape[-1]} rows): acceptability tests "
            "are weaker than the reference's unbounded filter — raise "
            "filter_capacity / use the auto (max_iter + 2) default")
    return lines


def trajectory_arrays(result):
    """Trimmed (count,) trajectory arrays for plotting/analysis — the
    analogue of reading ``db.iter_data``
    (``examples/example_two_parabolas.jl:76``)."""
    traj = result.state.traj
    c = int(traj.count)
    return {
        "x": np.asarray(traj.x[:c]),
        "fx": np.asarray(traj.fx[:c]),
        "delta": np.asarray(traj.delta[:c]),
        "rho": np.asarray(traj.rho[:c]),
        "omega": np.asarray(traj.omega[:c]),
        "steplength": np.asarray(traj.steplength[:c]),
        "it_stat": np.asarray(traj.it_stat[:c]),
        # per-group database row of each stamped iterate — the reference's
        # model-provenance hook (``x_indices``, ``IterDataIterSaveable.jl:189-205``)
        "x_indices": np.asarray(traj.x_indices[:c]),
    }


def function_eval_counts(result, cmop):
    """Per-FUNCTION true-evaluation counters — the ``CountedFunc`` view
    (``src/globals.jl:74-112``, ``num_evals!``).

    Evaluation happens per group (one vector call covers every member), so
    each member function's call count equals its group's counter — exactly
    as the reference's per-function counters land when functions are
    evaluated together; duplicate registrations (RefVecFun shares) report
    the shared counter. Returns a list indexed like ``mop.functions``.
    """
    groups = result.state.groups if hasattr(result, "state") else result
    counts = {}
    for g in cmop.groups:
        n = int(groups[g.index].n_evals)
        for mb in g.members:
            counts[mb.fn_index] = n
    n_fns = max(counts, default=-1) + 1
    return [counts.get(i, 0) for i in range(n_fns)]
