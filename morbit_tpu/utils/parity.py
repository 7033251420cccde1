"""Trajectory-parity harness against the Julia reference.

BASELINE.json requires iterate-trajectory parity (<= 1e-8 at float64,
matching acceptance decisions) on the ZDT suite. This module defines the
interchange format and the comparator; ``tools/export_reference_trajectory.jl``
is the matching exporter to run against the Julia reference where a Julia
runtime is available (none exists in this container — see CLAUDE.md).

Format (JSON): ``{"problem": ..., "x0": [...], "config": {...},
"iterates": [[...], ...], "it_stat": ["INITIALIZATION", ...],
"delta": [...], "n_evals": N}``.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from morbit_tpu.core.enums import ITER_TYPE
from morbit_tpu.utils.logging import trajectory_arrays


def export_trajectory(result, path: Optional[str] = None) -> dict:
    """Dump one of our runs in the interchange format."""
    tr = trajectory_arrays(result)
    doc = {
        "iterates": tr["x"].tolist(),
        "delta": tr["delta"].tolist(),
        "it_stat": [ITER_TYPE(int(s)).name for s in tr["it_stat"]],
        "n_evals": int(result.n_evals),
    }
    if path:
        with open(path, "w") as f:
            json.dump(doc, f)
    return doc


def compare_trajectories(ours: dict, reference: dict, x_tol: float = 1e-8):
    """Compare two trajectory documents.

    Returns a dict with ``max_x_err``, ``stat_mismatches``, ``n_evals_delta``
    and a boolean ``parity`` verdict (iterates within x_tol over the common
    prefix, identical iteration classifications, equal eval counts)."""
    a = np.asarray(ours["iterates"], float)
    b = np.asarray(reference["iterates"], float)
    k = min(len(a), len(b))
    max_x_err = float(np.max(np.abs(a[:k] - b[:k]))) if k else 0.0
    stats_a = ours.get("it_stat", [])[:k]
    stats_b = reference.get("it_stat", [])[:k]
    stat_mismatches = [i for i, (s1, s2) in enumerate(zip(stats_a, stats_b))
                       if s1 != s2]
    n_evals_delta = int(ours.get("n_evals", -1)) - int(reference.get("n_evals", -1))
    return {
        "max_x_err": max_x_err,
        "len_ours": len(a),
        "len_reference": len(b),
        "stat_mismatches": stat_mismatches,
        "n_evals_delta": n_evals_delta,
        "parity": (max_x_err <= x_tol and not stat_mismatches
                   and len(a) == len(b) and n_evals_delta == 0),
    }
