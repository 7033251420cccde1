"""Parity harness self-tests: export format + comparator semantics.

(The actual Julia-reference comparison needs a Julia runtime — the exporter
script is ``tools/export_reference_trajectory.jl``.)
"""

import json

import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.algorithm import optimize
from morbit_tpu.core.mop import MOP
from morbit_tpu.utils.parity import compare_trajectories, export_trajectory


def _run():
    mop = MOP(2)
    mop.add_exact_objective(lambda x: jnp.sum((x - 1.0) ** 2))
    mop.add_exact_objective(lambda x: jnp.sum((x + 1.0) ** 2))
    return optimize(mop, jnp.array([-3.0, 2.5]), max_iter=8)


def test_export_and_self_parity(tmp_path):
    res = _run()
    path = str(tmp_path / "traj.json")
    doc = export_trajectory(res, path)
    with open(path) as f:
        loaded = json.load(f)
    rep = compare_trajectories(doc, loaded)
    assert rep["parity"]
    assert rep["max_x_err"] == 0.0


def test_comparator_detects_divergence():
    res = _run()
    doc = export_trajectory(res)
    other = json.loads(json.dumps(doc))
    other["iterates"][2][0] += 1e-4
    rep = compare_trajectories(doc, other)
    assert not rep["parity"]
    assert rep["max_x_err"] > 1e-8

    other2 = json.loads(json.dumps(doc))
    other2["it_stat"][1] = "FILTER_FAIL"
    rep2 = compare_trajectories(doc, other2)
    assert rep2["stat_mismatches"] == [1]
    assert not rep2["parity"]
