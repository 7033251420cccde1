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


def test_reference_comparator_round_trip(tmp_path):
    """One-command comparator round trip (tools/compare_reference.py):
    a synthetic 'exported' document in the Julia exporter's format — built
    by running OUR solver on the same scenario the exporter encodes — must
    come back with parity=True, and a perturbed one with parity=False."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "compare_reference",
        pathlib.Path(__file__).resolve().parent.parent
        / "tools" / "compare_reference.py")
    cr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cr)

    mop, x0, kwargs = cr.build_config("1")
    res = optimize(mop, jnp.asarray(x0, jnp.float64), dtype=jnp.float64,
                   **kwargs)
    doc = export_trajectory(res)
    # the Julia exporter's extra keys (kept for humans, ignored on compare)
    doc["config"] = "1"
    doc["stop_code"] = "TOLERANCE"
    path = tmp_path / "ref1.json"
    path.write_text(json.dumps(doc))

    rep = cr.compare_file(str(path))
    assert rep["parity"] and rep["max_x_err"] == 0.0

    doc["iterates"][1][0] += 1e-6
    path.write_text(json.dumps(doc))
    rep2 = cr.compare_file(str(path))
    assert not rep2["parity"] and rep2["max_x_err"] > 1e-8


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
