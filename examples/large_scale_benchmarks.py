"""Feature-grid benchmarks — ``examples/large_scale_benchmarks.jl`` analogue.

Runs the (problem x n_vars x model x descent) grid with Halton multistarts,
incremental saving and resume. On TPU the per-setting multistart batch runs
as one vmapped program; across a pod slice, pass a mesh to shard the batch.

Run: python examples/large_scale_benchmarks.py [save.json]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from morbit_tpu.parallel.benchmarks import generate_all_settings, run_benchmarks

save_path = sys.argv[1] if len(sys.argv) > 1 else "benchmark_results.json"

settings = generate_all_settings(
    problems=("zdt1", "zdt2", "zdt3", "dtlz1", "dtlz6"),
    n_vars_list=(2, 5, 10, 15),
    models=("rbf_cubic", "taylor1", "lagrange1", "lagrange2"),
    descents=("steepest_descent", "ps"),
    n_starts=8,
)
print(f"{len(settings)} settings groups")
run_benchmarks(settings, save_path=save_path, resume=True)
