"""Round-3 TPU benchmark grid with compile-vs-steady-state split.

Re-runs the round-2 artifact's 15 settings (``benchmarks_tpu_r2.json``)
with ``steady_state=True``: each setting reports the compile+first-run wall
time AND a separately-timed second call on a distinct Halton start batch —
the honest throughput number the round-2 artifact lacked (its ``wall_s``
folded the jit compile into an 8-start batch, useless as a throughput
comparison; round-2 VERDICT weakness #2).

Writes ``benchmarks_tpu_r3.json`` incrementally (resumable).

Run on the TPU tunnel:  python tools/bench_grid_r3.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from morbit_tpu.parallel.benchmarks import Setting, run_benchmarks  # noqa: E402

SETTINGS = [
    Setting("zdt1", 5, "rbf_cubic", "steepest_descent", 8),
    Setting("zdt1", 5, "taylor1", "steepest_descent", 8),
    Setting("zdt2", 5, "rbf_cubic", "steepest_descent", 8),
    Setting("zdt2", 5, "taylor1", "steepest_descent", 8),
    Setting("zdt3", 5, "rbf_cubic", "steepest_descent", 8),
    Setting("zdt3", 5, "taylor1", "steepest_descent", 8),
    Setting("dtlz1", 5, "rbf_cubic", "steepest_descent", 8),
    Setting("dtlz1", 5, "taylor1", "steepest_descent", 8),
    Setting("dtlz6", 5, "rbf_cubic", "steepest_descent", 8),
    Setting("dtlz6", 5, "taylor1", "steepest_descent", 8),
    Setting("zdt1", 5, "rbf_cubic", "ps", 8),
    Setting("zdt1", 10, "rbf_cubic", "steepest_descent", 8),
    Setting("zdt1", 5, "lagrange1", "steepest_descent", 8),
    Setting("zdt1", 5, "lagrange2", "steepest_descent", 8),
    Setting("zdt1", 15, "rbf_cubic", "steepest_descent", 8),
]


def main():
    save = str(pathlib.Path(__file__).resolve().parent.parent
               / "benchmarks_tpu_r3.json")
    run_benchmarks(SETTINGS, save_path=save, resume=True, steady_state=True)


if __name__ == "__main__":
    main()
