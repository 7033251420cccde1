"""Round-4 TPU benchmark grid: PS descent rows + staged runner.

Round-3 VERDICT missing item 3: the round-3 artifact had zero PS rows,
mostly n=5 steepest-descent, and predates StagedMultistart. This grid runs
``descent in {steepest_descent, ps}`` (PS at the REFERENCE default budgets,
``descent.jl:414-432``: 500*(n+1) global-only) across the five reference
benchmark problems (``examples/large_scale_benchmarks.jl:69-118``) and >= 2
model families at n=5, plus the Lagrange rows and a multiquadric pair —
all with the bit-exact staged-capacity runner (StagedMultistart).

n=10/15 RBF rows are intentionally NOT regenerated (round-3 roadmap: their
1,350/3,510 s compiles would multiply by the stage count); the round-3
artifact keeps those points.

Writes ``benchmarks_tpu_r4.json`` incrementally (resumable).

Run on the TPU tunnel:  python tools/bench_grid_r4.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from morbit_tpu.parallel.benchmarks import Setting, run_benchmarks  # noqa: E402
from morbit_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

PROBLEMS = ("zdt1", "zdt2", "zdt3", "dtlz1", "dtlz6")

SETTINGS = [
    # 5 problems x {rbf_cubic, taylor1} x {steepest, ps} at n=5
    *[Setting(p, 5, m, d, 8)
      for p in PROBLEMS
      for m in ("rbf_cubic", "taylor1")
      for d in ("steepest_descent", "ps")],
    # multiquadric pair on zdt1
    Setting("zdt1", 5, "rbf_multiquadric", "steepest_descent", 8),
    Setting("zdt1", 5, "rbf_multiquadric", "ps", 8),
    # Lagrange rows (steepest + one PS)
    Setting("zdt1", 5, "lagrange1", "steepest_descent", 8),
    Setting("zdt1", 5, "lagrange2", "steepest_descent", 8),
    Setting("zdt1", 5, "lagrange1", "ps", 8),
    # exact-model reference rows
    Setting("zdt1", 5, "exact", "steepest_descent", 8),
    Setting("zdt1", 5, "exact", "ps", 8),
]


def main():
    enable_persistent_cache()
    save = str(pathlib.Path(__file__).resolve().parent.parent
               / "benchmarks_tpu_r4.json")
    run_benchmarks(SETTINGS, save_path=save, resume=True, steady_state=True,
                   staged=True)


if __name__ == "__main__":
    main()
