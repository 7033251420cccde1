"""Round-5 TPU benchmark grid: wide-n rows (round-4 VERDICT missing item 2).

BASELINE config 3 names "ZDT1-6, n=10-30" and the reference grid spans
n_vars 2-15 (``/root/reference/examples/large_scale_benchmarks.jl:69-118``);
the r4 grid was all n=5. These rows are the first exercise of the
VMEM-gated round-4 kernel fallback and the capacity heuristics above n=15:

- zdt1 n=10 rbf_cubic PS          (wide-n Pascoletti-Serafini)
- zdt1 n=20 rbf_cubic steepest    (above the r3 n=15 ceiling)
- zdt1 n=30 rbf_cubic steepest    (BASELINE upper edge)

Reference defaults (max_evals=1000*n, max_iter=100), staged runner,
steady-state split, resumable. Warm-cache compile times land in the rows.

Writes ``benchmarks_tpu_r5.json``.

Run on the TPU tunnel:  python tools/bench_grid_r5.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from morbit_tpu.parallel.benchmarks import Setting, run_benchmarks  # noqa: E402
from morbit_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

SETTINGS = [
    Setting("zdt1", 10, "rbf_cubic", "ps", 8),
    Setting("zdt1", 20, "rbf_cubic", "steepest_descent", 8),
    Setting("zdt1", 30, "rbf_cubic", "steepest_descent", 8),
]


def main():
    enable_persistent_cache()
    save = str(pathlib.Path(__file__).resolve().parent.parent
               / "benchmarks_tpu_r5.json")
    run_benchmarks(SETTINGS, save_path=save, resume=True, steady_state=True,
                   staged=True)


if __name__ == "__main__":
    main()
