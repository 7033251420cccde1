"""Round-5 TPU benchmark grid: wide-n rows (round-4 VERDICT missing item 2).

BASELINE config 3 names "ZDT1-6, n=10-30" and the reference grid spans
n_vars 2-15 (``/root/reference/examples/large_scale_benchmarks.jl:69-118``);
the r4 grid was all n=5. These rows are the first exercise of the
VMEM-gated round-4 kernel fallback and the capacity heuristics above n=15:

- zdt1 n=10 rbf_cubic PS          (wide-n Pascoletti-Serafini; STAGED —
  completed in 1,115 s compile + 9.6 runs/s steady)
- zdt1 n=20 rbf_cubic steepest    (above the r3 n=15 ceiling; PLAIN)

Reference defaults (max_evals=1000*n, max_iter=100), steady-state split,
resumable.

Round-5 measured compile-cost note: the STAGED n=20 program never came
back from the axon server-side compile inside 80 minutes (client blocked
at zero CPU after ~6 min of tracing) and was killed. Cold compile grows
~2.6x per +5 vars on this tunnel (plain rows: 1,350 s at n=10 / 3,510 s
at n=15, ``benchmarks_tpu_r3.json``), and staging multiplies program
count — so the n=20 row runs PLAIN here and n=30 is out of reach of one
session's budget on this tunnel (the CPU-f64 n=20/30 solver exercises
live in ``tests/test_zdt_quality.py::test_zdt1_rbf_wide_n20_front_quality``
and the round-5 notes instead; at n_starts=8 the plain runner's steady
state is equivalent anyway — staging pays off on big fleets, not 8 lanes).

Writes ``benchmarks_tpu_r5.json``.

Run on the TPU tunnel:  python tools/bench_grid_r5.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from morbit_tpu.parallel.benchmarks import Setting, run_benchmarks  # noqa: E402
from morbit_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

STAGED_SETTINGS = [
    Setting("zdt1", 10, "rbf_cubic", "ps", 8),
]
PLAIN_SETTINGS = [
    Setting("zdt1", 20, "rbf_cubic", "steepest_descent", 8),
]


def main():
    enable_persistent_cache()
    save = str(pathlib.Path(__file__).resolve().parent.parent
               / "benchmarks_tpu_r5.json")
    run_benchmarks(STAGED_SETTINGS, save_path=save, resume=True,
                   steady_state=True, staged=True)
    run_benchmarks(PLAIN_SETTINGS, save_path=save, resume=True,
                   steady_state=True, staged=False)


if __name__ == "__main__":
    main()
