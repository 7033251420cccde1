"""Roofline / utilization account of the staged reference-budget program
(round-4 VERDICT weak item 4).

Uses XLA's compiled cost analysis (FLOPs + bytes accessed) on the EXACT
program bench_points runs (probe-tuned StagedMultistart, widths +
probe-derived db capacity), divides by the measured sustained batch time,
and reports achieved FLOP/s and bytes/s against the chip peaks — bounding
how much of the remaining headroom is physically recoverable and naming
the binding resource.

v5e (1 chip) peaks used: 197 TFLOP/s bf16 MXU, ~98.5 TFLOP/s fp32-ish
(conservative: MXU fp32 passes at half bf16 rate; the solver forces
HIGHEST-precision matmuls, and most of its work is VPU elementwise
anyway), HBM ~819 GB/s.

Run on the TPU tunnel:  python tools/roofline.py [out_json]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import (StagedMultistart,
                                            suggest_db_capacity)
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas
from morbit_tpu.utils.compile_cache import enable_persistent_cache

BATCH = 1024
HBM_PEAK_GBS = 819.0
MXU_PEAK_F32 = 98.5e12


def analyze(runner, x0, label):
    def slim(xb):
        r = runner._run_impl(xb)
        return (r.x, r.fx, r.stop_code, r.n_iterations, r.n_evals)

    jitted = jax.jit(slim)
    compiled = jitted.lower(x0).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    byt = float(ca.get("bytes accessed", float("nan")))

    out = jitted(x0)
    jax.block_until_ready(out[0])
    x0s = [jax.device_put(x0 + jnp.asarray(1e-5 * (i + 1), x0.dtype))
           for i in range(8)]
    jax.block_until_ready(x0s)
    t0 = time.perf_counter()
    outs = [jitted(xi) for xi in x0s]
    jax.block_until_ready(outs[-1][0])
    sec = (time.perf_counter() - t0) / 8

    gbs = byt / sec / 1e9
    flopss = flops / sec
    return {
        "label": label,
        "batch": BATCH,
        "xla_flops_per_batch": flops,
        "xla_bytes_per_batch": byt,
        "arithmetic_intensity_flop_per_byte": round(flops / byt, 3),
        "sustained_s_per_batch": round(sec, 5),
        "runs_per_sec": round(BATCH / sec, 1),
        "achieved_GBps": round(gbs, 2),
        "achieved_GFLOPs": round(flopss / 1e9, 2),
        "pct_hbm_peak": round(100 * gbs / HBM_PEAK_GBS, 2),
        "pct_mxu_f32_peak": round(100 * flopss / MXU_PEAK_F32, 3),
        "binding_resource": ("HBM bandwidth"
                             if gbs / HBM_PEAK_GBS
                             > flopss / MXU_PEAK_F32 else "MXU compute"),
    }


def main():
    enable_persistent_cache()
    dtype = jnp.float32
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    rows = []
    for mi, qi, name in ((10, 100, "bench_config"),
                         (100, 400, "reference_default")):
        ac = AlgorithmConfig(max_iter=mi, qp_iters=qi)
        x0 = jnp.asarray(halton_starts(BATCH, mop.lb, mop.ub), dtype)
        probe = StagedMultistart(mop, ac, dtype)
        res = probe(x0)
        runner = (probe.tuned(res.n_iterations,
                              db_capacity=suggest_db_capacity(res))
                  if mi >= 100 else probe)
        rows.append(analyze(runner, x0, name))
        print(json.dumps(rows[-1]), flush=True)

    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                       else "roofline_r5.json")
    out.write_text(json.dumps({
        "platform": jax.devices()[0].platform,
        "peaks": {"hbm_GBps": HBM_PEAK_GBS,
                  "mxu_f32_TFLOPs": MXU_PEAK_F32 / 1e12},
        "note": "XLA compiled cost_analysis totals per batch divided by "
                "sustained batch time (8 pre-staged repeats, one block); "
                "cost analysis counts logical HLO flops/bytes — fused "
                "re-reads make achieved_GBps a LOWER bound on traffic",
        "rows": rows}, indent=2) + "\n")


if __name__ == "__main__":
    main()
