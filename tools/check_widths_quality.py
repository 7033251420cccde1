"""Quantify the f32 divergence between StagedMultistart widths=None and
lane-compacted widths at the reference-default budget.

tools/profile_widths.py reported ``x-match=False`` at rtol=1e-6 on TPU f32.
Expected cause: a compacted stage compiles at a different batch width, so
XLA fuses/vectorizes differently; at f32 the last-bit float differences can
flip trust-region accept/reject decisions for lanes sitting on a threshold,
after which those lanes follow genuinely different (but equally valid)
trajectories. The CPU f64 equivalence lock
(tests/test_multistart.py::test_staged_widths_match_plain) passed with
bit-identical integers and rtol 1e-9 floats — so the per-lane math is right;
this tool checks that the f32 TPU divergence is (a) confined to few lanes
and (b) quality-neutral: identical stop-code histograms up to noise and
indistinguishable distance-to-Pareto-set distributions.

Two-parabolas f1=(x-1)^2 sum, f2=(x+1)^2 sum: the Pareto set is the segment
x1=x2 in [-1,1] (reference docs example, ``examples/example_two_parabolas.jl``).

Run on the TPU tunnel:  python tools/check_widths_quality.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from morbit_tpu.core.config import AlgorithmConfig
from morbit_tpu.models.configs import RbfConfig
from morbit_tpu.parallel.multistart import StagedMultistart
from morbit_tpu.problems.synthetic import halton_starts, make_two_parabolas

BATCH = 1024


def pareto_dist(x):
    """Distance to the two-parabolas Pareto set {(t, t): t in [-1, 1]}."""
    t = np.clip((x[:, 0] + x[:, 1]) / 2.0, -1.0, 1.0)
    return np.sqrt((x[:, 0] - t) ** 2 + (x[:, 1] - t) ** 2)


def main():
    mop = make_two_parabolas(model_cfg=RbfConfig(kernel="multiquadric"),
                             lb=[-4.0, -4.0], ub=[4.0, 4.0])
    ac = AlgorithmConfig(max_iter=100, qp_iters=400)
    x0 = jnp.asarray(halton_starts(BATCH, mop.lb, mop.ub), jnp.float32)

    outs = {}
    for name, widths in (("none", None),
                         ("cdf_x1.1", (1024, 896, 448, 64, 64))):
        runner = StagedMultistart(mop, ac, dtype=jnp.float32, widths=widths)

        def slim(x0b, runner=runner):
            res = runner._run_impl(x0b)
            return (res.x, res.stop_code, res.n_iterations, res.n_evals)

        out = jax.jit(slim)(x0)
        jax.block_until_ready(out[0])
        outs[name] = tuple(np.asarray(o) for o in out)
        print(f"{name}: done", flush=True)

    xa, sa, ia, ea = outs["none"]
    xb, sb, ib, eb = outs["cdf_x1.1"]
    dx = np.linalg.norm(xa - xb, axis=1)
    diff = dx > 1e-6
    print(f"lanes with |x_none - x_widths| > 1e-6: {diff.sum()}/{BATCH}")
    if diff.any():
        print(f"  |dx| on differing lanes: median {np.median(dx[diff]):.3g} "
              f"max {dx[diff].max():.3g}")
        print(f"  iter-count mismatches: {(ia != ib).sum()}  "
              f"eval mismatches: {(ea != eb).sum()}  "
              f"stop-code mismatches: {(sa != sb).sum()}")
    for name, (x, s, it, ev) in outs.items():
        d = pareto_dist(x)
        codes, counts = np.unique(s, return_counts=True)
        print(f"{name}: front-dist median {np.median(d):.3e} "
              f"p90 {np.quantile(d, 0.9):.3e} max {d.max():.3e}  "
              f"conv@1e-2 {float((d < 1e-2).mean()):.3f}  "
              f"mean iters {it.mean():.2f}  mean evals {ev.mean():.1f}  "
              f"stop codes {dict(zip(codes.tolist(), counts.tolist()))}",
              flush=True)


if __name__ == "__main__":
    main()
