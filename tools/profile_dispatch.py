"""Quantify per-call dispatch overhead through the TPU tunnel.

tools/profile_fine.py saw jit-identity on the 45-leaf solver state cost
~144 ms/call. This probes whether that scales with leaf COUNT or BYTES.

Run:  python tools/profile_dispatch.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timed(f, args, reps=10):
    out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        jax.block_until_ready(leaf)
    return (time.perf_counter() - t0) / reps


def main():
    print("platform:", jax.devices()[0].platform)
    for n_leaves, elems in [(1, 1024), (8, 1024), (45, 1024),
                            (45, 64), (1, 1024 * 157 * 2), (8, 1024 * 157 * 2)]:
        arrs = tuple(jnp.full((elems,), float(i)) for i in range(n_leaves))
        f = jax.jit(lambda *xs: tuple(x + 1.0 for x in xs))
        t = timed(f, arrs)
        mb = n_leaves * elems * 4 / 1e6
        print(f"leaves={n_leaves:3d} elems/leaf={elems:8d} ({mb:8.2f} MB): "
              f"{t*1e3:8.2f} ms/call")


if __name__ == "__main__":
    main()
