"""Batched RBF rounds-1-3 selection as ONE Pallas kernel over lane tiles.

The selection logic (`rbf_selection_core`) lowers under plain ``vmap`` to
~50 sequential micro-kernels per call — greedy picks, Householder updates,
argmaxes on (B, cap)/(B, n, n) operands — which are pure launch latency at
multistart batch sizes (~2.9 ms/pass at B=1024 on v5e,
tools/profile_pass.py). Here the whole selection runs as ONE lane-tiled
Pallas kernel: one launch, all intermediates in VMEM, grid over batch
tiles. The kernel body is the coordinate-sliced re-expression of the core
(`ops/prepare_coord.selection_coord_batched` — batch on the 128-wide lane
axis; naive vmap-of-core inside the kernel measured ~15x SLOWER than plain
XLA from lane padding at small n). Equivalence of the two expressions is
pinned by tests/test_prepare_fused.py.

Routing happens at the vmap boundary via a raw primitive with an explicit
batching rule: unbatched calls (single sequential solves, float64 golden
runs) take the plain core; a vmapped solve on the float32 TPU path swaps
in the Pallas kernel. The solver itself never changes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import os as _os

from morbit_tpu.ops.precision import (current_matmul_precision,
                                      matmul_precision_ctx)

#: test hook: run the Pallas path in interpreter mode on CPU
FORCE_INTERPRET = False
#: escape hatch: disable the Pallas path entirely (env for A/B profiling)
DISABLE = bool(int(_os.environ.get("MORBIT_DISABLE_FUSED", "0")))
_TILE = int(_os.environ.get("MORBIT_PREPARE_TILE", "128"))
#: round-4 batch tile (batch lives on the LANE axis of every kernel array,
#: so 128 fills the vector lanes exactly; 256 SIGABRTs the Mosaic compile
#: at the bench shapes). VMEM holds one wave's (C, T) slabs only — the
#: wave loop is an early-exit lax.while_loop (ops/round4_lane.py).
_TILE_R4 = int(_os.environ.get("MORBIT_ROUND4_TILE", "128"))
#: lane-batched fused round-4 is ON by default for vmapped f32 TPU solves:
#: bench 8,750 -> 14,857 runs/s (the earlier coordinate-sliced list-form
#: kernel LOST to the vmapped XLA wave loop — its per-wave stack/unstack
#: round-trip and sublane-tiled slabs dominated; batch-on-lanes stacked
#: arrays fixed both). MORBIT_R4_FUSED=0 restores the XLA lowering.
R4_FUSED = bool(int(_os.environ.get("MORBIT_R4_FUSED", "1")))
#: largest n_vars routed to the fused rounds-1-3 selection kernel (Mosaic
#: compile time grows super-linearly with the ~n^2 kernel body; n=15
#: effectively hangs the remote compile — see the selection batching rule)
_SELECTION_MAX_N = int(_os.environ.get("MORBIT_SELECTION_MAX_N", "10"))
#: largest database capacity routed to the selection kernel (its slabs are
#: (tile, cap); large-budget configs reach cap ~2000+, far past the proven
#: regime — bench config cap is 157)
_SELECTION_MAX_CAP = int(_os.environ.get("MORBIT_SELECTION_MAX_CAP", "512"))
#: largest maxN*C wave-body size routed to the fused round-4 kernel
#: (proven at 6*60=360; ZDT n=5 is 21*210=4410 and failed to compile)
_R4_MAX_BODY = int(_os.environ.get("MORBIT_R4_MAX_BODY", "1024"))


def _pallas_ok(dtype) -> bool:
    if DISABLE:
        return False
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if FORCE_INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pallas_selection(statics, B, cap, n, X, count, x_s, x_index, delta,
                      lb_s, ub_s, max_new, efl=None):
    """``efl``: optional (B,) bool — the traced per-lane
    ensure_fully_linear flag (criticality micro-step rebuilds); when given,
    ``statics['ensure_fully_linear']`` must be the string 'traced'."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from morbit_tpu.ops.prepare_coord import selection_coord_batched

    dtype = X.dtype
    tile = min(_TILE, B) if B % min(_TILE, B) == 0 else None
    if tile is None:
        # pad the batch to a tile multiple with copies of lane 0
        tile = min(_TILE, 1 << (B - 1).bit_length())
        padded = ((B + tile - 1) // tile) * tile
    else:
        padded = B
    pad = padded - B

    def p(a):
        if pad == 0:
            return a
        reps = jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    col = lambda a, dt: jnp.asarray(a, dt).reshape((-1, 1))
    # coordinate-major site block: lanes = database rows (cap), not n
    X_t = jnp.swapaxes(X, 1, 2)  # (B, n, cap)
    traced_efl = efl is not None
    ins = (p(X_t), p(col(count, jnp.int32)), p(x_s),
           p(col(x_index, jnp.int32)), p(col(delta, dtype)), p(lb_s),
           p(ub_s), p(col(max_new, jnp.int32)))
    if traced_efl:
        ins = ins + (p(col(efl.astype(jnp.int32), jnp.int32)),)

    grid = (padded // tile,)
    row_spec = lambda w: pl.BlockSpec(
        (tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cube_spec = lambda a, b: pl.BlockSpec(
        (tile, a, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [cube_spec(n, cap), row_spec(1), row_spec(n), row_spec(1),
                row_spec(1), row_spec(n), row_spec(n), row_spec(1)]
    if traced_efl:
        in_specs.append(row_spec(1))
    out_shapes = (
        jax.ShapeDtypeStruct((padded, n), jnp.int32),      # r1_idx
        jax.ShapeDtypeStruct((padded, 1), jnp.int32),      # r1_cnt
        jax.ShapeDtypeStruct((padded, n), jnp.int32),      # r2_idx
        jax.ShapeDtypeStruct((padded, 1), jnp.int32),      # r2_cnt
        jax.ShapeDtypeStruct((padded, n, n), dtype),       # sites3
        jax.ShapeDtypeStruct((padded, n), jnp.int32),      # active3
        jax.ShapeDtypeStruct((padded, 1), jnp.int32),      # n_new
        jax.ShapeDtypeStruct((padded, n, n), dtype),       # dirs
        jax.ShapeDtypeStruct((padded, 1), jnp.int32),      # dirs_count
        jax.ShapeDtypeStruct((padded, 1), jnp.int32),      # fully_linear
    )
    out_specs = (row_spec(n), row_spec(1), row_spec(n), row_spec(1),
                 cube_spec(n, n), row_spec(n), row_spec(1),
                 cube_spec(n, n), row_spec(1), row_spec(1))

    def kernel(X_ref, cnt_ref, xs_ref, xi_ref, d_ref, lb_ref, ub_ref,
               mn_ref, *rest):
        if traced_efl:
            efl_ref = rest[0]
            rest = rest[1:]
            kw = dict(statics)
            kw["ensure_fully_linear"] = efl_ref[:, 0] > 0
        else:
            kw = statics
        (o_r1i, o_r1c, o_r2i, o_r2c, o_s3, o_a3, o_nn,
         o_dirs, o_dc, o_fl) = rest
        (r1o, r1c, r2o, r2c, s3, a3, nn, dirs, dc, fl) = \
            selection_coord_batched(
                X_ref[:], cnt_ref[:, 0], xs_ref[:], xi_ref[:, 0],
                d_ref[:, 0], lb_ref[:], ub_ref[:], mn_ref[:, 0],
                n=n, cap=cap, dtype=dtype, **kw)
        for s in range(n):
            o_r1i[:, s] = r1o[s]
            o_r2i[:, s] = r2o[s]
            o_a3[:, s] = a3[s].astype(jnp.int32)
            for i in range(n):
                o_s3[:, s, i] = s3[s][i]
                o_dirs[:, s, i] = dirs[s][i]
        o_r1c[:, 0] = r1c
        o_r2c[:, 0] = r2c
        o_nn[:, 0] = nn
        o_dc[:, 0] = dc
        o_fl[:, 0] = fl.astype(jnp.int32)

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=bool(FORCE_INTERPRET),
    )(*ins)

    (r1i, r1c, r2i, r2c, s3, a3, nn, dirs, dc, fl) = outs
    s = lambda a: a[:B]
    return (s(r1i), s(r1c)[:, 0], s(r2i), s(r2c)[:, 0], s(s3),
            s(a3) > 0, s(nn)[:, 0], s(dirs), s(dc)[:, 0], s(fl)[:, 0] > 0)


#: scoped-VMEM budget for one grid step of the round-4 kernel (the hard
#: limit is 16M; leave headroom for double-buffered input/output blocks)
_R4_VMEM_BUDGET = 10 * 2 ** 20


def _r4_tile(statics) -> int:
    """Largest batch tile (<= _TILE_R4, multiple of 32) whose one-wave
    working set fits the scoped-VMEM budget; 0 when even 32 does not fit
    (large-n problems: ZDT n=10 has maxN=66, C=660 — the XLA wave loop is
    the right lowering there)."""
    maxN, C, n = statics["max_points"], statics["C"], statics["n"]
    pd = statics["pd"]
    # body-size gate: the kernel unrolls maxN x C slab work per wave —
    # only the small-shape regime is proven on hardware (two-parabolas
    # n=2: maxN=6, C=60). Bigger configurations (ZDT n=5: maxN=21, C=210)
    # failed the round-3 grid at Mosaic-compile level; the vmapped XLA
    # wave loop is the reliable lowering there.
    if maxN * C > _R4_MAX_BODY:
        return 0
    # dominant live slabs per lane (floats): the six maxN-lists of (C,)
    # slabs, the Givens per-candidate copies, ~10 (C,) scalars slabs, the
    # five (maxN, maxN) factors, sites and X
    per_lane = (6 * maxN * C + (pd * pd + 2 * pd) * C + 10 * C
                + 5 * maxN * maxN + 2 * maxN * n + n * C) * 4
    tile = min(_TILE_R4, 128)
    while tile >= 32 and per_lane * tile > _R4_VMEM_BUDGET:
        tile //= 2
    return tile if tile >= 32 else 0


def _pallas_round4(statics, B, X_t, cand, sites0, count, param):
    """Lane-batched fused round-4: batch on the LAST (lane) axis.

    ``X_t``: (B, n, C); ``cand``: (B, C); ``sites0``: (B, maxN, n);
    ``count``/``param``: (B,). The kernel body
    (:func:`morbit_tpu.ops.round4_lane.round4_lane_batched`) keeps state in
    stacked array form with the batch tile on lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from morbit_tpu.ops.round4_lane import round4_lane_batched

    n = statics["n"]
    C = statics["C"]
    maxN = statics["max_points"]
    dtype = jnp.dtype(statics["dtype"])

    t4 = _r4_tile(statics)
    tile = min(t4, B) if B % min(t4, B) == 0 else None
    if tile is None:
        tile = min(t4, 1 << (B - 1).bit_length())
        padded = ((B + tile - 1) // tile) * tile
    else:
        padded = B
    pad = padded - B

    def p(a):
        if pad == 0:
            return a
        reps = jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    # lane-last layouts: batch becomes the trailing axis
    X_l = jnp.transpose(p(X_t), (1, 2, 0))                 # (n, C, padded)
    cand_l = jnp.transpose(p(cand.astype(jnp.int32)))      # (C, padded)
    s0_l = jnp.transpose(p(sites0), (1, 2, 0))             # (maxN, n, padded)
    cnt_l = jnp.asarray(p(count), jnp.int32)[None, :]      # (1, padded)
    par_l = jnp.asarray(p(param), dtype)[None, :]          # (1, padded)

    grid = (padded // tile,)
    mat_spec = lambda r: pl.BlockSpec(
        (r, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cube_spec = lambda a, b: pl.BlockSpec(
        (a, b, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    in_specs = [cube_spec(n, C), mat_spec(C), cube_spec(maxN, n),
                mat_spec(1), mat_spec(1)]
    out_shapes = (
        jax.ShapeDtypeStruct((C, padded), jnp.int32),      # accepted
        jax.ShapeDtypeStruct((1, padded), jnp.int32),      # N_final
    )
    out_specs = (mat_spec(C), mat_spec(1))

    kstat = {k: statics[k] for k in
             ("n", "C", "kernel", "static_param", "chol_pivot2",
              "max_points")}

    def kernel(X_ref, cand_ref, s0_ref, cnt_ref, par_ref, o_acc, o_n):
        acc, Nf = round4_lane_batched(
            X_ref[:], cand_ref[:] > 0, s0_ref[:], cnt_ref[0, :],
            par_ref[0, :], maxN=maxN, pd=statics["pd"], dtype=dtype,
            **kstat)
        o_acc[:] = acc.astype(jnp.int32)
        o_n[0, :] = Nf

    acc, Nf = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=bool(FORCE_INTERPRET),
    )(X_l, cand_l, s0_l, cnt_l, par_l)
    return jnp.transpose(acc)[:B] > 0, Nf[0, :B]


def make_batched_round4(*, n_vars, C, dtype, kernel, static_param, poly_deg,
                        max_points, chol_pivot):
    """Build the round-4 acceptance callable with custom batching.

    Single-lane calls run :func:`morbit_tpu.models.rbf_round4.run_round4`
    directly (float64 golden paths keep the pre-existing XLA lowering);
    vmapped calls on the float32 TPU path run the fused Pallas kernel over
    lane tiles (``ops/round4_lane.py``). Same raw-primitive routing as
    :func:`make_batched_selection`."""
    from jax.interpreters import batching, mlir

    import jax.extend.core as jex_core
    from jax.core import ShapedArray

    from morbit_tpu.ops.rbf import poly_dim

    n = n_vars
    maxN = max_points
    pd = poly_dim(n, poly_deg)
    statics = dict(n=n, C=C, maxN=maxN, pd=pd, kernel=kernel,
                   static_param=static_param,
                   chol_pivot2=float(chol_pivot) ** 2,
                   max_points=max_points, dtype=jnp.dtype(dtype).name)

    # precision: captured at bind time, replayed around deferred re-traces
    # (lower_fun lowering runs after the solver's trace-time
    # default_matmul_precision context exits — see ops/precision.py)
    def _core(X, cand, sites0, count, param, precision=None):
        from morbit_tpu.models.rbf_round4 import run_round4

        with matmul_precision_ctx(precision):
            st = run_round4(
                X, cand, sites0, count, kernel=kernel,
                param=(param if static_param is None else static_param),
                poly_deg=poly_deg, max_points=max_points,
                chol_pivot=jnp.asarray(chol_pivot, X.dtype))
        return [st.accepted, st.N]

    prim = jex_core.Primitive(
        f"rbf_round4_n{n}_c{C}_m{maxN}_{kernel}")
    prim.multiple_results = True
    prim.def_impl(_core)

    @prim.def_abstract_eval
    def _abs(X, cand, sites0, count, param, *, precision=None):
        return [ShapedArray((C,), jnp.bool_), ShapedArray((), jnp.int32)]

    mlir.register_lowering(prim, mlir.lower_fun(_core, multiple_results=True))

    def _batch(args, dims, *, precision=None):
        size = next(a.shape[d] for a, d in zip(args, dims)
                    if d is not batching.not_mapped)

        def at0(a, d):
            if d is batching.not_mapped:
                return jnp.broadcast_to(a, (size,) + a.shape)
            return jnp.moveaxis(a, d, 0)

        X, cand, sites0, count, param = (
            at0(a, d) for a, d in zip(args, dims))
        with matmul_precision_ctx(precision):
            if R4_FUSED and _pallas_ok(dtype) and _r4_tile(statics) >= 32:
                acc, Nf = _pallas_round4(statics, size,
                                         jnp.swapaxes(X, 1, 2), cand, sites0,
                                         count, param)
            else:
                acc, Nf = jax.vmap(partial(_core, precision=precision))(
                    X, cand, sites0, count, param)
        return [acc, Nf], [0, 0]

    batching.primitive_batchers[prim] = _batch

    def r4(X, cand, sites0, count, param):
        return tuple(prim.bind(
            X, cand, sites0, jnp.asarray(count, jnp.int32),
            jnp.asarray(param, dtype),
            precision=current_matmul_precision()))

    return r4


def make_batched_selection(n_vars, dtype, ac, cfg, ensure_fully_linear):
    """Build the rounds-1-3 selection callable with custom batching.

    Single-lane calls run :func:`rbf_selection_core` directly (the float64
    golden path stays byte-for-byte on the pre-existing XLA lowering);
    vmapped calls on the float32 TPU path run the fused Pallas kernel.

    ``ensure_fully_linear``: ``False``/``True`` bake the flag statically;
    the string ``'traced'`` builds the variant that takes the flag as an
    extra traced bool argument (per lane under vmap) — the criticality
    micro-step restructure passes the rebuild flag per trip.

    Implemented as a RAW primitive with an explicit batching rule (not
    ``jax.custom_batching.custom_vmap``): the solver invokes this inside
    ``lax.while_loop``/``lax.cond`` bodies, whose batching turns traced-out
    jaxpr constants batched — custom_vmap asserts against exactly that."""
    from jax.interpreters import batching, mlir

    from morbit_tpu.models.rbf_model import rbf_selection_core

    n = n_vars
    traced = ensure_fully_linear == "traced"
    base_kw = dict(
        n=n,
        theta_e1=cfg.theta_enlarge_1,
        theta_e2_dmax=cfg.theta_enlarge_2 * ac.delta_max,
        theta_pivot=cfg.theta_pivot,
        delta_max=ac.delta_max,
        skip2_same_theta=(cfg.theta_enlarge_1 == cfg.theta_enlarge_2),
    )
    if traced:
        def core(X, count, x_s, x_index, delta, lb_s, ub_s, max_new, efl):
            return rbf_selection_core(
                X, count, x_s, x_index, delta, lb_s, ub_s, max_new,
                ensure_fully_linear=efl, **base_kw)
    else:
        core = partial(rbf_selection_core,
                       ensure_fully_linear=ensure_fully_linear, **base_kw)

    statics = dict(base_kw, ensure_fully_linear=ensure_fully_linear)
    del statics["n"]

    import jax.extend.core as jex_core
    from jax.core import ShapedArray

    tag = "traced" if traced else str(int(bool(ensure_fully_linear)))
    prim = jex_core.Primitive(f"rbf_selection_n{n}_efl{tag}")
    prim.multiple_results = True

    # precision: bind-time capture, replayed around deferred re-traces
    # (see ops/precision.py and the note in make_batched_round4)
    def _core_tuple(*args, precision=None):
        with matmul_precision_ctx(precision):
            return list(core(*args))

    prim.def_impl(_core_tuple)

    @prim.def_abstract_eval
    def _abs(X, count, x_s, x_index, delta, lb_s, ub_s, max_new, *maybe_efl,
             precision=None):
        dt = X.dtype
        i32 = jnp.int32
        return [
            ShapedArray((n,), i32), ShapedArray((), i32),
            ShapedArray((n,), i32), ShapedArray((), i32),
            ShapedArray((n, n), dt), ShapedArray((n,), jnp.bool_),
            ShapedArray((), i32), ShapedArray((n, n), dt),
            ShapedArray((), i32), ShapedArray((), jnp.bool_),
        ]

    mlir.register_lowering(
        prim, mlir.lower_fun(_core_tuple, multiple_results=True))

    def _batch(args, dims, *, precision=None):
        size = next(a.shape[d] for a, d in zip(args, dims)
                    if d is not batching.not_mapped)

        def at0(a, d):
            if d is batching.not_mapped:
                return jnp.broadcast_to(a, (size,) + a.shape)
            return jnp.moveaxis(a, d, 0)

        args0 = tuple(at0(a, d) for a, d in zip(args, dims))
        cap = args0[0].shape[1]
        # size gate: the kernel's coordinate-sliced body scales ~n^2 in op
        # count and Mosaic compile time grows super-linearly with it —
        # n=10 compiles in tens of minutes, n=15 effectively hangs the
        # remote compile helper. Large-n solves keep the plain XLA
        # lowering (n=15 compiled in ~17 min there, round-2 grid).
        with matmul_precision_ctx(precision):
            if (_pallas_ok(dtype) and n <= _SELECTION_MAX_N
                    and cap <= _SELECTION_MAX_CAP):
                if traced:
                    outs = _pallas_selection(statics, size, cap, n,
                                             *args0[:8], efl=args0[8])
                else:
                    outs = _pallas_selection(statics, size, cap, n, *args0)
            else:
                outs = jax.vmap(core)(*args0)
        return list(outs), [0] * 10

    batching.primitive_batchers[prim] = _batch

    def sel(X, count, x_s, x_index, delta, lb_s, ub_s, max_new, efl=None):
        args = (X, jnp.asarray(count, jnp.int32), x_s,
                jnp.asarray(x_index, jnp.int32), delta,
                lb_s, ub_s, jnp.asarray(max_new, jnp.int32))
        if traced:
            args = args + (jnp.asarray(efl, bool),)
        return tuple(prim.bind(*args, precision=current_matmul_precision()))

    return sel
