"""Microbenchmarks for the software texture-cache kernel primitives.

Measures, on the real chip, the building blocks of the span-staged
texture-sampling kernel (ops/texcache.py): segmented `dynamic_gather`
sweeps (cost vs. segment count, batch shape, channel count, dynamic trip
counts), dynamic-offset DMA staging from an HBM atlas, and the exotic
lowerings (sublane gather / 2D advanced indexing) that would collapse the
sweep if Mosaic supports them.

Run: python -m direct12pbrrenderer_tpu.tools.microbench_tex [--iters N]
Every line prints: name, ms/frame-equivalent, and the workload shape.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILES = 675  # 1080p at 24x128


def timeit(fn, *args, iters=5, warmup=2):
    jfn = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0))
    try:
        for _ in range(warmup):
            float(jfn(*args))
    except Exception as e:  # lowering not supported
        return None, f"{type(e).__name__}: {str(e)[:120]}"
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts)), None


def report(name, ms, note=""):
    if ms is None:
        print(f"{name:<44} FAILED  {note}")
    else:
        print(f"{name:<44} {ms:9.2f} ms  {note}")


# ---------------------------------------------------------------- sweeps ---
def _sweep_kernel(nseg_ref, table_ref, idx_ref, out_ref, *, n_seg, rows, mode):
    idx = idx_ref[0]
    seg = idx >> 7
    lane = idx & 127

    if mode == "unrolled":
        acc = jnp.zeros(idx.shape, table_ref.dtype)
        for s in range(n_seg):
            x = jnp.broadcast_to(table_ref[s, :][None, :], idx.shape)
            g = jnp.take_along_axis(x, lane, axis=1)
            acc = jnp.where(seg == s, g, acc)
        out_ref[0] = acc
    elif mode == "fori":
        def body(s, acc):
            x = jnp.broadcast_to(table_ref[s, :][None, :], idx.shape)
            g = jnp.take_along_axis(x, lane, axis=1)
            return jnp.where(seg == s, g, acc)
        out_ref[0] = jax.lax.fori_loop(
            0, nseg_ref[pl.program_id(0)], body,
            jnp.zeros(idx.shape, table_ref.dtype))


def bench_sweep(rows, n_seg, mode, dyn_frac=1.0, iters=5, label=None):
    """One tile-sweep: idx block (rows,128) against an (n_seg,128) table."""
    table = jnp.asarray(np.random.rand(n_seg, 128).astype(np.float32))
    idx = jnp.asarray(
        np.random.randint(0, n_seg * 128, (TILES, rows, 128)).astype(np.int32))
    nsegs = jnp.full((TILES,), max(1, int(n_seg * dyn_frac)), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((n_seg, 128), lambda t, *_: (0, 0)),
            pl.BlockSpec((1, rows, 128), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda t, *_: (t, 0, 0)),
    )
    fn = pl.pallas_call(
        functools.partial(_sweep_kernel, n_seg=n_seg, rows=rows, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TILES, rows, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )
    ms, err = timeit(fn, nsegs, table, idx, iters=iters)
    report(label or f"sweep[{mode}] rows={rows} segs={n_seg} dyn={dyn_frac}",
           ms, err or f"{TILES} tiles")


# ----------------------------------------------- crossprod sweep (winner) ---
def _crossprod_kernel(table_ref, idx_ref, out_ref, *, cap, taps, blocks):
    """Per tile: ONE take_along_axis over the (segments x channels x blocks)
    cross product, then a lane-wise select-reduce over segments.

    table block: (cap, 4, 128) channel-major page rows.
    idx block:   (taps, blocks, 128) int32 in [0, cap*128).
    out:         (taps, 4, blocks, 128) f32 (bitcast-unpacked channel 0..3).
    """
    table = table_ref[0]            # (cap, 4, 128)
    acc_planes = []
    for t in range(taps):
        rec = idx_ref[0, t]         # (blocks, 128)
        seg = rec >> 7
        lane = rec & 127
        x = jnp.broadcast_to(
            table[:, :, None, :], (cap, 4, blocks, 128)
        ).reshape(cap * 4 * blocks, 128)
        idx4 = jnp.broadcast_to(
            lane[None, None], (cap, 4, blocks, 128)
        ).reshape(cap * 4 * blocks, 128)
        g = jnp.take_along_axis(x, idx4, axis=1)
        g = g.reshape(cap, 4, blocks, 128)
        acc = jnp.zeros((4, blocks, 128), table.dtype)
        for s in range(cap):
            acc = jnp.where((seg == s)[None], g[s], acc)
        acc_planes.append(acc)
    out_ref[0] = jnp.stack(acc_planes, 0)


def bench_crossprod(cap=16, taps=10, blocks=24, iters=5):
    table = jnp.asarray(
        np.random.rand(TILES, cap, 4, 128).astype(np.float32))
    idx = jnp.asarray(np.random.randint(
        0, cap * 128, (TILES, taps, blocks, 128)).astype(np.int32))
    fn = pl.pallas_call(
        functools.partial(_crossprod_kernel, cap=cap, taps=taps, blocks=blocks),
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((1, cap, 4, 128), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, taps, blocks, 128), lambda t: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, taps, 4, blocks, 128), lambda t: (t, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (TILES, taps, 4, blocks, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )
    ms, err = timeit(fn, table, idx, iters=iters)
    report(f"crossprod cap={cap} taps={taps}", ms,
           err or f"{TILES} tiles, {TILES*taps*cap*4*blocks} gather-rows")


# --------------------------------------------------- XLA staging gathers ---
def bench_xla_page_gather(pages_per_tile=200, iters=5):
    """Stage per-tile page lists with one XLA gather of (1, 512) i32 slices."""
    n_pages = 2**17  # 256 MB atlas-equivalent
    atlas = jnp.asarray(
        np.random.randint(0, 2**31, (n_pages, 512)).astype(np.int32))
    ids = jnp.asarray(np.random.randint(
        0, n_pages, (TILES, pages_per_tile)).astype(np.int32))

    def stage(atlas_, ids_):
        return jnp.take(atlas_, ids_.reshape(-1), axis=0)

    ms, err = timeit(stage, atlas, ids, iters=iters)
    mb = TILES * pages_per_tile * 512 * 4 / 1e6
    report(f"XLA page gather pages/tile={pages_per_tile}", ms,
           err or f"{mb:.0f} MB staged")


def bench_xla_super_gather(super_pages=8, supers_per_tile=25, iters=5):
    """Gather slice-size scaling: rows of super_pages*2KB."""
    n_pages = 2**17
    n_supers = n_pages // super_pages
    atlas = jnp.asarray(np.random.randint(
        0, 2**31, (n_supers, super_pages * 512)).astype(np.int32))
    ids = jnp.asarray(np.random.randint(
        0, n_supers, (TILES, supers_per_tile)).astype(np.int32))

    def stage(atlas_, ids_):
        return jnp.take(atlas_, ids_.reshape(-1), axis=0)

    ms, err = timeit(stage, atlas, ids, iters=iters)
    rows = TILES * supers_per_tile
    mb = rows * super_pages * 512 * 4 / 1e6
    report(f"XLA super gather {super_pages}p x {supers_per_tile}/tile", ms,
           err or f"{rows} rows, {mb:.0f} MB")


# ------------------------------------------------- exotic lowering probes ---
def _sublane_gather_kernel(table_ref, seg_ref, out_ref):
    out_ref[0] = jnp.take_along_axis(table_ref[:, :], seg_ref[0], axis=0)


def _index2d_kernel(table_ref, seg_ref, lane_ref, out_ref):
    out_ref[0] = table_ref[seg_ref[0], lane_ref[0]]


def bench_exotic(rows=48, n_seg=512, iters=5):
    table = jnp.asarray(np.random.rand(n_seg, 128).astype(np.float32))
    seg = jnp.asarray(
        np.random.randint(0, n_seg, (TILES, rows, 128)).astype(np.int32))
    lane = jnp.asarray(
        np.random.randint(0, 128, (TILES, rows, 128)).astype(np.int32))

    common = dict(
        out_shape=jax.ShapeDtypeStruct((TILES, rows, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )
    fn = pl.pallas_call(
        _sublane_gather_kernel,
        grid=(TILES,),
        in_specs=[pl.BlockSpec((n_seg, 128), lambda t: (0, 0)),
                  pl.BlockSpec((1, rows, 128), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, rows, 128), lambda t: (t, 0, 0)),
        **common,
    )
    ms, err = timeit(fn, table, seg, iters=iters)
    report(f"sublane take_along_axis(axis=0) segs={n_seg}", ms, err or "")

    fn2 = pl.pallas_call(
        _index2d_kernel,
        grid=(TILES,),
        in_specs=[pl.BlockSpec((n_seg, 128), lambda t: (0, 0)),
                  pl.BlockSpec((1, rows, 128), lambda t: (t, 0, 0)),
                  pl.BlockSpec((1, rows, 128), lambda t: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, rows, 128), lambda t: (t, 0, 0)),
        **common,
    )
    ms, err = timeit(fn2, table, seg, lane, iters=iters)
    report(f"2D advanced index table[seg,lane] segs={n_seg}", ms, err or "")


# ----------------------------------------------------------- DMA staging ---
def _dma_kernel(starts_ref, atlas_ref, out_ref, table, sems, *, n_spans, span_rows):
    t = pl.program_id(0)

    def dma(j):
        # HBM slice starts must be provably 8-row aligned (Mosaic tiling)
        start = pl.multiple_of(starts_ref[t, j] * 8, 8)
        return pltpu.make_async_copy(
            atlas_ref.at[pl.ds(start, span_rows)],
            table.at[pl.ds(j * span_rows, span_rows)],
            sems.at[j],
        )

    for j in range(n_spans):
        dma(j).start()
    for j in range(n_spans):
        dma(j).wait()
    out_ref[0] = table[0:8, 0:128].astype(jnp.float32)


def bench_dma(n_spans=30, span_rows=32, iters=5):
    # quad-channel-plane layout: row = [c0(128) | c1(128) | c2(128) | c3(128)]
    n_rows = 2**16  # 134 MB atlas-equivalent
    atlas = jnp.asarray(
        np.random.randint(0, 2**31, (n_rows, 512)).astype(np.int32))
    starts = jnp.asarray(np.random.randint(
        0, (n_rows - span_rows) // 8, (TILES, n_spans)).astype(np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TILES,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_spans * span_rows, 512), jnp.int32),
            pltpu.SemaphoreType.DMA((n_spans,)),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(_dma_kernel, n_spans=n_spans, span_rows=span_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TILES, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )
    ms, err = timeit(fn, starts, atlas, iters=iters)
    mb = TILES * n_spans * span_rows * 512 * 4 / 1e6
    report(f"DMA staging spans={n_spans} rows={span_rows}", ms,
           err or f"{mb:.0f} MB/frame")


def bench_fixed(iters=5):
    """Isolate the per-grid-step fixed cost: near-zero compute per step."""
    for tiles, rows in ((675, 8), (169, 8), (169, 32), (85, 64)):
        global TILES
        saved = TILES
        TILES = tiles
        bench_sweep(rows, 2, "unrolled", iters=iters,
                    label=f"fixed-cost probe tiles={tiles} rows={rows} segs=2")
        TILES = saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", default=None,
                    help="comma list: sweep,fixed,exotic,dma")
    args = ap.parse_args()
    it = args.iters
    only = set(args.only.split(",")) if args.only else None

    print(f"platform: {jax.devices()[0].platform} {jax.devices()[0]}")
    if only is not None:
        if "fixed" in only:
            bench_fixed(iters=it)
        if "dma" in only:
            bench_dma(30, 32, iters=it)
            bench_dma(80, 32, iters=it)
            bench_dma(8, 32, iters=it)
        if "exotic" in only:
            bench_exotic(iters=it)
        if "crossprod" in only:
            bench_crossprod(8, 10, 24, iters=it)
            bench_crossprod(16, 10, 24, iters=it)
            bench_crossprod(32, 10, 24, iters=it)
            bench_crossprod(32, 5, 24, iters=it)
        if "stage" in only:
            bench_xla_page_gather(100, iters=it)
            bench_xla_page_gather(200, iters=it)
            bench_xla_page_gather(400, iters=it)
        if "stage2" in only:
            bench_xla_super_gather(1, 200, iters=it)
            bench_xla_super_gather(4, 50, iters=it)
            bench_xla_super_gather(8, 25, iters=it)
            bench_xla_super_gather(32, 8, iters=it)
        return
    # 1. reproduce the round-1 measurement (10 taps/px, 1 channel, 32 segs)
    bench_sweep(240, 32, "unrolled", iters=it,
                label="r1 baseline: rows=240 segs=32 unrolled")
    # 2. op-granularity curve at fixed total work
    bench_sweep(48, 32, "unrolled", iters=it)
    bench_sweep(960, 32, "unrolled", iters=it)
    # 3. segment-count scaling (the sweep-cost axis)
    bench_sweep(240, 64, "unrolled", iters=it)
    bench_sweep(240, 128, "unrolled", iters=it)
    # 4. dynamic trip counts: same capacity, fraction actually swept
    bench_sweep(240, 32, "fori", dyn_frac=1.0, iters=it)
    bench_sweep(240, 32, "fori", dyn_frac=0.25, iters=it)
    bench_sweep(240, 512, "fori", dyn_frac=0.125, iters=it,
                label="cap 512 segs, 64 active (texcache shape)")
    # 5. exotic lowerings
    bench_exotic(iters=it)
    # 6. staging DMA
    bench_dma(30, 32, iters=it)
    bench_dma(80, 32, iters=it)


if __name__ == "__main__":
    main()
