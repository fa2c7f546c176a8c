"""Pallas TPU rasterizer kernel — the hot inner loop of the tiled raster.

The pure-XLA `raster.rasterize` materializes (tiles, pixels, chunk) score
tensors in HBM each scan step and pays full bin capacity for every tile.
This kernel keeps the whole depth fold in VMEM and uses a *dynamic* per-tile
trip count (from the bin counters, via scalar prefetch), so a tile crossed by
200 triangles does ceil(200/chunk) chunk iterations instead of cap/chunk:

  grid = (num_tiles,)
  scalar prefetch: counts (tiles,), y_offset (1,)
  inputs per tile (auto-DMA'd/pipelined by Mosaic):
    rows_t (1, 16, cap)  pre-gathered, transposed triangle rows
  outputs: zbuf (1, p, 1), idbuf (1, p, 1)

Per chunk the kernel evaluates the three edge functions as (p, 1) x (1, chunk)
broadcast FMAs on the VPU in fp32, folds depth with masked min/argmin, and
resolves the winning id with a one-hot select (no in-kernel gathers at all).

Triangle row layout (pack_raster_rows):
  [ea0,eb0,ec0, ea1,eb1,ec1, ea2,eb2,ec2, z0,z1,z2, w0,w1,w2, id]
with homogeneous edge rows (raster.setup_triangles), z/w the CLIP-space
vertex z and w, and the triangle id stored as f32 (exact below 2^24);
invalid/padded triangles get ec0 = -3e38 (never inside). Depth is
z_ndc = sum(B z)/sum(B w); sum(B w) > 0 and z in [0,1] are rejected
in-kernel (the D3D clip planes, applied per pixel — this is what makes
near-plane-crossing triangles render correctly without a clipping stage).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raster

CHUNK = 128  # lane width: dynamic lane offsets must be 128-aligned for Mosaic


def split_caps(cap: int, num_tiles: int) -> tuple[int, int]:
    """(cap_small, hot_k) for the two-pass raster: every tile renders its
    first cap_small list entries; the hot_k fullest tiles re-render at full
    cap. Tiles beyond hot_k whose count exceeds cap_small are overflow
    (surfaced through the pipeline's bin_overflow stat)."""
    if cap <= 2 * CHUNK:
        return cap, 0
    # cap//4 keeps dense scenes (262k-tri terrain) inside the hot set while
    # the reference scene cuts the pre-gather ~3x. Measured on both bench
    # scenes (hot-set misses surface via bin_overflow).
    cap_small = max(CHUNK, (cap // 4) // CHUNK * CHUNK)
    hot_k = min(num_tiles, max(64, num_tiles // 6))
    return cap_small, hot_k


def pack_raster_rows(setup: raster.TriangleSetup) -> jnp.ndarray:
    """(T, 16) kernel rows from triangle setup (see module docstring)."""
    t = setup.edges.shape[0]
    e = setup.edges.reshape(t, 9)
    ec0 = jnp.where(setup.valid, e[:, 2], -3e38)
    tri_id = jnp.arange(t, dtype=jnp.float32)[:, None]
    return jnp.concatenate(
        [e[:, 0:2], ec0[:, None], e[:, 3:9], setup.z, setup.w_clip, tri_id],
        axis=1,
    )


def _kernel(counts_ref, yoff_ref, rows_ref, z_out, id_out, *,
            tile_h, tile_w, tiles_x, cap):
    _kernel_body(pl.program_id(0), counts_ref[pl.program_id(0)], yoff_ref,
                 rows_ref, z_out, id_out, tile_h=tile_h, tile_w=tile_w,
                 tiles_x=tiles_x, cap=cap)


def _kernel_remap(counts_ref, yoff_ref, ids_ref, rows_ref, z_in, id_in,
                  z_out, id_out, *, tile_h, tile_w, tiles_x, cap):
    """Hot-tile pass: grid step i renders REAL tile ids_ref[i]; z/id buffers
    are aliased in/out so untouched tiles keep the small-cap pass results."""
    i = pl.program_id(0)
    del z_in, id_in  # aliased storage; whole block overwritten below
    _kernel_body(ids_ref[i], counts_ref[i], yoff_ref, rows_ref, z_out,
                 id_out, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
                 cap=cap)


def _kernel_body(tile, count_in, yoff_ref, rows_ref, z_out, id_out, *,
                 tile_h, tile_w, tiles_x, cap):
    p = tile_h * tile_w

    ox = ((tile % tiles_x) * tile_w).astype(jnp.float32)
    oy = ((tile // tiles_x) * tile_h).astype(jnp.float32) + yoff_ref[0]

    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (lin % tile_w).astype(jnp.float32) + 0.5 + ox
    py = (lin // tile_w).astype(jnp.float32) + 0.5 + oy

    count = jnp.minimum(count_in, cap)
    n_chunks = (count + CHUNK - 1) // CHUNK
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    def body(c, carry):
        zbuf, idbuf = carry  # (p, 1)
        base = pl.multiple_of(c * CHUNK, 128)

        def col(j):
            return rows_ref[0, j, pl.ds(base, CHUNK)][None, :]  # (1, CHUNK)

        s0 = px * col(0) + py * col(1) + col(2)
        s1 = px * col(3) + py * col(4) + col(5)
        s2 = px * col(6) + py * col(7) + col(8)
        inside = jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0
        den = s0 * col(12) + s1 * col(13) + s2 * col(14)
        zc = (s0 * col(9) + s1 * col(10) + s2 * col(11)) / jnp.where(
            den == 0.0, 1.0, den
        )
        ok = inside & (den > 0.0) & (zc >= 0.0) & (zc <= 1.0)
        zc = jnp.where(ok, zc, jnp.inf)

        best = jnp.argmin(zc, axis=1, keepdims=True)       # (p, 1), first min
        best_z = jnp.min(zc, axis=1, keepdims=True)        # (p, 1)
        ids = col(15)                                      # (1, CHUNK) f32 ids
        sel = jnp.where(best == lane, ids, 0.0).sum(axis=1, keepdims=True)

        upd = best_z < zbuf
        zbuf = jnp.where(upd, best_z, zbuf)
        idbuf = jnp.where(upd, sel.astype(jnp.int32), idbuf)
        return zbuf, idbuf

    init = (
        jnp.full((p, 1), jnp.inf, jnp.float32),
        jnp.full((p, 1), -1, jnp.int32),
    )
    zbuf, idbuf = jax.lax.fori_loop(0, n_chunks, body, init)
    z_out[0, :, :] = zbuf
    id_out[0, :, :] = idbuf


def _kernel_interp(counts_ref, yoff_ref, rows_ref, z_out, id_out, pl_out, *,
                   tile_h, tile_w, tiles_x, cap):
    _kernel_interp_body(pl.program_id(0), counts_ref[pl.program_id(0)],
                        yoff_ref, rows_ref, z_out, id_out, pl_out,
                        tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x, cap=cap)


def _kernel_interp_remap(counts_ref, yoff_ref, ids_ref, rows_ref, z_in, id_in,
                         pl_in, z_out, id_out, pl_out, *, tile_h, tile_w,
                         tiles_x, cap):
    i = pl.program_id(0)
    del z_in, id_in, pl_in  # aliased storage; whole block overwritten below
    _kernel_interp_body(ids_ref[i], counts_ref[i], yoff_ref, rows_ref, z_out,
                        id_out, pl_out, tile_h=tile_h, tile_w=tile_w,
                        tiles_x=tiles_x, cap=cap)


def _kernel_interp_body(tile, count_in, yoff_ref, rows_ref, z_out, id_out,
                        pl_out, *, tile_h, tile_w, tiles_x, cap):
    """Depth fold + winning-row select + in-kernel attribute interpolation.

    Identical visibility to _kernel_body, plus: each chunk's per-pixel winner
    row (all 64 columns) is selected by a one-hot MXU matmul (exact — one
    addend per output, HIGHEST precision) and carried through the fold; after
    the fold the perspective barycentrics and the 8 vertex-attribute channels
    are evaluated with the same formulas as gbuffer._bary + gbuffer_shade, so
    the output planes match the XLA row-gather path to FMA re-association
    (material columns exactly; interp within ~1e-4). Removes the per-pixel
    256 B tri_rows gather entirely (docs/PERF.md round-3).

    The tile is processed in 8-row BANDS (the VPU sublane height): a chunk
    whose 128 candidates' y-extents (rows 56/57, packed from setup.aabb by
    stages.pack_rows64 with the same strict overlap convention as
    raster.bin_triangles:214) all miss the band is skipped outright. Binning
    only guarantees tile-level overlap; at the measured p50 bin count of 4
    most (band, chunk) pairs are empty, so this cuts the fold's dominant
    (p x CHUNK) candidate-grid work without changing any per-pixel
    arithmetic (band decomposition is exact — same formulas, same
    associativity, per pixel).

    Row layout (stages.pack_rows64):
      [raster 16 (pack_raster_rows) | material 16 | vertex attrs 24 |
       aabb ymin/ymax 2 | pad 6]
    Output planes (1, 24, p): [interp uv/nrm/tan (8) | material row (16)].
    """
    band_rows = 8 if tile_h % 8 == 0 else tile_h
    nb = tile_h // band_rows
    pb = band_rows * tile_w

    ox = ((tile % tiles_x) * tile_w).astype(jnp.float32)
    oy = ((tile // tiles_x) * tile_h).astype(jnp.float32) + yoff_ref[0]

    count = jnp.minimum(count_in, cap)
    n_chunks = (count + CHUNK - 1) // CHUNK
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    lin = jax.lax.broadcasted_iota(jnp.int32, (pb, 1), 0)
    px = (lin % tile_w).astype(jnp.float32) + 0.5 + ox
    py0 = (lin // tile_w).astype(jnp.float32) + 0.5 + oy

    for b in range(nb):
        band_lo = oy + (b * band_rows)
        band_hi = band_lo + band_rows
        py = py0 + float(b * band_rows)

        def body(c, carry):
            base = pl.multiple_of(c * CHUNK, 128)
            # band reject on the candidates' y-extents alone (2 sublanes)
            ymm = rows_ref[0, 56:58, pl.ds(base, CHUNK)]   # (2, CHUNK)
            hit = (ymm[0] < band_hi) & (ymm[1] > band_lo)

            def fold(carry):
                zbuf, idbuf, rowbuf = carry  # (pb, 1), (pb, 1), (pb, 64)
                chunk = rows_ref[0, :, pl.ds(base, CHUNK)]  # (64, CHUNK)

                def col(j):
                    return chunk[j][None, :]               # (1, CHUNK)

                s0 = px * col(0) + py * col(1) + col(2)
                s1 = px * col(3) + py * col(4) + col(5)
                s2 = px * col(6) + py * col(7) + col(8)
                inside = jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0
                den = s0 * col(12) + s1 * col(13) + s2 * col(14)
                zc = (s0 * col(9) + s1 * col(10) + s2 * col(11)) / jnp.where(
                    den == 0.0, 1.0, den
                )
                ok = inside & (den > 0.0) & (zc >= 0.0) & (zc <= 1.0)
                zc = jnp.where(ok, zc, jnp.inf)

                best = jnp.argmin(zc, axis=1, keepdims=True)  # first min
                best_z = jnp.min(zc, axis=1, keepdims=True)   # (pb, 1)
                ids = col(15)
                sel = jnp.where(best == lane, ids, 0.0).sum(
                    axis=1, keepdims=True)

                upd = best_z < zbuf
                onehot = ((best == lane) & upd).astype(jnp.float32)
                row_sel = jax.lax.dot_general(
                    onehot, chunk,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )                                          # (pb, 64) exact
                zbuf = jnp.where(upd, best_z, zbuf)
                idbuf = jnp.where(upd, sel.astype(jnp.int32), idbuf)
                rowbuf = jnp.where(upd, row_sel, rowbuf)
                return zbuf, idbuf, rowbuf

            return jax.lax.cond(jnp.any(hit), fold, lambda cr: cr, carry)

        init = (
            jnp.full((pb, 1), jnp.inf, jnp.float32),
            jnp.full((pb, 1), -1, jnp.int32),
            jnp.zeros((pb, 64), jnp.float32),
        )
        zbuf, idbuf, rowbuf = jax.lax.fori_loop(0, n_chunks, body, init)
        z_out[0, pl.ds(b * pb, pb), :] = zbuf
        id_out[0, pl.ds(b * pb, pb), :] = idbuf

        # ---- post-fold interpolation, strictly 2-D + tiny MXU contractions
        # (per-column 1-D extractions like rowbuf[:, 3*i] lower to per-vreg
        # shuffle storms that OOM the Mosaic compiler at any grid size)
        #
        # barycentric scores as gbuffer._bary: B_i = e_i . (px, py, 1). Build
        # the (pb, 64) pointwise terms rowbuf * [px|py|1 pattern] once, then
        # contract with constant 0/1 matrices: srep[:, 8v+k] = B_v, sumrep =
        # sum B (all columns equal) — exact one/three-addend sums under
        # HIGHEST precision.
        lane64 = jax.lax.broadcasted_iota(jnp.int32, (pb, 64), 1)
        mod3 = lane64 % 3
        edge = lane64 < 9
        pat = jnp.where(mod3 == 0, px, 0.0)
        pat = jnp.where(mod3 == 1, py, pat)
        pat = jnp.where(mod3 == 2, 1.0, pat)
        prod = rowbuf * jnp.where(edge, pat, 0.0)      # (pb, 64) B-term grid
        j24 = jax.lax.broadcasted_iota(jnp.int32, (64, 24), 0)
        c24 = jax.lax.broadcasted_iota(jnp.int32, (64, 24), 1)
        sel_s = ((j24 // 3 == c24 // 8) & (j24 < 9)).astype(jnp.float32)
        sel_sum = (j24 < 9).astype(jnp.float32)
        dn = (((1,), (0,)), ((), ()))
        srep = jax.lax.dot_general(
            prod, sel_s, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # (pb, 24) B_v per col
        sumrep = jax.lax.dot_general(
            prod, sel_sum, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        lamrep = srep / jnp.where(sumrep == 0.0, 1.0, sumrep)
        wattr = rowbuf[:, 32:56] * lamrep              # (pb, 24) lam_v*a_vk
        # interp channel k = (w0k + w1k) + w2k — same association as the
        # gather path's XLA reduce
        interp8 = (wattr[:, 0:8] + wattr[:, 8:16]) + wattr[:, 16:24]
        pl_out[0, pl.ds(b * pb, pb), :] = jnp.concatenate(
            [interp8, rowbuf[:, 16:32]], axis=1)       # (pb, 24) one store


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret",
                     "cap_small", "hot_k", "return_tiled"),
)
def rasterize_interp_pallas(
    setup: raster.TriangleSetup,
    bins: raster.Bins,
    rows64: jnp.ndarray,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    y_offset=0,
    interpret: bool = False,
    cap_small: int | None = None,
    hot_k: int | None = None,
    return_tiled: bool = False,
):
    """Fused raster + attribute interpolation (same two-pass structure as
    rasterize_pallas). Returns (tri_id (H, W), z (H, W), planes (24, H, W))
    where planes feed gbuffer.gbuffer_shade_planar: channels 0-7 are the
    perspective-interpolated [uv, normal_ws, tangent_ws], 8-23 the winning
    triangle's material row — equal to the tri_rows[tid] gather path up to
    FMA re-association (see _kernel_interp_body).

    With return_tiled=True, returns (tri_id, z, pl_tiles (tiles, p, 24),
    id_tiles (tiles, p, 1), z_tiles (tiles, p, 1)) instead — the kernel's
    raw tile blocks, which the fused G-buffer path
    (texcache.shade_planes_fused) and the fused deferred-shading path
    (ops/shade_pallas.py) consume without ever untiling to (H, W).

    Mirrors gbuffer.hlsl ps_main attribute interpolation (:89-104) done by
    fixed-function hardware on the reference; here it rides the raster fold's
    VMEM state so the per-pixel row gather disappears (docs/PERF.md)."""
    tiles_y = height // tile_h
    tiles_x = width // tile_w
    num_tiles = tiles_y * tiles_x
    p = tile_h * tile_w
    cap = bins.ids.shape[1]
    assert cap % CHUNK == 0, f"bin cap {cap} must be a multiple of {CHUNK}"
    auto_small, auto_hot = split_caps(cap, num_tiles)
    cap_small = auto_small if cap_small is None else cap_small
    hot_k = auto_hot if hot_k is None else min(hot_k, num_tiles)

    pad_row = (
        jnp.zeros((64,), jnp.float32).at[2].set(-3e38).at[15].set(-1.0)
        # y-extent poison: padded lanes never pass the per-band chunk reject
        .at[56].set(3e38).at[57].set(-3e38)
    )

    def gather_rows(ids):
        g = rows64[jnp.maximum(ids, 0)]
        g = jnp.where((ids >= 0)[..., None], g, pad_row)
        return g.transpose(0, 2, 1)             # (n, 64, cap)

    yoff = jnp.asarray(y_offset, jnp.float32).reshape(1)
    counts = jnp.minimum(bins.counts, cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 64, cap_small), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, p, 24), lambda t, *_: (t, 0, 0)),
        ],
    )
    kernel = functools.partial(
        _kernel_interp, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
        cap=cap_small,
    )
    z_tiles, id_tiles, pl_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.int32),
            jax.ShapeDtypeStruct((num_tiles, p, 24), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.minimum(counts, cap_small),
        yoff,
        gather_rows(bins.ids[:, :cap_small]),
    )

    if cap > cap_small:
        hot_counts, hot_idx = jax.lax.top_k(counts, hot_k)
        hot_idx = hot_idx.astype(jnp.int32)
        grid_hot = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(hot_k,),
            in_specs=[
                pl.BlockSpec((1, 64, cap), lambda i, c, y, ids: (i, 0, 0)),
                pl.BlockSpec((1, p, 1), lambda i, c, y, ids: (ids[i], 0, 0)),
                pl.BlockSpec((1, p, 1), lambda i, c, y, ids: (ids[i], 0, 0)),
                pl.BlockSpec((1, p, 24), lambda i, c, y, ids: (ids[i], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, p, 1), lambda i, c, y, ids: (ids[i], 0, 0)),
                pl.BlockSpec((1, p, 1), lambda i, c, y, ids: (ids[i], 0, 0)),
                pl.BlockSpec((1, p, 24), lambda i, c, y, ids: (ids[i], 0, 0)),
            ],
        )
        kernel_hot = functools.partial(
            _kernel_interp_remap, tile_h=tile_h, tile_w=tile_w,
            tiles_x=tiles_x, cap=cap,
        )
        z_tiles, id_tiles, pl_tiles = pl.pallas_call(
            kernel_hot,
            grid_spec=grid_hot,
            out_shape=[
                jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.float32),
                jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.int32),
                jax.ShapeDtypeStruct((num_tiles, p, 24), jnp.float32),
            ],
            # inputs: 3 scalar-prefetch operands, then rows, z, id, planes
            input_output_aliases={4: 0, 5: 1, 6: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            hot_counts,
            yoff,
            hot_idx,
            gather_rows(bins.ids[hot_idx]),
            z_tiles,
            id_tiles,
            pl_tiles,
        )

    def untile(tiles, ch=None):
        if ch is None:
            return (
                tiles.reshape(tiles_y, tiles_x, tile_h, tile_w)
                .transpose(0, 2, 1, 3)
                .reshape(height, width)
            )
        # channel-LAST tile blocks (the kernel's single contiguous store)
        return (
            tiles.reshape(tiles_y, tiles_x, tile_h, tile_w, ch)
            .transpose(4, 0, 2, 1, 3)
            .reshape(ch, height, width)
        )

    z_img = untile(z_tiles)
    id_img = untile(id_tiles)
    z_img = jnp.where(jnp.isinf(z_img), 1.0, z_img)
    if return_tiled:
        return id_img, z_img, pl_tiles, id_tiles, z_tiles
    planes = untile(pl_tiles, 24)
    return id_img, z_img, planes


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret",
                     "cap_small", "hot_k"),
)
def rasterize_pallas(
    setup: raster.TriangleSetup,
    bins: raster.Bins,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    y_offset=0,
    interpret: bool = False,
    cap_small: int | None = None,
    hot_k: int | None = None,
):
    """Drop-in replacement for raster.rasterize (same outputs).

    Two passes: tiles are mostly near-empty (reference scene @1080p: 22k
    live bin entries vs 675 x 2048 = 1.38M padded slots, p90 count 92), and
    the pre-gather pays per SLOT. Pass 1 renders every tile from its first
    `cap_small` list entries; pass 2 re-renders the `hot_k` fullest tiles
    from their full lists, scatter-written over the pass-1 buffers via a
    scalar-prefetched tile-id index map. Cuts the pre-gather ~4x."""
    tiles_y = height // tile_h
    tiles_x = width // tile_w
    num_tiles = tiles_y * tiles_x
    p = tile_h * tile_w
    cap = bins.ids.shape[1]
    assert cap % CHUNK == 0, f"bin cap {cap} must be a multiple of {CHUNK}"
    auto_small, auto_hot = split_caps(cap, num_tiles)
    cap_small = auto_small if cap_small is None else cap_small
    hot_k = auto_hot if hot_k is None else min(hot_k, num_tiles)

    rows = pack_raster_rows(setup)
    # padding slots: poison ec0 (col 2) so they never win, id -1
    pad_row = jnp.zeros((16,), jnp.float32).at[2].set(-3e38).at[15].set(-1.0)

    def gather_rows(ids):
        g = rows[jnp.maximum(ids, 0)]
        g = jnp.where((ids >= 0)[..., None], g, pad_row)
        return g.transpose(0, 2, 1)             # (n, 16, cap)

    yoff = jnp.asarray(y_offset, jnp.float32).reshape(1)
    counts = jnp.minimum(bins.counts, cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 16, cap_small), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0)),
        ],
    )
    kernel = functools.partial(
        _kernel, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
        cap=cap_small,
    )
    z_tiles, id_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.minimum(counts, cap_small),
        yoff,
        gather_rows(bins.ids[:, :cap_small]),
    )

    if cap > cap_small:
        hot_counts, hot_idx = jax.lax.top_k(counts, hot_k)
        hot_idx = hot_idx.astype(jnp.int32)
        grid_hot = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(hot_k,),
            in_specs=[
                pl.BlockSpec((1, 16, cap), lambda i, c, y, ids: (i, 0, 0)),
                pl.BlockSpec((1, p, 1), lambda i, c, y, ids: (ids[i], 0, 0)),
                pl.BlockSpec((1, p, 1), lambda i, c, y, ids: (ids[i], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, p, 1), lambda i, c, y, ids: (ids[i], 0, 0)),
                pl.BlockSpec((1, p, 1), lambda i, c, y, ids: (ids[i], 0, 0)),
            ],
        )
        kernel_hot = functools.partial(
            _kernel_remap, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
            cap=cap,
        )
        z_tiles, id_tiles = pl.pallas_call(
            kernel_hot,
            grid_spec=grid_hot,
            out_shape=[
                jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.float32),
                jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.int32),
            ],
            # aliased z/id carry the pass-1 results for non-hot tiles
            # (inputs: 3 scalar-prefetch operands, then rows, z, id)
            input_output_aliases={4: 0, 5: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            hot_counts,
            yoff,
            hot_idx,
            gather_rows(bins.ids[hot_idx]),
            z_tiles,
            id_tiles,
        )

    z_img = (
        z_tiles.reshape(tiles_y, tiles_x, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(height, width)
    )
    id_img = (
        id_tiles.reshape(tiles_y, tiles_x, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(height, width)
    )
    z_img = jnp.where(jnp.isinf(z_img), 1.0, z_img)
    return id_img, z_img
