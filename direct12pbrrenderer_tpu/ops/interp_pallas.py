"""Pallas attribute-interpolation kernel.

Given the raster id-buffer, produce the perspective-correct interpolated
vertex attributes (uv, normal, tangent) and the material block for every
pixel — without any per-pixel HBM gathers. Each tile re-walks its (already
staged) bin list; the winning triangle's values are extracted with masked
sublane reduces (`match = row_id == pixel_id`), so all data movement is
sequential block DMA + VPU arithmetic.

Orientation: pixels on the LANE axis ((1, p) vectors), triangles on the
SUBLANE axis ((CHUNK, p) work arrays) — column slices of the (CHUNK, 64) row
block are free, and the final (1, p) accumulators write straight into
(tiles, K, p) planar outputs with zero relayout.

Row layout (pack_interp_rows, 64 floats per triangle):
  [0:9   edges e0,e1,e2 (a,b,c each)
   9:12  inv_w_i * inv_area  (premultiplied perspective weights)
   12    triangle id (f32)
   13:16 pad
   16:24 vertex-0 attrs: uv(2) normal(3) tangent(3)
   24:32 vertex-1 attrs
   32:40 vertex-2 attrs
   40:56 material row (pack_material_rows)
   56:64 pad]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raster

CHUNK = 8  # sublane-dim chunk of triangles per step


def pack_interp_rows(setup: raster.TriangleSetup, vertex_attrs, tris, mat_rows,
                     tri_material) -> jnp.ndarray:
    """(T, 64) interpolation rows (see module docstring)."""
    t = setup.edges.shape[0]
    e = setup.edges.reshape(t, 9)
    # homogeneous edge scores ARE the perspective weights -> unit multipliers
    iwa = jnp.ones((t, 3), jnp.float32)
    tri_id = jnp.arange(t, dtype=jnp.float32)[:, None]
    va = vertex_attrs[tris]  # (T, 3, 8)
    mat = mat_rows[tri_material]  # (T, 16)
    pad3 = jnp.zeros((t, 3), jnp.float32)
    pad8 = jnp.zeros((t, 8), jnp.float32)
    return jnp.concatenate(
        [e, iwa, tri_id, pad3, va.reshape(t, 24), mat, pad8], axis=1
    )


def _kernel(counts_ref, yoff_ref, rows_ref, ids_ref, out_ref, *,
            tile_h, tile_w, tiles_x, cap):
    tile = pl.program_id(0)
    p = tile_h * tile_w

    ox = ((tile % tiles_x) * tile_w).astype(jnp.float32)
    oy = ((tile // tiles_x) * tile_h).astype(jnp.float32) + yoff_ref[0]
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (lin % tile_w).astype(jnp.float32) + 0.5 + ox  # (1, p)
    py = (lin // tile_w).astype(jnp.float32) + 0.5 + oy

    pix_id = ids_ref[0, :, :].astype(jnp.float32)  # (1, p) winner ids

    count = jnp.minimum(counts_ref[tile], cap)
    n_chunks = (count + CHUNK - 1) // CHUNK

    def body(c, acc):
        base = pl.multiple_of(c * CHUNK, 8)
        t = rows_ref[0, pl.ds(base, CHUNK), :]  # (CHUNK, 64)

        def col(j):
            return t[:, j : j + 1]  # (CHUNK, 1)

        match = col(12) == pix_id  # (CHUNK, p) — winner row at its pixels
        s0 = col(0) * px + col(1) * py + col(2)
        s1 = col(3) * px + col(4) * py + col(5)
        s2 = col(6) * px + col(7) * py + col(8)
        w0 = s0 * col(9)
        w1 = s1 * col(10)
        w2 = s2 * col(11)
        inv_sum = jnp.where(match, 1.0 / (w0 + w1 + w2), 0.0)

        new = list(acc)
        for k in range(8):  # perspective-interpolated vertex attributes
            val = (w0 * col(16 + k) + w1 * col(24 + k) + w2 * col(32 + k)) * inv_sum
            new[k] = acc[k] + val.sum(axis=0, keepdims=True)  # (1, p)
        for m in range(16):  # per-triangle material constants
            val = jnp.where(match, col(40 + m), 0.0)
            new[8 + m] = acc[8 + m] + val.sum(axis=0, keepdims=True)
        return new

    init = [jnp.zeros((1, p), jnp.float32) for _ in range(24)]
    acc = jax.lax.fori_loop(0, n_chunks, body, init)
    for k in range(24):
        out_ref[0, k, :] = acc[k][0, :]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "interpret"),
)
def interpolate_pallas(
    tri_id_img,          # (H, W) int32 id image from rasterize
    interp_rows,         # (T, 64) from pack_interp_rows
    bins: raster.Bins,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    y_offset=0,
    interpret: bool = False,
):
    """-> (24, H, W) planes: 8 interpolated attrs ++ 16 material values.

    Background pixels (id -1) come out zero in every plane."""
    tiles_y = height // tile_h
    tiles_x = width // tile_w
    num_tiles = tiles_y * tiles_x
    p = tile_h * tile_w
    cap = bins.ids.shape[1]

    bins_rows = interp_rows[jnp.maximum(bins.ids, 0)]  # (tiles, cap, 64)
    pad_row = jnp.zeros((64,), jnp.float32).at[12].set(-2.0)  # never matches
    bins_rows = jnp.where((bins.ids >= 0)[..., None], bins_rows, pad_row)

    ids_t = (
        tri_id_img.reshape(tiles_y, tile_h, tiles_x, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(num_tiles, 1, p)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, cap, 64), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 24, p), lambda t, *_: (t, 0, 0)),
        ],
    )
    kernel = functools.partial(
        _kernel, tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x, cap=cap
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, 24, p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.minimum(bins.counts, cap),
        jnp.asarray(y_offset, jnp.float32).reshape(1),
        bins_rows,
        ids_t,
    )
    # (tiles, 24, p) -> (24, H, W)
    planes = (
        out.reshape(tiles_y, tiles_x, 24, tile_h, tile_w)
        .transpose(2, 0, 3, 1, 4)
        .reshape(24, height, width)
    )
    return planes
