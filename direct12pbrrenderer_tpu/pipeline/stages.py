"""Shared per-band render stages.

One source of truth for the heavy frame stages, used by three consumers:

* `pipeline.deferred.DeferredRenderPipeline` (single chip, full frame =
  one band at y_offset 0),
* `parallel.frame_sharded` (each chip renders its row band at y_offset
  band*band_h inside `shard_map`),
* `tools.profile` (times each stage in isolation).

This mirrors how the reference funnels every draw through one
`DeferredPipeline` pass list regardless of presentation target
(DeferredPipeline.cpp:22-44); keeping a single implementation here is what
keeps the sharded path from drifting from the single-chip one as kernels
evolve.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import clustered, gbuffer, raster, raster_pallas, shading


def geometry(buffers, model_mats, normal_mats, instance_visible, view_proj,
             width: int, height: int):
    """Vertex transform + triangle setup + packed vertex attrs.

    Replicated on every chip in the sharded path (cheap vs. pixel work).
    Mirrors gbuffer.hlsl:75-83 vertex stage + D3D fixed-function setup.
    """
    clip = raster.vertex_transform(
        buffers["positions"], buffers["vtx_instance"], model_mats, view_proj
    )
    nrm_ws = raster.transform_directions(
        buffers["normals"], buffers["vtx_instance"], normal_mats
    )
    tan_ws = raster.transform_directions(
        buffers["tangents"], buffers["vtx_instance"], normal_mats
    )
    tri_ok = buffers["tri_valid_pool"] & instance_visible[buffers["tri_instance"]]
    setup = raster.setup_triangles(clip, buffers["tris"], tri_ok, width, height)
    vattrs = gbuffer.pack_vertex_attrs(buffers["uvs"], nrm_ws, tan_ws)
    return setup, vattrs


def binning(setup, width: int, band_h: int, tile_h: int, tile_w: int,
            bin_cap: int, y_offset=0):
    tiles_y, tiles_x = band_h // tile_h, width // tile_w
    t = setup.aabb.shape[0]
    # large pools: two-level binning cuts the per-tile top_k sort volume by
    # ~T/cap1 (Sponza-class scenes would otherwise spend 100s of ms here)
    if t >= 16384 and tiles_y * tiles_x >= 64:
        return raster.bin_triangles_hier(
            setup, tiles_y, tiles_x, tile_h, tile_w, bin_cap,
            y_offset=y_offset, cap1=min(t, 8 * bin_cap),
        )
    return raster.bin_triangles(
        setup, tiles_y, tiles_x, tile_h, tile_w, bin_cap, y_offset=y_offset,
    )


def rasterize(setup, bins, width: int, band_h: int, tile_h: int, tile_w: int,
              use_pallas: bool, y_offset=0, pallas_interpret: bool = False,
              raster_caps: tuple | None = None):
    if use_pallas:
        cs, hk = raster_caps if raster_caps is not None else (None, None)
        return raster_pallas.rasterize_pallas(
            setup, bins, width, band_h, tile_h, tile_w, y_offset=y_offset,
            interpret=pallas_interpret, cap_small=cs, hot_k=hk,
        )
    return raster.rasterize(
        setup, bins, width, band_h, tile_h, tile_w, y_offset=y_offset
    )


def pack_rows64(setup, buffers, vattrs):
    """The (T, 64) per-triangle row shared by both G-buffer paths:
    [raster row 16 (pack_raster_rows: edges/z/w/id, poisoned when invalid) |
    ConstantBufferInstance material 16 | vertex attr rows 24 |
    aabb ymin/ymax 2 | pad 6] — everything pixel shading needs behind one
    index. Columns 0:9 are the edge rows gbuffer._bary reads; 9:16 only feed
    the fused raster kernel; 56:58 feed its per-band chunk reject (poisoned
    to never-hit when invalid, matching bin_triangles' valid mask)."""
    t = setup.edges.shape[0]
    ymin = jnp.where(setup.valid, setup.aabb[:, 1], 3e38)
    ymax = jnp.where(setup.valid, setup.aabb[:, 3], -3e38)
    return jnp.concatenate(
        [raster_pallas.pack_raster_rows(setup),
         buffers["mat_rows"][buffers["tri_material"]],
         vattrs[buffers["tris"]].reshape(t, 24),
         ymin[:, None], ymax[:, None],
         jnp.zeros((t, 6), jnp.float32)], axis=1,
    )


def rasterize_interp(setup, bins, buffers, vattrs, width: int, band_h: int,
                     tile_h: int, tile_w: int, y_offset=0,
                     pallas_interpret: bool = False,
                     return_tiled: bool = False,
                     raster_caps: tuple | None = None):
    """Fused raster + attribute interpolation (Pallas path): returns
    (tri_id, depth, planes (24, band_h, width)) with planes matching the
    tri_rows[tid]-gather path (exact material columns, interp to FMA
    re-association) — the winning row rides the depth fold's VMEM state
    instead of a per-pixel 256 B HBM gather (docs/PERF.md round-3).

    return_tiled=True yields (tri_id, depth, pl_tiles, id_tiles, z_tiles)
    raw tile blocks for the fused G-buffer path
    (gbuffer.gbuffer_shade_fused) + fused deferred (deferred_shade_fused)."""
    rows64 = pack_rows64(setup, buffers, vattrs)
    cs, hk = raster_caps if raster_caps is not None else (None, None)
    return raster_pallas.rasterize_interp_pallas(
        setup, bins, rows64, width, band_h, tile_h, tile_w,
        y_offset=y_offset, interpret=pallas_interpret,
        return_tiled=return_tiled, cap_small=cs, hot_k=hk,
    )


def gbuffer_shade(tri_id, depth, setup, buffers, vattrs, width: int,
                  band_h: int, texture_filter: str, y_offset=0,
                  use_tex_kernel: bool = False,
                  tex_interpret: bool = False,
                  tex_caps: tuple[int, int] | None = None,
                  tex_cascade: bool = False) -> gbuffer.GBuffer:
    # one 256 B row per triangle carrying EVERYTHING pixel shading needs
    # (edge/bary coefficients, material constants, the 3 vertex attribute
    # rows) -> the per-pixel stage issues ONE gather instead of four
    # (row + tris + 3 vertex rows); per-triangle gathers here are off the
    # per-pixel hot path. The Pallas path avoids even that one gather by
    # fusing the row select into the raster fold (rasterize_interp).
    tri_rows = pack_rows64(setup, buffers, vattrs)
    return gbuffer.gbuffer_shade(
        tri_id, depth, tri_rows, buffers["atlas"],
        width, band_h, y_offset=y_offset, texture_filter=texture_filter,
        use_tex_kernel=use_tex_kernel, tex_interpret=tex_interpret,
        tex_caps=tex_caps, tex_cascade=tex_cascade,
    )


def active_lights(buffers, light_valid, view, max_active: int):
    return clustered.build_active_lights(
        buffers["light_pos"], buffers["light_color"],
        buffers["light_intensity"], buffers["light_attenuation"],
        light_valid, view, max_active,
    )


def deferred_shade_fused(gb_tiles, z_tiles, id_tiles, buffers, active,
                         inv_view, camera_pos, config, width: int,
                         band_h: int, tile_h: int, tile_w: int,
                         env_ids: tuple, y_offset=0,
                         full_height: int | None = None,
                         full_width: int | None = None,
                         env_budget: int | None = None,
                         env_interpret: bool = False,
                         light_dtype: str | None = None):
    """Fused deferred shading straight from the G-buffer tile blocks (env
    resolve + SH + split-sum + in-kernel clustered lights + sky in ONE
    Pallas kernel — ops/shade_pallas.py). Serves the <=64-active-light
    regime; the 1024-light path stays on deferred_shade + lights_pallas.
    Returns ((band_h, width, 3) HDR RT, env_approx_count)."""
    from ..ops import shade_pallas

    return shade_pallas.deferred_shade_fused(
        gb_tiles, z_tiles, id_tiles, buffers["SkyBoxSH"],
        buffers["EnvCache"], active, inv_view, camera_pos, env_ids,
        config.fov, config.ratio, config.near, config.far,
        width, band_h, tile_h, tile_w, y_offset=y_offset,
        full_height=full_height, full_width=full_width,
        env_budget=env_budget, interpret=env_interpret,
        light_dtype=light_dtype,
    )


def deferred_shade(gb: gbuffer.GBuffer, buffers, active, inv_view, camera_pos,
                   config, width: int, band_h: int, y_offset=0,
                   full_height: int | None = None,
                   full_width: int | None = None,
                   env_ids: tuple | None = None,
                   env_tile: tuple | None = None,
                   env_interpret: bool = False,
                   env_budget: int | None = None,
                   return_env_approx: bool = False,
                   light_tile: tuple | None = None,
                   light_cap: int = 256):
    return shading.deferred_shade(
        gb.albedo_emission, gb.normal_oct, gb.rough_metal_ao, gb.depth,
        gb.mask, buffers["SkyBoxSH"], buffers["PrecomputeBRDF"],
        buffers["PrefilterEnvMap"], buffers["SkyBoxTexture"],
        active, inv_view, camera_pos,
        config.fov, config.ratio, config.near, config.far,
        width, band_h, y_offset=y_offset, full_height=full_height,
        full_width=full_width,
        env_cache=buffers.get("EnvCache") if env_ids is not None else None,
        env_ids=env_ids, env_tile=env_tile, env_interpret=env_interpret,
        env_budget=env_budget, return_env_approx=return_env_approx,
        light_tile=light_tile, light_cap=light_cap,
    )
