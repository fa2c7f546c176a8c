"""Multi-chip frame rendering: the framebuffer sharded across a device mesh.

The reference is a single-GPU program (SURVEY.md §2.8); the TPU rebuild's
scaling axis is the screen: a 1D `jax.sharding.Mesh` over axis ``"sp"``
(screen/space parallelism — the renderer's analog of data parallelism) splits
the framebuffer into row bands. The frame is one jit in two regimes:

* **shard_map band render** — each chip runs the (cheap, replicated)
  frustum cull + vertex transform + triangle setup, bins triangles against
  *its* rows only, and rasterizes + G-buffer-shades + deferred-shades its
  band (the heavy, perfectly parallel work). The band leaves the shard_map
  still sharded (`out_specs=P("sp")`) — no gather, no replication.
* **GSPMD post chain** — bloom, auto-exposure and tone mapping run as
  ordinary global-semantics ops annotated with row shardings
  (`ops/bloom.bloom(row_sharding=...)`): the partitioner keeps every
  full-/half-res blur row-parallel and auto-inserts the 4-row halo
  exchanges and the exposure psum as ICI collectives. Only the tiny deep
  pyramid mips (<1% of pixel work) replicate.

Feature parity with the single-chip pipeline is BY CONSTRUCTION:
`build_sharded_frame(mesh, pipe)` reads every knob (fused G-buffer path,
raster split caps, texture/env cache budgets, LOD cascade, light-tile
kernel) off the `DeferredRenderPipeline` it shards, and the band body calls
the same `pipeline.stages` / `ops.gbuffer` entry points the single-chip
graph does — so a kernel added to the pipeline is automatically the one
the sharded frame multiplies (the round-3 drift this API closes).

Scene buffers and lights are replicated (tens of MB — the natural choice at
this scale; texture-atlas sharding over a second axis is the growth path).
Culling runs ON DEVICE (replicated, vectorized AABB-vs-planes) exactly like
the single-chip Cull pass, so the host uploads only bounds + matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import bloom as bloom_ops
from ..ops import common, gbuffer, postprocess
from ..pipeline import stages


def build_sharded_frame(mesh: Mesh, pipe, collect_stats: bool = False):
    """jit(frame) rendering `pipe`'s scene row-band-sharded over mesh axis
    'sp', with the SAME kernels and knobs as `pipe`'s single-chip graph.

    frame(buffers, model_mats, normal_mats, instance_bounds, light_bounds,
          frustum_planes, view, inv_view, view_proj, camera_pos,
          prev_avg_lum, delta_time)
      -> (rgb8 (H, W, 3) row-sharded, avg_luminance)
      [+ (bin_counts (tiles,), tex_approx, light_trunc) with collect_stats]

    Frustum culling happens on device inside the band body (replicated) —
    the host ships bounds and matrices only, matching the single-chip Cull
    pass. Bands pad to whole tiles internally (H must split into n_dev
    equal bands; each band's canvas rounds up to the tile grid and crops
    back), so 1080p runs on 8 chips (135-row bands on a 144-row canvas).
    """
    n_dev = mesh.shape["sp"]
    cfg = pipe.config
    w, h = cfg.width, cfg.height
    tile_h, tile_w, bin_cap = pipe.tile_h, pipe.tile_w, pipe.bin_cap
    assert h % n_dev == 0, f"height {h} must split into {n_dev} equal bands"
    band_h = h // n_dev
    band_rh = -(-band_h // tile_h) * tile_h  # pad-to-tile band canvas
    rw = -(-w // tile_w) * tile_w
    env_ids = pipe.env_ids
    from ..ops import texcache as _texcache

    band_tile = _texcache.pick_tile(band_rh, rw)
    use_tex_kernel = pipe.use_tex_kernel and band_tile is not None
    use_fused = (
        pipe.use_fused_gbuffer and use_tex_kernel
        and tile_w % 128 == 0 and tile_h % 2 == 0
    )
    if band_tile is None:
        env_ids = None
    # the fused deferred back half follows the pipeline's own gate (<=64
    # lights, no light-tile kernel), band-gated on env content like the rest
    use_fused_deferred = (
        use_fused and getattr(pipe, "use_fused_deferred", False)
        and env_ids is not None
    )

    def band_render(
        buffers, model_mats, normal_mats, instance_bounds, light_bounds,
        frustum_planes, view, inv_view, view_proj, camera_pos,
    ):
        band = jax.lax.axis_index("sp")
        y0 = (band * band_h).astype(jnp.float32)

        # device-side frustum cull (replicated — the single-chip Cull pass);
        # pool-padding rows (zero AABBs at the origin) are masked off by
        # index exactly like the Cull pass's [:n] slice
        n_inst, n_lgt = pipe.packed.instance_count, pipe.packed.light_count
        instance_visible = common.frustum_cull_aabbs(
            frustum_planes, instance_bounds[:, 0], instance_bounds[:, 1]
        ) & (jnp.arange(instance_bounds.shape[0]) < n_inst)
        light_valid = common.frustum_cull_aabbs(
            frustum_planes, light_bounds[:, 0], light_bounds[:, 1]
        ) & (jnp.arange(light_bounds.shape[0]) < n_lgt)

        # replicated vertex/setup work (small vs. per-pixel work); the heavy
        # per-pixel stages below are the SAME functions the single-chip
        # pipeline runs (pipeline.stages), with y_offset/band plumbing — the
        # only sharding-specific code here is the mesh glue.
        setup, vattrs = stages.geometry(
            buffers, model_mats, normal_mats, instance_visible, view_proj,
            w, h,
        )
        bins = stages.binning(
            setup, rw, band_rh, tile_h, tile_w, bin_cap, y_offset=y0
        )
        if use_fused:
            (tri_id, depth, pl_tiles, id_tiles,
             z_tiles) = stages.rasterize_interp(
                setup, bins, buffers, vattrs, rw, band_rh, tile_h, tile_w,
                y_offset=y0, pallas_interpret=pipe.pallas_interpret,
                return_tiled=True, raster_caps=pipe.raster_caps,
            )
            out_gb = gbuffer.gbuffer_shade_fused(
                tri_id, depth, pl_tiles, id_tiles, buffers["atlas"],
                band_rh, rw, tile_h, tile_w, pipe.texture_filter,
                tex_interpret=pipe.pallas_interpret,
                tex_caps=pipe.tex_caps, tex_cascade=pipe.tex_cascade,
                return_tiled=use_fused_deferred,
            )
            if use_fused_deferred:
                gb, gb_tiles = out_gb
            else:
                gb = out_gb
        elif pipe.use_pallas:
            tri_id, depth, planes = stages.rasterize_interp(
                setup, bins, buffers, vattrs, rw, band_rh, tile_h, tile_w,
                y_offset=y0, pallas_interpret=pipe.pallas_interpret,
                raster_caps=pipe.raster_caps,
            )
            gb = gbuffer.gbuffer_shade_planar(
                tri_id, depth, planes, buffers["atlas"], pipe.texture_filter,
                use_tex_kernel=use_tex_kernel,
                tex_interpret=pipe.pallas_interpret,
                tex_caps=pipe.tex_caps, tex_cascade=pipe.tex_cascade,
            )
        else:
            tri_id, depth = stages.rasterize(
                setup, bins, rw, band_rh, tile_h, tile_w, pipe.use_pallas,
                y_offset=y0, pallas_interpret=pipe.pallas_interpret,
            )
            gb = stages.gbuffer_shade(
                tri_id, depth, setup, buffers, vattrs, rw, band_rh,
                texture_filter=pipe.texture_filter, y_offset=y0,
                use_tex_kernel=use_tex_kernel,
                tex_interpret=pipe.pallas_interpret,
                tex_caps=pipe.tex_caps, tex_cascade=pipe.tex_cascade,
            )
        active = stages.active_lights(
            buffers, light_valid, view, pipe.max_active_lights
        )
        if use_fused_deferred:
            # the round-4 fully-fused back half, per band: the kernel's pixel
            # coordinates ride y_offset/full_height exactly like the XLA path
            rt_band, env_approx = stages.deferred_shade_fused(
                gb_tiles, z_tiles, id_tiles, buffers, active, inv_view,
                camera_pos, cfg, rw, band_rh, tile_h, tile_w, env_ids,
                y_offset=y0, full_height=h, full_width=w,
                env_budget=pipe.env_budget,
                env_interpret=pipe.pallas_interpret,
            )
        else:
            rt_band, env_approx = stages.deferred_shade(
                gb, buffers, active, inv_view, camera_pos, cfg, rw, band_rh,
                y_offset=y0, full_height=h, full_width=w,
                env_ids=env_ids,
                env_tile=band_tile if env_ids is not None else None,
                env_interpret=pipe.pallas_interpret,
                env_budget=pipe.env_budget, return_env_approx=True,
                light_tile=pipe.light_tile, light_cap=pipe.light_cap,
            )
        rt_band = rt_band[:band_h, :w]  # crop the band's pad-to-tile canvas
        if not collect_stats:
            return rt_band
        tex_approx = (gb.tex_approx if gb.tex_approx is not None
                      else jnp.zeros((), jnp.int32))
        if pipe.light_tile is not None:
            from ..ops import lights_pallas

            th, tw = pipe.light_tile
            _, counts = lights_pallas.tile_light_lists(
                active, band_rh // th, rw // tw, th, tw, w, h,
                cfg.fov, cfg.ratio, cfg.near, cfg.far, pipe.light_cap,
                y_offset=y0,
            )
            trunc = jnp.maximum(counts - pipe.light_cap, 0).max()
        else:
            trunc = jnp.zeros((), jnp.int32)
        return (rt_band, bins.counts, tex_approx[None], trunc[None],
                env_approx[None])

    out_specs = ((P("sp"),) * 5 if collect_stats else P("sp"))
    shard_fn = jax.shard_map(
        band_render,
        mesh=mesh,
        in_specs=(P(),) * 10,
        out_specs=out_specs,
        check_vma=False,
    )

    sp = NamedSharding(mesh, P("sp"))

    def frame(
        buffers, model_mats, normal_mats, instance_bounds, light_bounds,
        frustum_planes, view, inv_view, view_proj, camera_pos,
        prev_avg_lum, delta_time,
    ):
        out = shard_fn(
            buffers, model_mats, normal_mats, instance_bounds, light_bounds,
            frustum_planes, view, inv_view, view_proj, camera_pos,
        )
        rt = out[0] if collect_stats else out
        rt = jax.lax.with_sharding_constraint(rt, sp)

        # post chain: global-semantics ops, row-sharded by GSPMD (bloom
        # crosses band boundaries only through 4-row blur halos and the
        # tiny deep mips; exposure is a global reduction -> psum)
        if cfg.enable_bloom:
            rt = bloom_ops.bloom(rt, row_sharding=sp)
        avg = postprocess.average_luminance_direct(
            rt, float(w * h), prev_avg_lum, delta_time
        )
        img = postprocess.tone_map(rt, avg)
        rgb8 = jax.lax.with_sharding_constraint(
            (img * 255.0 + 0.5).astype(jnp.uint8), sp
        )
        if collect_stats:
            # tex/env approx taps sum across chips; tile-overflow maxes
            return (rgb8, avg, out[1], out[2].sum(), out[3].max(),
                    out[4].sum())
        return rgb8, avg

    return jax.jit(frame)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("sp",))
