"""Multi-chip frame rendering: the framebuffer sharded across a device mesh.

The reference is a single-GPU program (SURVEY.md §2.8); the TPU rebuild's
scaling axis is the screen: a 1D `jax.sharding.Mesh` over axis ``"sp"``
(screen/space parallelism — the renderer's analog of data parallelism) splits
the framebuffer into row bands. The frame is one jit in two regimes:

* **shard_map band render** — each chip runs the (cheap, replicated) vertex
  transform + triangle setup, bins triangles against *its* rows only, and
  rasterizes + G-buffer-shades + deferred-shades its band (the heavy,
  perfectly parallel work). The band leaves the shard_map still sharded
  (`out_specs=P("sp")`) — no gather, no replication.
* **GSPMD post chain** — bloom, auto-exposure and tone mapping run as
  ordinary global-semantics ops annotated with row shardings
  (`ops/bloom.bloom(row_sharding=...)`): the partitioner keeps every
  full-/half-res blur row-parallel and auto-inserts the 4-row halo
  exchanges and the exposure psum as ICI collectives. Only the tiny deep
  pyramid mips (<1% of pixel work) replicate.

Scene buffers and lights are replicated (tens of MB — the natural choice at
this scale; texture-atlas sharding over a second axis is the growth path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..ops import bloom as bloom_ops
from ..ops import postprocess
from ..pipeline import stages


def build_sharded_frame(
    mesh: Mesh,
    config: RenderConfig,
    tile_h: int,
    tile_w: int,
    bin_cap: int,
    enable_bloom: bool = True,
    use_pallas: bool | None = None,
    texture_filter: str = "trilinear",
    max_active_lights: int = 64,
    pallas_interpret: bool = False,
    use_tex_kernel: bool | None = None,
    env_ids: tuple | None = None,
    collect_stats: bool = False,
):
    """Returns jit(frame) where raster/shade AND the post chain are
    row-sharded over mesh axis 'sp'. The returned function takes the same
    pytree of buffers as the single-chip pipeline plus per-frame arrays and
    yields an (H, W, 3) uint8 image (row-sharded across the mesh; np.asarray
    assembles it) and the new average-luminance carry. With
    ``collect_stats=True`` it additionally returns the FrameStats triple
    (bin_counts over all tiles, tex_approx_count, light_trunc) the
    single-chip `_frame` reports."""
    n_dev = mesh.shape["sp"]
    w, h = config.width, config.height
    assert h % (n_dev * tile_h) == 0, (
        f"height {h} must split into {n_dev} bands of tile_h={tile_h} tiles"
    )
    band_h = h // n_dev
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    use_pallas = use_pallas and (bin_cap % 128 == 0)
    if use_tex_kernel is None:
        use_tex_kernel = jax.default_backend() not in ("cpu",)
    from ..ops import texcache as _texcache

    band_tile = _texcache.pick_tile(config.height // n_dev, config.width)
    use_tex_kernel = use_tex_kernel and band_tile is not None
    if band_tile is None:
        env_ids = None

    def band_render(
        buffers, model_mats, normal_mats, instance_visible, light_valid,
        view, inv_view, view_proj, camera_pos,
    ):
        band = jax.lax.axis_index("sp")
        y0 = (band * band_h).astype(jnp.float32)

        # replicated vertex/setup work (small vs. per-pixel work); the heavy
        # per-pixel stages below are the SAME functions the single-chip
        # pipeline runs (pipeline.stages), with y_offset/band plumbing — the
        # only sharding-specific code here is the mesh glue.
        setup, vattrs = stages.geometry(
            buffers, model_mats, normal_mats, instance_visible, view_proj, w, h
        )
        bins = stages.binning(
            setup, w, band_h, tile_h, tile_w, bin_cap, y_offset=y0
        )
        tri_id, depth = stages.rasterize(
            setup, bins, w, band_h, tile_h, tile_w, use_pallas, y_offset=y0,
            pallas_interpret=pallas_interpret,
        )
        gb = stages.gbuffer_shade(
            tri_id, depth, setup, buffers, vattrs, w, band_h,
            texture_filter=texture_filter, y_offset=y0,
            use_tex_kernel=use_tex_kernel, tex_interpret=pallas_interpret,
        )
        active = stages.active_lights(buffers, light_valid, view, max_active_lights)
        rt_band = stages.deferred_shade(
            gb, buffers, active, inv_view, camera_pos, config, w, band_h,
            y_offset=y0, full_height=h,
            env_ids=env_ids,
            env_tile=band_tile if env_ids is not None else None,
            env_interpret=pallas_interpret,
        )
        if not collect_stats:
            return rt_band
        tex_approx = (gb.tex_approx if gb.tex_approx is not None
                      else jnp.zeros((), jnp.int32))
        return rt_band, bins.counts, tex_approx[None]

    out_specs = (P("sp"), P("sp"), P("sp")) if collect_stats else P("sp")
    shard_fn = jax.shard_map(
        band_render,
        mesh=mesh,
        in_specs=(P(),) * 9,
        out_specs=out_specs,
        check_vma=False,
    )

    sp = NamedSharding(mesh, P("sp"))

    def frame(
        buffers, model_mats, normal_mats, instance_visible, light_valid,
        view, inv_view, view_proj, camera_pos, prev_avg_lum, delta_time,
    ):
        out = shard_fn(
            buffers, model_mats, normal_mats, instance_visible, light_valid,
            view, inv_view, view_proj, camera_pos,
        )
        rt = out[0] if collect_stats else out
        rt = jax.lax.with_sharding_constraint(rt, sp)

        # post chain: global-semantics ops, row-sharded by GSPMD (bloom
        # crosses band boundaries only through 4-row blur halos and the
        # tiny deep mips; exposure is a global reduction -> psum)
        if enable_bloom:
            rt = bloom_ops.bloom(rt, row_sharding=sp)
        avg = postprocess.average_luminance_direct(
            rt, float(w * h), prev_avg_lum, delta_time
        )
        img = postprocess.tone_map(rt, avg)
        rgb8 = jax.lax.with_sharding_constraint(
            (img * 255.0 + 0.5).astype(jnp.uint8), sp
        )
        if collect_stats:
            return rgb8, avg, out[1], out[2].sum(), jnp.zeros((), jnp.int32)
        return rgb8, avg

    return jax.jit(frame)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("sp",))
