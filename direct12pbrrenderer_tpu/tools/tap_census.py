"""Texture-cache page-budget census: measure realized tap demand, size caps.

The texture cache's page budgets (`cap_lo`/`cap_hi`,
`ops/texcache.sample_atlas_tiled`) shape the per-frame staging gather
(budget x 2 KB x tiles — ~1 GB/frame at the worst-case defaults 92/44 at
1080p) and the cover kernel's merge cost. This tool renders a scene's tap
stream through the EXACT kernel addressing (`gbuffer.tap_query` +
`texcache.tap_census`) over a sweep of camera poses and reports, per
trilinear half, the realized distinct-page demand and a SEG_CHUNK-aligned
recommended (cap_lo, cap_hi) to pass to `DeferredRenderPipeline(tex_caps=…)`.

Under-sized caps are safe — taps degrade to the texture's coarsest-mip
average color and are counted by the `tex_approx` honesty stat — so sizing
from a pose sweep with headroom is the right trade for production scenes.

Usage:
  python -m direct12pbrrenderer_tpu.tools.tap_census \
      [--asset-root DIR] [--width W --height H] [--poses N] [--headroom F]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def census_for_pose(pipe, camera):
    """One frame's tap census dict (see texcache.tap_census)."""
    from ..ops import gbuffer as gbuffer_ops
    from ..ops import texcache
    from ..pipeline import stages

    w, h = pipe.render_w, pipe.render_h
    p = pipe.packed
    planes = camera.frustum_planes()
    buffers = pipe.buffers
    model_mats = jnp.asarray(p.model_mats)
    normal_mats = jnp.asarray(
        np.ascontiguousarray(np.transpose(p.inv_model_mats[:, :3, :3],
                                          (0, 2, 1)))
    )
    visible = jnp.asarray(p.instance_visibility(planes))
    view_proj = jnp.asarray(camera.projection_matrix() @ camera.view_matrix())

    setup, vattrs = stages.geometry(
        buffers, model_mats, normal_mats, visible, view_proj, w, h
    )
    bins = stages.binning(setup, w, h, pipe.tile_h, pipe.tile_w, pipe.bin_cap)
    tri_id, depth = stages.rasterize(
        setup, bins, w, h, pipe.tile_h, pipe.tile_w, use_pallas=False
    )
    tri_rows = stages.pack_rows64(setup, buffers, vattrs)
    interp, matrow, mask = gbuffer_ops.interp_from_rows(
        tri_id, tri_rows, w, h
    )
    tex, u, v, lod5, active = gbuffer_ops.tap_query(
        interp, matrow, mask, buffers["atlas"],
        use_tex_kernel=jax.default_backend() != "cpu",
    )
    return texcache.tap_census(
        buffers["atlas"], tex, u, v, lod5, active,
        filter=pipe.texture_filter,
    )


def env_census_for_pose(pipe, camera):
    """One frame's env-page-cache census: realized distinct-page demand of
    the EXACT tap groups deferred_shade builds (`shading.env_tap_groups`
    over the rendered G-buffer). Requires the pipeline's env kernel path
    (pipe.env_ids is not None)."""
    from ..ops import common, envcache, shading
    from ..pipeline import stages

    w, h = pipe.render_w, pipe.render_h
    p = pipe.packed
    cfg = pipe.config
    buffers = pipe.buffers
    planes = camera.frustum_planes()
    model_mats = jnp.asarray(p.model_mats)
    normal_mats = jnp.asarray(
        np.ascontiguousarray(np.transpose(p.inv_model_mats[:, :3, :3],
                                          (0, 2, 1)))
    )
    visible = jnp.asarray(p.instance_visibility(planes))
    view_proj = jnp.asarray(camera.projection_matrix() @ camera.view_matrix())

    setup, vattrs = stages.geometry(
        buffers, model_mats, normal_mats, visible, view_proj, w, h
    )
    bins = stages.binning(setup, w, h, pipe.tile_h, pipe.tile_w, pipe.bin_cap)
    tri_id, depth = stages.rasterize(
        setup, bins, w, h, pipe.tile_h, pipe.tile_w, use_pallas=False
    )
    gb = stages.gbuffer_shade(
        tri_id, depth, setup, buffers, vattrs, w, h,
        texture_filter=pipe.texture_filter,
    )
    normal = common.decode_octahedron(gb.normal_oct)
    _, _, _, n_dot_v, refl, ray = shading.pixel_view_geometry(
        gb.depth, normal, jnp.asarray(camera.world_matrix()),
        jnp.asarray(camera.position, jnp.float32), w, h,
        cfg.fov, cfg.ratio, cfg.near, cfg.far,
        full_height=cfg.height, full_width=cfg.width,
    )
    tex5, mip5, uq, vq, act, _fb, caps, *_ = shading.env_tap_groups(
        refl, ray, gb.rough_metal_ao[..., 0], n_dot_v, gb.mask, pipe.env_ids
    )
    th, tw = pipe.env_tile
    return envcache.tap_census(pipe.env_atlas, tex5, mip5, uq, vq, act,
                               tile_h=th, tile_w=tw, caps=caps)


def run_census(pipe, camera, poses: int = 8, yaw_sweep_deg: float = 360.0,
               headroom: float = 1.5):
    """Census over a yaw sweep from the given start pose; returns
    (per-pose census list, recommended (cap_lo, cap_hi), per-pose env
    census list — empty when the env kernel path is off)."""
    from ..ops import texcache

    results, env_results = [], []
    step = yaw_sweep_deg / max(poses, 1) * np.pi / 180.0
    for i in range(poses):
        if i:
            camera.rotate(0.0, step, 0.0)
        results.append(census_for_pose(pipe, camera))
        if getattr(pipe, "env_ids", None) is not None:
            env_results.append(env_census_for_pose(pipe, camera))
    return results, texcache.recommend_caps(results, headroom=headroom), \
        env_results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--asset-root", default="/root/reference/DeferredRendering")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--poses", type=int, default=8)
    ap.add_argument("--headroom", type=float, default=1.5)
    args = ap.parse_args()

    from ..app.app import App, AppConfig

    app = App(
        AppConfig(
            asset_root=args.asset_root,
            width=args.width,
            height=args.height,
            bin_cap=2048,
            tile_h=24,
            tile_w=128,
        )
    )
    censuses, caps, env_censuses = run_census(
        app.pipeline, app.camera, poses=args.poses, headroom=args.headroom
    )
    for i, c in enumerate(censuses):
        print(f"pose {i}: lo max={c['lo']['max']} p99={c['lo']['p99']} "
              f"mean={c['lo']['mean']:.1f} | hi max={c['hi']['max']} "
              f"p99={c['hi']['p99']} mean={c['hi']['mean']:.1f} | "
              f"tile_total max={c['tile_total']['max']} "
              f"p99={c['tile_total']['p99']} "
              f"mean={c['tile_total']['mean']:.0f}")
    for i, c in enumerate(env_censuses):
        print(f"env pose {i}: group max={c['group']['max']} "
              f"p99={c['group']['p99']} mean={c['group']['mean']:.1f} | "
              f"tile_total max={c['tile_total']['max']} "
              f"p99={c['tile_total']['p99']} "
              f"mean={c['tile_total']['mean']:.0f}")
    from ..ops import envcache, texcache

    print(json.dumps({
        "cap_lo": caps[0], "cap_hi": caps[1],
        "stage_budget": texcache.recommend_budget(
            censuses, headroom=args.headroom
        ),
        "env_budget": envcache.recommend_budget(
            env_censuses, headroom=args.headroom
        ) if env_censuses else None,
        "headroom": args.headroom, "poses": args.poses,
        "width": args.width, "height": args.height,
    }))


if __name__ == "__main__":
    main()
