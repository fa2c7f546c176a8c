"""Per-pass timing harness — the PIX-marker analog for the TPU renderer.

The reference wraps every pass in PIXScopedEvent GPU markers
(DeferredPipeline.cpp:8 `PIXScope`, used throughout). XLA fuses our whole
frame into one program, so to attribute time per pass we jit each stage from
`pipeline.stages` separately, feed it the (device-resident) outputs of the
previous stage, and time it over N iterations with a FORCED scalar readback
each iteration — `block_until_ready` does not synchronize on remote-attached
platforms, so every stage returns reduced scalars that we pull to host.

Usage:
  python -m direct12pbrrenderer_tpu.tools.profile \
      [--asset-root DIR] [--width W --height H] [--iters N] [--json FILE]

Prints the per-stage table (the live version of docs/PERF.md's table) and one
JSON line with the raw milliseconds.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _scalarize(tree):
    """Reduce every array in a pytree to one f32 scalar (forces execution,
    keeps the per-iteration host readback tiny)."""
    leaves = [
        jnp.sum(x.astype(jnp.float32))
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "astype")
    ]
    return sum(leaves[1:], leaves[0]) if leaves else jnp.float32(0)


def time_stage(fn, args, iters: int, warmup: int = 2):
    """Median wall ms/iter of jit(fn)(*args) with forced scalar readback."""
    jfn = jax.jit(lambda *a: _scalarize(fn(*a)))
    for _ in range(warmup):
        float(jfn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jfn(*args))
        samples.append((time.perf_counter() - t0) * 1000.0)
    return float(np.median(samples))


def profile_pipeline(pipe, camera, iters: int = 5):
    """Per-stage timings (ms) for one frame configuration.

    Returns an ordered {stage: ms} dict. Stage outputs are computed once
    (device-resident) and reused as the next stage's inputs, so each timing
    isolates that stage's cost exactly like a GPU pass marker would.
    """
    from ..ops import bloom as bloom_ops
    from ..ops import postprocess
    from ..pipeline import stages

    cfg = pipe.config
    w, h = cfg.width, cfg.height
    p = pipe.packed
    planes = camera.frustum_planes()
    view = camera.view_matrix()
    normal_mats = np.ascontiguousarray(
        np.transpose(p.inv_model_mats[:, :3, :3], (0, 2, 1))
    )
    buffers = pipe.buffers
    model_mats = jnp.asarray(p.model_mats)
    normal_mats = jnp.asarray(normal_mats)
    visible = jnp.asarray(p.instance_visibility(planes))
    light_valid = jnp.asarray(p.visible_lights(planes))
    view_j = jnp.asarray(view)
    inv_view = jnp.asarray(camera.world_matrix())
    view_proj = jnp.asarray(camera.projection_matrix() @ view)
    cam_pos = jnp.asarray(camera.position)
    dt = jnp.asarray(1.0 / 60.0, jnp.float32)
    prev_avg = jnp.asarray(0.18, jnp.float32)

    timings: dict[str, float] = {}

    def run(name, fn, *args):
        timings[name] = time_stage(fn, args, iters)
        return jax.jit(fn)(*args)

    # rw/rh: the pipeline's pad-to-tile canvas (binning/raster/gbuffer/shade
    # all run on it; geometry stays logical) — profiled stages must use the
    # same dims or they measure different uv/cluster math than the hot path
    rw = getattr(pipe, "render_w", w)
    rh = getattr(pipe, "render_h", h)

    geo = lambda b, m, n, v, vp: stages.geometry(b, m, n, v, vp, w, h)
    setup, vattrs = run("geometry", geo, buffers, model_mats, normal_mats,
                        visible, view_proj)

    binf = lambda s: stages.binning(s, rw, rh, pipe.tile_h, pipe.tile_w, pipe.bin_cap)
    bins = run("binning", binf, setup)

    if getattr(pipe, "use_fused_gbuffer", False):
        # the pipeline's actual hot path (round 4): fused raster + interp,
        # then the fused plan+resolve+shade on the raw tile blocks
        from ..ops import gbuffer as gbuffer_ops

        rastf = lambda s, b, bu, va: stages.rasterize_interp(
            s, b, bu, va, rw, rh, pipe.tile_h, pipe.tile_w,
            pallas_interpret=pipe.pallas_interpret, return_tiled=True,
            raster_caps=pipe.raster_caps,
        )
        tri_id, depth, pl_tiles, id_tiles, z_tiles = run(
            "raster", rastf, setup, bins, buffers, vattrs
        )
        fused_def = getattr(pipe, "use_fused_deferred", False)
        gbf = lambda t, d, plt, idt, b: gbuffer_ops.gbuffer_shade_fused(
            t, d, plt, idt, b["atlas"], rh, rw, pipe.tile_h, pipe.tile_w,
            pipe.texture_filter, tex_interpret=pipe.pallas_interpret,
            tex_caps=pipe.tex_caps,
            tex_cascade=pipe.tex_cascade, return_tiled=fused_def,
        )
        gb = run("gbuffer_shade", gbf, tri_id, depth, pl_tiles, id_tiles,
                 buffers)
        if fused_def:
            gb, gb_tiles = gb
    elif pipe.use_pallas:
        # fused raster + interpolation, then planar G-buffer
        from ..ops import gbuffer as gbuffer_ops

        rastf = lambda s, b, bu, va: stages.rasterize_interp(
            s, b, bu, va, rw, rh, pipe.tile_h, pipe.tile_w,
            pallas_interpret=pipe.pallas_interpret,
            raster_caps=pipe.raster_caps,
        )
        tri_id, depth, planes = run(
            "raster", rastf, setup, bins, buffers, vattrs
        )

        gbf = lambda t, d, p, b: gbuffer_ops.gbuffer_shade_planar(
            t, d, p, b["atlas"], pipe.texture_filter,
            use_tex_kernel=getattr(pipe, "use_tex_kernel", False),
        )
        gb = run("gbuffer_shade", gbf, tri_id, depth, planes, buffers)
    else:
        rastf = lambda s, b: stages.rasterize(
            s, b, rw, rh, pipe.tile_h, pipe.tile_w, pipe.use_pallas,
            pallas_interpret=pipe.pallas_interpret,
            raster_caps=pipe.raster_caps,
        )
        tri_id, depth = run("raster", rastf, setup, bins)

        gbf = lambda t, d, s, b, va: stages.gbuffer_shade(
            t, d, s, b, va, rw, rh, texture_filter=pipe.texture_filter,
            use_tex_kernel=getattr(pipe, "use_tex_kernel", False),
        )
        gb = run("gbuffer_shade", gbf, tri_id, depth, setup, buffers, vattrs)

    lightf = lambda b, lv, v: stages.active_lights(b, lv, v, pipe.max_active_lights)
    active = run("light_cull", lightf, buffers, light_valid, view_j)

    env_ids = getattr(pipe, "env_ids", None)
    if getattr(pipe, "use_fused_deferred", False):
        # the pipeline's actual hot path: one fused kernel from the G-buffer
        # tile blocks to the HDR RT (env resolve + SH + lights + sky)
        defshf = lambda gt, zt, it, b, a, iv, cp: stages.deferred_shade_fused(
            gt, zt, it, b, a, iv, cp, cfg, rw, rh, pipe.tile_h, pipe.tile_w,
            pipe.env_ids, full_height=h, full_width=w,
            env_budget=pipe.env_budget, env_interpret=pipe.pallas_interpret,
        )[0]
        rt = run("deferred_shade", defshf, gb_tiles, z_tiles, id_tiles,
                 buffers, active, inv_view, cam_pos)
        rt = rt[:h, :w]
    else:
        defshf = lambda g, b, a, iv, cp: stages.deferred_shade(
            g, b, a, iv, cp, cfg, rw, rh, full_height=h, full_width=w,
            env_ids=env_ids,
            env_tile=getattr(pipe, "env_tile", None) if env_ids is not None else None,
            env_interpret=pipe.pallas_interpret,
            env_budget=getattr(pipe, "env_budget", None),
            light_tile=getattr(pipe, "light_tile", None),
            light_cap=getattr(pipe, "light_cap", 256),
        )
        rt = run("deferred_shade", defshf, gb, buffers, active, inv_view, cam_pos)
        if isinstance(rt, tuple):
            rt = rt[0]
        rt = rt[:h, :w]

    if cfg.enable_bloom:
        rt = run("bloom", bloom_ops.bloom, rt)

    def post(rt_, prev, dt_):
        avg = postprocess.average_luminance_direct(rt_, float(w * h), prev, dt_)
        out = postprocess.tone_map(rt_, avg)
        return (out * 255.0 + 0.5).astype(jnp.uint8), avg

    run("exposure_tonemap", post, rt, prev_avg, dt)

    # whole-frame reconciliation: the fused frame the pipeline actually runs
    n_frames = max(iters, 2)
    pipe.render(camera, collect_stats=False)  # compile
    np.asarray(pipe.render(camera, collect_stats=False))
    t0 = time.perf_counter()
    img = None
    for _ in range(n_frames):
        img = pipe.render(camera, collect_stats=False)
    np.asarray(img)
    timings["full_frame"] = (time.perf_counter() - t0) * 1000.0 / n_frames
    return timings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--asset-root", default="/root/reference/DeferredRendering")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--tile", type=int, nargs=2, default=(24, 128))
    ap.add_argument("--bin-cap", type=int, default=2048)
    ap.add_argument("--texture-filter", default="trilinear")
    ap.add_argument("--no-tex-kernel", action="store_true")
    ap.add_argument("--no-env-kernel", action="store_true")
    ap.add_argument("--json", default=None, help="also write timings to FILE")
    ap.add_argument(
        "--scene", default="reference", choices=["reference", "stress"],
        help="reference = the asset-tree scene; stress = bench.py's "
             "Sponza-class 262k-triangle terrain at its exact bench config",
    )
    args = ap.parse_args()

    if args.scene == "stress":
        # mirror bench._stress_bench exactly so the stage attribution
        # explains the sponza_class_fps number
        from ..config import RenderConfig
        from ..pipeline.deferred import DeferredRenderPipeline
        from ..scene.camera import Camera
        from .stress_scene import build_stress_scene

        scene = build_stress_scene(cells_x=512, cells_y=256)
        cfg = RenderConfig(width=args.width, height=args.height,
                           max_instances=2)
        pipe = DeferredRenderPipeline(
            scene, cfg, tile_h=args.tile[0], tile_w=args.tile[1],
            bin_cap=8192 if args.bin_cap == 2048 else args.bin_cap,
            atlas_max_dim=256,
        )
        camera = Camera(cfg.fov, cfg.width, cfg.height, cfg.near, cfg.far)
        camera.move([0, 6, 18])
        camera.rotate(0, np.pi, 0.35)
    else:
        from ..app.app import App, AppConfig

        app = App(AppConfig(
            asset_root=args.asset_root, width=args.width, height=args.height,
            tile_h=args.tile[0], tile_w=args.tile[1], bin_cap=args.bin_cap,
        ))
        if args.texture_filter != "trilinear" or args.no_tex_kernel:
            from ..pipeline.deferred import DeferredRenderPipeline
            app.pipeline = DeferredRenderPipeline(
                app.scene, app.pipeline.config, tile_h=args.tile[0],
                tile_w=args.tile[1], bin_cap=args.bin_cap,
                texture_filter=args.texture_filter,
                use_tex_kernel=False if args.no_tex_kernel else None,
            )
        if args.no_env_kernel and app.pipeline.env_ids is not None:
            import jax
            app.pipeline.env_ids = None
            app.pipeline.graph = app.pipeline._build_graph()
            app.pipeline._frame_jit = jax.jit(app.pipeline._frame)
        pipe, camera = app.pipeline, app.camera

    t = profile_pipeline(pipe, camera, iters=args.iters)
    total = sum(v for k, v in t.items() if k != "full_frame")
    print(f"\nPer-stage timings @ {args.width}x{args.height} "
          f"(tile {args.tile[0]}x{args.tile[1]}, bin_cap {args.bin_cap}, "
          f"{args.texture_filter}):\n")
    print(f"| {'stage':<18} | {'ms':>8} |")
    print("|--------------------|----------|")
    for k, v in t.items():
        if k == "full_frame":
            print("|--------------------|----------|")
        print(f"| {k:<18} | {v:8.1f} |")
    print(f"| {'(sum of stages)':<18} | {total:8.1f} |")
    print()
    print(json.dumps({"timings_ms": {k: round(v, 2) for k, v in t.items()}}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"timings_ms": t, "config": vars(args)}, f, indent=1)


if __name__ == "__main__":
    main()
