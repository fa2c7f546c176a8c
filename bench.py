"""Headline benchmark: frames/sec rendering the reference scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the driver-set north star of 60 FPS at 1920x1080 on a Sponza-class
scene on one TPU v5e chip (BASELINE.json; the reference publishes no numbers
of its own). vs_baseline = fps / 60.

Usage: python bench.py [--smoke] [--frames N] [--width W --height H]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_FPS = 60.0


def main():
    ap = argparse.ArgumentParser()
    # 32 frames: the timed loop carries a ~2-frame constant (pipeline fill +
    # final sync) that at 8 frames understates sustained throughput by ~20%
    # (measured 5.5-6.4 fps at n=8 vs 7.6-7.9 at n=32, same process, 2 reps —
    # docs/PERF.md round-3 close); playback amortizes it, so the bench does.
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--asset-root", default="/root/reference/DeferredRendering")
    ap.add_argument("--texture-filter", default="trilinear",
                    choices=["trilinear", "bilinear", "anisotropic"])
    ap.add_argument(
        "--smoke", action="store_true",
        help="tiny synthetic scene + small frame (CI / CPU smoke run)",
    )
    ap.add_argument(
        "--skip-secondary", action="store_true",
        help="headline metric only (skip the sponza-class + 1k-light runs)",
    )
    args = ap.parse_args()

    if args.smoke:
        import __graft_entry__ as graft

        pipe, cam, _cfg = graft._tiny_pipeline()
        frames = 4
    else:
        from direct12pbrrenderer_tpu.app.app import App, AppConfig

        app = App(
            AppConfig(
                asset_root=args.asset_root,
                width=args.width,
                height=args.height,
                frames=args.frames,
                bin_cap=2048,
                tile_h=24,
                tile_w=128,
            )
        )
        # census-sized env staging budget for this scene: 6-pose yaw sweep
        # @1080p measured worst capped tile-total = 128 pages vs the
        # 184-page full layout (docs/PERF.md) — +1 SEG_CHUNK margin, still
        # bit-exact at every sampled pose. Texcache budget stays worst-case:
        # the bench pose's worst tile realizes the full 720-page layout.
        from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline

        # block_cap=12 (4th tex_caps entry): the TPU sweep (docs/PERF.md
        # round-3 checklist) measured +11% frame vs the default 16 at 0.44%
        # of taps degrading to the counted coarsest-mip fallback; the
        # tex_approx_taps honesty stat rides in this JSON.
        app.pipeline = DeferredRenderPipeline(
            app.scene, app.pipeline.config, tile_h=24, tile_w=128,
            bin_cap=2048, texture_filter=args.texture_filter,
            env_budget=136, tex_caps=(92, 44, None, 12),
        )
        pipe, cam, frames = app.pipeline, app.camera, args.frames

    # warmup / compile (2 frames: first compiles, second confirms steady
    # state). The primary config leans on Pallas kernels with dynamic
    # scalar-prefetch bases; if the Mosaic compile of any of them regresses
    # on this toolchain, degrade stepwise instead of losing the bench:
    # (1) cap-shaped env staging, (2) XLA sampler paths.
    fallback = None
    if not args.smoke:
        from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline

        for attempt, kw in (
            (None, {}),
            ("env-full-layout", {"env_budget": None}),
            ("xla-samplers", {"env_budget": None, "use_tex_kernel": False,
                              "use_pallas": False}),
        ):
            try:
                if attempt is not None:
                    print(f"bench: falling back to {attempt}", file=sys.stderr)
                    app.pipeline = pipe = DeferredRenderPipeline(
                        app.scene, app.pipeline.config, tile_h=24,
                        tile_w=128, bin_cap=2048,
                        texture_filter=args.texture_filter, **kw,
                    )
                    fallback = attempt
                np.asarray(pipe.render(cam, collect_stats=False))
                break
            except Exception as e:
                print(f"bench: config failed: {repr(e)[:300]}",
                      file=sys.stderr)
                if attempt == "xla-samplers":
                    raise
    else:
        np.asarray(pipe.render(cam, collect_stats=False))
    np.asarray(pipe.render(cam, collect_stats=False))

    t0 = time.perf_counter()
    img = None
    for _ in range(frames):
        img = pipe.render(cam, 1.0 / 60.0, collect_stats=False)
    np.asarray(img)  # sync once at the end (frames pipeline asynchronously)
    elapsed = time.perf_counter() - t0
    loop_fps = frames / elapsed

    # Sustained throughput: N frames of a real yaw animation path in ONE
    # device dispatch (DeferredRenderPipeline.render_sequence — the playback
    # analog of the reference's frame loop, App.cpp:354-380). On this
    # remote-attached platform each dispatch pays ~30 ms of RPC enqueue that
    # does not exist on a locally-attached chip (docs/PERF.md round-3 RPC
    # decomposition); the sequence path amortizes it to once per batch and
    # measures what the device itself sustains. Per-call loop fps is
    # reported alongside.
    seq_fps = None
    if not args.smoke:
        try:
            cams = _yaw_path(cam, frames)
            np.asarray(pipe.render_sequence(cams))  # compile
            # the first post-compile dispatch pays a large one-time cost on
            # this platform (~13 s measured; docs/PERF.md round-3) — warm it
            # through before timing steady state
            np.asarray(pipe.render_sequence(cams)[-1])
            t0 = time.perf_counter()
            out = pipe.render_sequence(cams)
            np.asarray(out[-1])
            seq_fps = frames / (time.perf_counter() - t0)
        except Exception as e:
            print(f"bench: render_sequence path failed: {repr(e)[:200]}",
                  file=sys.stderr)

    # headline = the faster of the two real frame-loop APIs (measured on this
    # platform: the per-call loop wins — the scanned body loses ~2.4x device
    # time inside lax.scan, see docs/PERF.md round-3)
    fps = max(loop_fps, seq_fps) if seq_fps is not None else loop_fps
    scene_name = "synthetic sphere scene" if args.smoke else "reference scene"
    result = {
        "metric": f"deferred PBR frame rate, {scene_name} @ {pipe.config.width}x{pipe.config.height}",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "per_call_loop_fps": round(loop_fps, 3),
    }
    if seq_fps is not None:
        result["sequence_dispatch_fps"] = round(seq_fps, 3)
    if fallback is not None:
        result["fallback"] = fallback
    if not args.smoke:
        try:  # honesty stats for the perf knobs (block_cap / env_budget)
            np.asarray(pipe.render(cam, 1.0 / 60.0, collect_stats=True))
            st = pipe.last_stats
            if st is not None:
                result["tex_approx_taps"] = int(st.tex_approx_taps)
                result["env_approx_taps"] = int(st.env_approx_taps)
                result["bin_overflow"] = int(st.bin_overflow)
        except Exception:
            pass

    if not args.smoke and not args.skip_secondary:
        # secondary: the north-star Sponza-CLASS density (262k-triangle
        # terrain, tests/test_scale.py's scene) at the same resolution
        try:
            result.update(_stress_bench(args))
        except Exception as e:  # secondary metric must never kill the bench
            result["sponza_class_error"] = repr(e)[:200]
        # secondary: the reference's 1024-light clustered capacity
        # (DeferredPipeline.h:326-330; BASELINE milestone 5)
        try:
            result.update(_lights1k_bench(args))
        except Exception as e:
            result["lights1k_error"] = repr(e)[:200]

    print(json.dumps(result))
    return result


def _yaw_path(cam, n: int):
    """n-frame camera path: tiny yaw steps around the bench pose (a real
    animation — every frame re-culls, re-bins, re-plans its caches)."""
    import copy

    cams = []
    c = copy.deepcopy(cam)
    for _ in range(n):
        c = copy.deepcopy(c)
        c.rotate(0.0, 0.002, 0.0)
        cams.append(c)
    return cams


def _stress_bench(args, frames: int = 12):
    from direct12pbrrenderer_tpu.config import RenderConfig
    from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline
    from direct12pbrrenderer_tpu.scene.camera import Camera
    from direct12pbrrenderer_tpu.tools.stress_scene import build_stress_scene

    scene = build_stress_scene(cells_x=512, cells_y=256)
    cfg = RenderConfig(width=args.width, height=args.height, max_instances=2)
    pipe = DeferredRenderPipeline(
        scene, cfg, tile_h=24, tile_w=128, bin_cap=8192, atlas_max_dim=256,
    )
    cam = Camera(cfg.fov, cfg.width, cfg.height, cfg.near, cfg.far)
    cam.move([0, 6, 18])
    cam.rotate(0, np.pi, 0.35)
    np.asarray(pipe.render(cam))  # compile + stats
    overflow = pipe.last_stats.bin_overflow if pipe.last_stats else -1
    t0 = time.perf_counter()
    img = None
    for _ in range(frames):
        img = pipe.render(cam, 1.0 / 60.0, collect_stats=False)
    np.asarray(img)
    fps = frames / (time.perf_counter() - t0)
    return {
        "sponza_class_fps": round(fps, 3),
        "sponza_class_triangles": 512 * 256 * 2,
        "sponza_class_bin_overflow": int(overflow),
    }


def _lights1k_bench(args, frames: int = 12):
    """1024 scattered point lights @1080p via the tile-clustered Pallas
    kernel (ops/lights_pallas) — cost O(lights per tile), not O(1024)."""
    from direct12pbrrenderer_tpu.config import RenderConfig
    from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline
    from direct12pbrrenderer_tpu.scene.camera import Camera
    from direct12pbrrenderer_tpu.tools.stress_scene import build_stress_scene

    scene = build_stress_scene(cells_x=128, cells_y=64, n_lights=1024)
    cfg = RenderConfig(width=args.width, height=args.height, max_instances=2,
                       max_lights=1024)
    pipe = DeferredRenderPipeline(
        scene, cfg, tile_h=24, tile_w=128, bin_cap=2048, atlas_max_dim=256,
        max_active_lights=1024,
    )
    cam = Camera(cfg.fov, cfg.width, cfg.height, cfg.near, cfg.far)
    cam.move([0, 6, 18])
    cam.rotate(0, np.pi, 0.35)
    np.asarray(pipe.render(cam))  # compile + stats
    stats = pipe.last_stats
    t0 = time.perf_counter()
    img = None
    for _ in range(frames):
        img = pipe.render(cam, 1.0 / 60.0, collect_stats=False)
    np.asarray(img)
    fps = frames / (time.perf_counter() - t0)
    return {
        "lights1k_fps": round(fps, 3),
        "lights1k_visible": stats.visible_lights if stats else -1,
        "lights1k_tile_overflow": stats.light_tile_overflow if stats else -1,
    }


if __name__ == "__main__":
    main()
