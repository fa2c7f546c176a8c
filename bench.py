"""Headline benchmark: frames/sec rendering the reference scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the driver-set north star of 60 FPS at 1920x1080 on a Sponza-class
scene on one TPU v5e chip (BASELINE.json; the reference publishes no numbers
of its own). vs_baseline is computed against the scene the baseline metric
NAMES — the Sponza-class density run (sponza_class_fps / 60); the lighter
reference scene's ratio is reported alongside as
reference_scene_vs_baseline. The JSON also carries an on-device fidelity
gate (rmse_vs_xla): one bench-pose frame rendered kernel-path vs pure-XLA
path, mirroring the reference's always-on GPU validation
(Engine/Source/Renderer/Device/Direct12/D3D12Device.cpp:27-30).

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

        # the AppConfig DEFAULTS are the tuned configuration (tile 24x128,
        # bin_cap 2048, census-sized tex_caps with block_cap=12) — the bench
        # times exactly the pipeline the README's flagship command builds
        app = App(
            AppConfig(
                asset_root=args.asset_root,
                width=args.width,
                height=args.height,
                frames=args.frames,
            )
        )
        if args.texture_filter != "trilinear":
            from direct12pbrrenderer_tpu.pipeline.deferred import (
                DeferredRenderPipeline,
            )

            app.pipeline = DeferredRenderPipeline(
                app.scene, app.pipeline.config,
                texture_filter=args.texture_filter,
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
            ("worst-case-caps", {"tex_caps": None, "env_budget": None}),
            ("xla-samplers", {"tex_caps": None, "env_budget": None,
                              "use_tex_kernel": False, "use_pallas": False}),
        ):
            try:
                if attempt is not None:
                    print(f"bench: falling back to {attempt}", file=sys.stderr)
                    app.pipeline = pipe = DeferredRenderPipeline(
                        app.scene, app.pipeline.config,
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

    loop_fps, seq_fps = _measure_fps(pipe, cam, frames, smoke=args.smoke)

    # headline = the faster of the two real frame-loop APIs over the same
    # yaw path (which wins depends on the attached platform's per-dispatch
    # RPC cost vs lax.scan body overhead — docs/PERF.md round-3)
    fps = max(loop_fps, seq_fps) if seq_fps is not None else loop_fps
    scene_name = "synthetic sphere scene" if args.smoke else "reference scene"
    result = {
        "metric": f"deferred PBR frame rate, {scene_name} @ {pipe.config.width}x{pipe.config.height}",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "per_call_loop_fps": round(loop_fps, 3),
        "headline_method": (
            "sequence" if seq_fps is not None and seq_fps > loop_fps
            else "loop"
        ),
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
        # on-device fidelity gate: the same bench pose through the pure-XLA
        # sampler/raster path (the reference runs its D3D12 debug layer +
        # GPU validation always-on; this is the TPU analog). rmse counts the
        # kernel path's counted fallback taps too, so it bounds the REAL
        # end-to-end error of the tuned configuration, not just ULP drift.
        try:
            result.update(_fidelity_gate(app, pipe, cam))
        except Exception as e:
            result["rmse_error"] = repr(e)[:200]
        # THE GATE IS BINDING: a failing gate can never coexist with the
        # reported headline. If the tuned config fails the 1e-3 bar, the
        # headline re-measures on the known gate-passing configuration
        # (full block_cap covers) and the tuned numbers move to tuned_* keys.
        if result.get("rmse_gate") == "FAIL" and fallback is None:
            from direct12pbrrenderer_tpu.pipeline.deferred import (
                DeferredRenderPipeline,
            )

            print("bench: tuned config failed the gate — re-measuring the "
                  "headline on the gate-safe config", file=sys.stderr)
            result["tuned_fps"] = result["value"]
            result["tuned_rmse_vs_xla"] = result["rmse_vs_xla"]
            # strictly gate-safe: texture/env taps through the XLA samplers
            # (only the separately-pinned raster kernel remains — measured
            # rmse 0.000876 at the bench pose, docs/PERF.md round-5). Slow,
            # deliberately: a cache-fidelity regression costs the headline.
            app.pipeline = pipe = DeferredRenderPipeline(
                app.scene, pipe.config, tex_caps=None,
                use_tex_kernel=False,
                env_budget=None, texture_filter=pipe.texture_filter,
            )
            np.asarray(pipe.render(cam, collect_stats=False))  # compile
            loop_fps, seq_fps = _measure_fps(pipe, cam, frames)
            fps = max(loop_fps, seq_fps) if seq_fps is not None else loop_fps
            result.update({
                "value": round(fps, 3),
                "vs_baseline": round(fps / BASELINE_FPS, 4),
                "per_call_loop_fps": round(loop_fps, 3),
                "headline_method": (
                    "sequence" if seq_fps is not None and seq_fps > loop_fps
                    else "loop"
                ),
                "fidelity_fallback": "xla-samplers",
            })
            if seq_fps is not None:
                result["sequence_dispatch_fps"] = round(seq_fps, 3)
            try:  # honesty stats describe the headline config
                np.asarray(pipe.render(cam, 1.0 / 60.0, collect_stats=True))
                st = pipe.last_stats
                if st is not None:
                    result["tex_approx_taps"] = int(st.tex_approx_taps)
                    result["env_approx_taps"] = int(st.env_approx_taps)
                    result["bin_overflow"] = int(st.bin_overflow)
            except Exception:
                pass
            try:
                result.update(_fidelity_gate(app, pipe, cam))
            except Exception as e:
                result["rmse_error"] = repr(e)[:200]

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

    # vs_baseline against the scene BASELINE.json names (Sponza-class):
    # the honest north-star ratio. The reference scene's ratio stays
    # alongside, clearly labeled.
    result["reference_scene_vs_baseline"] = result["vs_baseline"]
    if "sponza_class_fps" in result:
        result["vs_baseline"] = round(
            result["sponza_class_fps"] / BASELINE_FPS, 4
        )
        result["vs_baseline_scene"] = "sponza_class"
    else:
        result["vs_baseline_scene"] = "reference_scene"

    print(json.dumps(result))
    return result


def _measure_fps(pipe, cam, frames: int, smoke: bool = False):
    """(per-call loop fps, sequence-dispatch fps) over the same yaw path.

    Per-call loop: the SAME yaw animation the sequence dispatch renders
    (each frame re-culls, re-bins, re-plans) so the two headline methods
    measure the same workload and differ only in dispatch discipline.

    Sequence: N frames in ONE device dispatch
    (DeferredRenderPipeline.render_sequence — the playback analog of the
    reference's frame loop, App.cpp:354-380). On this remote-attached
    platform each dispatch pays ~30 ms of RPC enqueue that does not exist on
    a locally-attached chip (docs/PERF.md round-3 RPC decomposition); the
    sequence path amortizes it to once per batch and measures what the
    device itself sustains."""
    cams = _yaw_path(cam, frames)
    for c in cams[:2]:  # compile is shared; warm the per-pose upload path
        pipe.render(c, 1.0 / 60.0, collect_stats=False)
    t0 = time.perf_counter()
    img = None
    for c in cams:
        img = pipe.render(c, 1.0 / 60.0, collect_stats=False)
    np.asarray(img)  # sync once at the end (frames pipeline asynchronously)
    loop_fps = frames / (time.perf_counter() - t0)

    seq_fps = None
    if not smoke:
        try:
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
    return loop_fps, seq_fps


def _rmse_vs_xla(scene, pipe, cam, texture_filter="trilinear"):
    """One-pose RMSE of `pipe` vs the pure-XLA sampler/raster path on the
    normalized uint8 back buffer (shared by the headline + secondary gates).
    Both paths render one frame from the same exposure-EMA carry."""
    from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline

    ref_pipe = DeferredRenderPipeline(
        scene, pipe.config, tex_caps=None, env_budget=None,
        use_tex_kernel=False, use_pallas=False,
        texture_filter=texture_filter,
        tile_h=pipe.tile_h, tile_w=pipe.tile_w, bin_cap=pipe.bin_cap,
        max_active_lights=pipe.max_active_lights,
    )
    prev = pipe.avg_luminance
    ref_pipe.avg_luminance = prev
    a = np.asarray(pipe.render(cam, 1.0 / 60.0, collect_stats=False))
    pipe.avg_luminance = prev
    b = np.asarray(ref_pipe.render(cam, 1.0 / 60.0, collect_stats=False))
    return float(np.sqrt(np.mean(
        (a.astype(np.float64) / 255.0 - b.astype(np.float64) / 255.0) ** 2
    )))


def _fidelity_gate(app, pipe, cam, tol: float = 1e-3):
    """One bench-pose frame: tuned kernel path vs pure-XLA path, RMSE on the
    normalized uint8 back buffer. Reported in the bench JSON and gated at
    `tol` (the BASELINE.json fidelity bar) — rmse_gate says pass/FAIL rather
    than raising so a drift never costs the round its bench numbers."""
    rmse = _rmse_vs_xla(app.scene, pipe, cam,
                        texture_filter=pipe.texture_filter)
    out = {"rmse_vs_xla": round(rmse, 6),
           "rmse_gate": "pass" if rmse <= tol else "FAIL"}
    if rmse > tol:
        print(f"bench: FIDELITY GATE FAILED rmse_vs_xla={rmse:.6f} > {tol}",
              file=sys.stderr)
    return out


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


def _stress_bench(args, frames: int = 32):
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
    # same 32-frame yaw-path discipline as the headline (short static loops
    # understate sustained fps ~20% — docs/PERF.md loop-length fix)
    cams = _yaw_path(cam, frames)
    for c in cams[:2]:
        pipe.render(c, 1.0 / 60.0, collect_stats=False)
    t0 = time.perf_counter()
    img = None
    for c in cams:
        img = pipe.render(c, 1.0 / 60.0, collect_stats=False)
    np.asarray(img)
    fps = frames / (time.perf_counter() - t0)
    out = {
        "sponza_class_fps": round(fps, 3),
        "sponza_class_triangles": 512 * 256 * 2,
        "sponza_class_bin_overflow": int(overflow),
    }
    # same fidelity discipline as the headline: one pose through the pure-XLA
    # path so a lossy-cache/raster regression on THIS workload is visible
    try:
        out["sponza_class_rmse"] = round(_rmse_vs_xla(scene, pipe, cam), 6)
        if out["sponza_class_rmse"] > 1e-3:
            print(f"bench: sponza_class rmse gate FAILED "
                  f"{out['sponza_class_rmse']}", file=sys.stderr)
    except Exception as e:
        out["sponza_class_rmse_error"] = repr(e)[:200]
    return out


def _lights1k_bench(args, frames: int = 32):
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
    cams = _yaw_path(cam, frames)
    for c in cams[:2]:
        pipe.render(c, 1.0 / 60.0, collect_stats=False)
    t0 = time.perf_counter()
    img = None
    for c in cams:
        img = pipe.render(c, 1.0 / 60.0, collect_stats=False)
    np.asarray(img)
    fps = frames / (time.perf_counter() - t0)
    out = {
        "lights1k_fps": round(fps, 3),
        "lights1k_visible": stats.visible_lights if stats else -1,
        "lights1k_tile_overflow": stats.light_tile_overflow if stats else -1,
    }
    try:
        out["lights1k_rmse"] = round(_rmse_vs_xla(scene, pipe, cam), 6)
        if out["lights1k_rmse"] > 1e-3:
            print(f"bench: lights1k rmse gate FAILED {out['lights1k_rmse']}",
                  file=sys.stderr)
    except Exception as e:
        out["lights1k_rmse_error"] = repr(e)[:200]
    return out


if __name__ == "__main__":
    main()
