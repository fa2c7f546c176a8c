"""One-pass TPU measurement checklist for the round-3 gated changes.

Several round-3 changes landed while the TPU tunnel was down and are gated
off (or defaulted conservatively) pending hardware numbers. This script runs
every pending A/B on the real reference scene in one go and prints one JSON
line per measurement, so the flip decisions are a single run away when the
tunnel returns:

  1. frame_baseline      — full-frame fps at the bench config (sanity anchor)
  2. fused_cover_dynamic — texcache cover kernel: static vs realized-bound
                           merge loops (texcache.FUSED_COVER_DYNAMIC)
  3. stage_budget        — demand-shaped staging at census budgets vs the
                           cap-shaped full layout (fps + approx-tap honesty)
  4. env_budget          — env-cache demand-shaped staging sweep, with the
                           measured per-pose env census printed first so the
                           swept budgets can be judged against real demand
  5. rpc                 — decompose the ~30 ms/frame pipelined enqueue gap
                           (round-3 trace): execute-only dispatch with a
                           device-resident frame pack vs the full render()
                           loop isolates the per-frame upload RPC's share
  6. tileh               — tile_h sweep at the bench knobs (cover-merge work
                           scales as H*tile_h*block_cap^2 but grid-step
                           overhead scales as 1/tile_h; 24 won round 3:
                           16 rows measured 3.68 vs 5.22 fps same-process)

Interleave-rep caveat: single-pass sweeps on the remote-attached platform
carry +-10% run-to-run drift; decisions should come from interleaved reps
(the round-3 block_cap 10-vs-12 probe inverted on one of three reps).

Usage: python -m direct12pbrrenderer_tpu.tools.tpu_checklist [--width ...]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def fps_of(pipe, camera, frames=6):
    np.asarray(pipe.render(camera, collect_stats=False))
    np.asarray(pipe.render(camera, collect_stats=False))
    t0 = time.perf_counter()
    img = None
    for _ in range(frames):
        img = pipe.render(camera, 1.0 / 60.0, collect_stats=False)
    np.asarray(img)
    return frames / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--asset-root", default="/root/reference/DeferredRendering")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--only", default=None,
                    help="comma list: baseline,dyncover,budget")
    args = ap.parse_args()
    sel = set(args.only.split(",")) if args.only else None

    from ..app.app import App, AppConfig
    from ..ops import texcache
    from ..pipeline.deferred import DeferredRenderPipeline

    app = App(AppConfig(
        asset_root=args.asset_root, width=args.width, height=args.height,
        tile_h=24, tile_w=128, bin_cap=2048,
    ))
    scene, cam, cfg = app.scene, app.camera, app.pipeline.config

    def mk(**kw):
        return DeferredRenderPipeline(
            scene, cfg, tile_h=24, tile_w=128, bin_cap=2048, **kw
        )

    results = {}

    if sel is None or "baseline" in sel:
        results["frame_baseline"] = {"fps": round(fps_of(
            app.pipeline, cam, args.frames), 3)}
        print(json.dumps({"check": "frame_baseline",
                          **results["frame_baseline"]}), flush=True)

    if sel is None or "dyncover" in sel:
        # flip the module flag; fresh pipelines -> fresh traces either way
        for flag in (False, True):
            texcache.FUSED_COVER_DYNAMIC = flag
            jax.clear_caches()
            try:
                fps = round(fps_of(mk(), cam, args.frames), 3)
                err = None
            except Exception as e:  # Mosaic compile failure is a result too
                fps, err = None, f"{type(e).__name__}: {e}"[:300]
            key = f"fused_cover_dynamic_{'on' if flag else 'off'}"
            results[key] = {"fps": fps, "error": err}
            print(json.dumps({"check": key, **results[key]}), flush=True)
        texcache.FUSED_COVER_DYNAMIC = False
        jax.clear_caches()

    if sel is None or "budget" in sel:
        # census (tools/tap_census.py, 1080p reference scene): per-tile total
        # span mean ~113, p99 690 at the bench pose; sweep the knob
        for budget in (None, 448, 256):
            pipe = mk(tex_caps=None if budget is None else (92, 44, budget))
            fps = round(fps_of(pipe, cam, args.frames), 3)
            np.asarray(pipe.render(cam, collect_stats=True))
            approx = int(pipe.last_stats.tex_approx_taps)
            key = f"stage_budget_{budget or 'full'}"
            results[key] = {"fps": fps, "tex_approx_taps": approx}
            print(json.dumps({"check": key, **results[key]}), flush=True)

    if sel is None or "blockcap" in sel:
        # block-level cover capacity: the fused cover kernel's rank-matrix
        # merge is O((blocks*block_cap)^2) VPU work; census row_max says
        # what a row actually holds (tools/tap_census.py row stats)
        for bc in (16, 12, 8):
            pipe = mk(tex_caps=(92, 44, None, bc))
            fps = round(fps_of(pipe, cam, args.frames), 3)
            np.asarray(pipe.render(cam, collect_stats=True))
            approx = int(pipe.last_stats.tex_approx_taps)
            key = f"block_cap_{bc}"
            results[key] = {"fps": fps, "tex_approx_taps": approx}
            print(json.dumps({"check": key, **results[key]}), flush=True)

    if "tileh" in (sel or ()):  # opt-in: 3 fresh compiles
        for th in (16, 24, 32):
            pipe = DeferredRenderPipeline(
                scene, cfg, tile_h=th, tile_w=128, bin_cap=2048,
                env_budget=136, tex_caps=(92, 44, None, 12),
            )
            fps = round(fps_of(pipe, cam, args.frames), 3)
            np.asarray(pipe.render(cam, collect_stats=True))
            st = pipe.last_stats
            key = f"tile_h_{th}"
            results[key] = {"fps": fps,
                            "bin_overflow": int(st.bin_overflow)}
            print(json.dumps({"check": key, **results[key]}), flush=True)

    if (sel is None or "envbudget" in sel) and app.pipeline.env_ids is not None:
        from ..ops import envcache
        from .tap_census import env_census_for_pose

        census = env_census_for_pose(app.pipeline, cam)
        rec = envcache.recommend_budget([census])
        results["env_census"] = {**census, "recommended": rec}
        print(json.dumps({"check": "env_census", **results["env_census"]}),
              flush=True)
        for budget in (None, rec, 48):
            pipe = mk(env_budget=budget)
            fps = round(fps_of(pipe, cam, args.frames), 3)
            np.asarray(pipe.render(cam, collect_stats=True))
            approx = int(pipe.last_stats.env_approx_taps)
            key = f"env_budget_{budget or 'full'}"
            results[key] = {"fps": fps, "env_approx_taps": approx}
            print(json.dumps({"check": key, **results[key]}), flush=True)

    if sel is None or "rpc" in sel:
        import jax.numpy as jnp

        pipe = app.pipeline
        # capture the packs by replaying render()'s host-side packing
        p = pipe.packed
        view = cam.view_matrix()
        normal_mats = np.ascontiguousarray(
            np.transpose(p.inv_model_mats[:, :3, :3], (0, 2, 1)))
        scene_f32 = np.concatenate([
            p.model_mats.ravel(), normal_mats.ravel(),
            p.instance_bounds.ravel(), p.light_bounds.ravel(),
        ]).astype(np.float32)
        cam_f32 = np.concatenate([
            np.asarray(cam.frustum_planes(), np.float32).ravel(),
            np.asarray(view, np.float32).ravel(),
            np.asarray(cam.world_matrix(), np.float32).ravel(),
            np.asarray(cam.projection_matrix() @ view, np.float32).ravel(),
            np.asarray(cam.position, np.float32).ravel(),
            np.float32([1.0 / 60.0]),
        ]).astype(np.float32)
        scene_dev = jnp.asarray(scene_f32)
        cam_dev = jnp.asarray(cam_f32)
        avg = pipe.avg_luminance
        np.asarray(
            pipe._frame_jit(pipe.buffers, scene_dev, cam_dev, avg)[0])  # warm
        n = args.frames
        t0 = time.perf_counter()
        for _ in range(n):
            out = pipe._frame_jit(pipe.buffers, scene_dev, cam_dev, avg)
        np.asarray(out[0])
        exec_only = (time.perf_counter() - t0) / n
        t0 = time.perf_counter()
        for _ in range(n):
            cd = jnp.asarray(cam_f32)
            out = pipe._frame_jit(pipe.buffers, scene_dev, cd, avg)
        np.asarray(out[0])
        with_upload = (time.perf_counter() - t0) / n
        full = 1.0 / fps_of(pipe, cam, n)
        results["rpc"] = {
            "exec_only_ms": round(exec_only * 1e3, 2),
            "with_upload_ms": round(with_upload * 1e3, 2),
            "full_render_ms": round(full * 1e3, 2),
        }
        print(json.dumps({"check": "rpc", **results["rpc"]}), flush=True)

    print(json.dumps({"check": "ALL", "results": results}))


if __name__ == "__main__":
    main()
