"""Application shell: scene loading, frame loop, camera scripting, stats.

The headless counterpart of `Engine/Source/App.cpp`: where the reference
opens a Win32 window, pumps WM_PAINT and drives a WASD fly camera
(App.cpp:117-152, 334-404), this app renders N frames to PNGs/video frames
with an optional scripted camera path, and reports the FPS + culling counters
the reference shows in its window title.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..config import (
    DEFAULT_FAR,
    DEFAULT_FOV,
    DEFAULT_NEAR,
    RenderConfig,
)
from ..resource import reflection_def  # noqa: F401
from ..resource.loader import ResourceLoader
from ..scene.camera import Camera
from ..scene.scene import Scene
from ..utils.mathlib import Deg2Rad


@dataclass
class AppConfig:
    asset_root: str = "."
    scene: str = "Asset/Scene/main.json"
    width: int = 1440
    height: int = 960
    frames: int = 60
    output_dir: str | None = None
    camera_pos: tuple = (0.0, 3.0, 10.0)
    camera_yaw_deg: float = 180.0
    camera_pitch_deg: float = 0.0
    orbit_deg_per_frame: float = 0.0  # scripted fly-around
    # tile 24x128 / bin_cap 2048: the measured-best raster/texcache tiling on
    # v5e @1080p (docs/PERF.md round-3 tile_h sweep + checklist) — the same
    # configuration bench.py times, so the README command IS the bench config
    tile_h: int = 24
    tile_w: int = 128
    bin_cap: int = 2048
    atlas_max_dim: int | None = 1024
    prefilter_size: int | None = None
    max_triangles: int = 65536
    max_vertices: int = 65536
    # census-sized page budgets (tools/tap_census.py). Round-5 gate-passing
    # tuned config (docs/PERF.md round-5 sweep): per-half block_cap (24, 12)
    # sized to the measured row demand (lo-half row_p999 29), plus the
    # same-mip cover cascade below for the outlier rows — bench-pose
    # rmse_vs_xla 0.000928 vs the 0.004311 the round-4 block_cap=12 config
    # shipped with. None entries = worst-case defaults.
    tex_caps: tuple | None = (92, 44, None, (24, 12))
    # (cap, block_cap, mip_off) LOD-clamp cascade: mip_off=0 re-COVERS the
    # overflow rows at the same mip, so cascade-resolved taps are exact
    # bilinear-at-lo rather than a blur (measured best: rmse 0.000928 at
    # ~equal fps vs mip_off=1's 0.000999)
    tex_cascade: tuple | bool = (12, 8, 0)
    env_budget: int | None = None
    # (cap_small, hot_k) two-pass raster split: the measured bin-count
    # distribution at the bench pose (p50 4, p90 91, p99 442 over 675 tiles)
    # supports (128, 64) — 2.6x fewer pre-gather slots than the cap//4
    # heuristic; hot-set misses surface via bin_overflow (docs/PERF.md
    # round-4). None = raster_pallas.split_caps heuristic.
    raster_caps: tuple | None = (128, 64)


class App:
    """Load -> compile -> frame loop (App::Run / InternalRun analog)."""

    def __init__(self, cfg: AppConfig):
        self.cfg = cfg
        loader = ResourceLoader.set_instance(ResourceLoader(cfg.asset_root))
        self.scene = loader.load_resource(Scene, cfg.scene)

        render_cfg = RenderConfig(
            width=cfg.width,
            height=cfg.height,
            max_triangles=cfg.max_triangles,
            max_vertices=cfg.max_vertices,
            max_instances=max(len(self.scene.models), 1),
        )
        from ..pipeline.deferred import DeferredRenderPipeline

        self.pipeline = DeferredRenderPipeline(
            self.scene,
            render_cfg,
            tile_h=cfg.tile_h,
            tile_w=cfg.tile_w,
            bin_cap=cfg.bin_cap,
            atlas_max_dim=cfg.atlas_max_dim,
            prefilter_size=cfg.prefilter_size,
            tex_caps=cfg.tex_caps,
            tex_cascade=cfg.tex_cascade,
            env_budget=cfg.env_budget,
            raster_caps=cfg.raster_caps,
        )
        # camera defaults match App::Initialize (App.cpp:99-101)
        self.camera = Camera(DEFAULT_FOV, cfg.width, cfg.height, DEFAULT_NEAR, DEFAULT_FAR)
        self.camera.move(cfg.camera_pos)
        self.camera.rotate(
            0.0, cfg.camera_yaw_deg * Deg2Rad, cfg.camera_pitch_deg * Deg2Rad
        )

    def run(self) -> dict:
        cfg = self.cfg
        out_dir = Path(cfg.output_dir) if cfg.output_dir else None
        if out_dir:
            out_dir.mkdir(parents=True, exist_ok=True)

        # warmup/compile frame
        t0 = time.perf_counter()
        img = self.pipeline.render(self.camera)
        np.asarray(img)
        compile_s = time.perf_counter() - t0

        frame_times = []
        writes = []
        for i in range(cfg.frames):
            if cfg.orbit_deg_per_frame:
                self.camera.rotate(0.0, cfg.orbit_deg_per_frame * Deg2Rad, 0.0)
            t0 = time.perf_counter()
            img = self.pipeline.render(self.camera, delta_time=1.0 / 60.0)
            img_np = np.asarray(img)  # sync
            frame_times.append(time.perf_counter() - t0)
            if out_dir:
                # PNG encodes ride the worker pool (TaskScheduler analog) so
                # disk IO never blocks the frame loop
                from PIL import Image

                from ..utils.threading import shared_pool

                path = out_dir / f"frame_{i:04d}.png"
                writes.append(
                    shared_pool().schedule(
                        lambda a=img_np, p=path: Image.fromarray(a).save(p)
                    )
                )

        for f in writes:
            f.result()
        times = np.asarray(frame_times)
        stats = self.pipeline.last_stats
        report = {
            "frames": cfg.frames,
            "resolution": f"{cfg.width}x{cfg.height}",
            "compile_s": round(compile_s, 3),
            "mean_frame_ms": round(float(times.mean()) * 1e3, 3),
            "p50_frame_ms": round(float(np.percentile(times, 50)) * 1e3, 3),
            "fps": round(1.0 / float(times.mean()), 2),
            "visible_instances": stats.visible_instances if stats else 0,
            "total_instances": stats.total_instances if stats else 0,
            "visible_lights": stats.visible_lights if stats else 0,
            "bin_overflow": stats.bin_overflow if stats else 0,
            "tex_approx_taps": getattr(stats, "tex_approx_taps", 0) if stats else 0,
        }
        return report


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="direct12pbrrenderer_tpu — TPU-native deferred PBR renderer"
    )
    ap.add_argument("--asset-root", default="/root/reference/DeferredRendering")
    ap.add_argument("--scene", default="Asset/Scene/main.json")
    ap.add_argument("--width", type=int, default=1440)
    ap.add_argument("--height", type=int, default=960)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", default=None, help="directory for PNG frames")
    ap.add_argument("--orbit", type=float, default=0.0, help="deg/frame camera orbit")
    ap.add_argument("--camera", type=float, nargs=3, default=(0.0, 3.0, 10.0))
    ap.add_argument("--yaw", type=float, default=180.0)
    ap.add_argument("--pitch", type=float, default=0.0)
    ap.add_argument("--bin-cap", type=int, default=2048)
    ap.add_argument("--tile", type=int, nargs=2, default=(24, 128))
    ap.add_argument("--tex-budget", type=int, default=None,
                    help="texture-cache staging page budget "
                         "(tools/tap_census.py sizes it)")
    ap.add_argument("--env-budget", type=int, default=None,
                    help="env-cache staging page budget")
    ap.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="run the interactive browser viewer instead of "
                         "writing frames (WASD + right-drag fly camera)")
    args = ap.parse_args(argv)

    kw = {}
    if args.tex_budget:  # keep the tuned block_cap default, add the budget
        kw["tex_caps"] = (92, 44, args.tex_budget, (24, 12))
    app = App(
        AppConfig(
            asset_root=args.asset_root,
            scene=args.scene,
            width=args.width,
            height=args.height,
            frames=args.frames,
            output_dir=args.out,
            camera_pos=tuple(args.camera),
            camera_yaw_deg=args.yaw,
            camera_pitch_deg=args.pitch,
            orbit_deg_per_frame=args.orbit,
            tile_h=args.tile[0],
            tile_w=args.tile[1],
            bin_cap=args.bin_cap,
            env_budget=args.env_budget,
            **kw,
        )
    )
    if args.serve:
        from .viewer import serve

        serve(app, port=args.serve)
        return None
    report = app.run()
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
