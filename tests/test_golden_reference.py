"""Golden regression over the REAL reference scene (38 models, 8 lights) —
the full asset pipeline + renderer end to end on CPU.

Regenerate after an intentional change: UPDATE_GOLDENS=1 pytest this file.
"""

import os
from pathlib import Path

import numpy as np

from direct12pbrrenderer_tpu.config import RenderConfig
from direct12pbrrenderer_tpu.utils.fidelity import compare_to_golden

GOLDEN_DIR = Path(__file__).parent / "goldens"
UPDATE = bool(os.environ.get("UPDATE_GOLDENS"))


def test_reference_scene_golden(asset_loader):
    from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline
    from direct12pbrrenderer_tpu.scene.camera import Camera
    from direct12pbrrenderer_tpu.scene.scene import Scene

    scene = asset_loader.load_resource(Scene, "Asset/Scene/main.json")
    cfg = RenderConfig(
        width=256, height=192, max_triangles=65536, max_vertices=65536,
        max_instances=40,
    )
    pipe = DeferredRenderPipeline(
        scene, cfg, tile_h=24, tile_w=128, bin_cap=4096,
        prefilter_size=16, brdf_lut_size=64, atlas_max_dim=256,
    )
    # App::Initialize camera (App.cpp:99-101)
    cam = Camera(cfg.fov, cfg.width, cfg.height, cfg.near, cfg.far)
    cam.move([0, 3, 10])
    cam.rotate(0, np.pi, 0)
    img = None
    for _ in range(2):
        img = np.asarray(pipe.render(cam, delta_time=0.25))
    stats = pipe.last_stats
    assert stats.visible_instances >= 20  # most of the scene in view
    assert stats.visible_lights == 8
    assert stats.bin_overflow == 0
    err = compare_to_golden(
        img, GOLDEN_DIR / "reference_scene_256x192.png", tol=2e-3, update=UPDATE
    )
    assert err <= 2e-3
