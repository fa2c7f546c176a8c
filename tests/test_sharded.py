"""Multi-chip (8 virtual CPU devices) frame rendering: sharded == single-chip.

`build_sharded_frame(mesh, pipe)` reads every knob off the pipeline it
shards, so these tests construct ONE pipeline per case and assert the
sharded frame reproduces its single-chip render — the anti-drift contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from direct12pbrrenderer_tpu.config import RenderConfig
from direct12pbrrenderer_tpu.parallel import frame_sharded
from test_pipeline import build_scene


CFG = RenderConfig(
    width=128, height=96, max_triangles=2048, max_vertices=2048,
    max_instances=4, max_lights=16,
)


def _sharded_args(pipe, cam):
    p = pipe.packed
    normal_mats = np.ascontiguousarray(
        np.transpose(p.inv_model_mats[:, :3, :3], (0, 2, 1)))
    view = cam.view_matrix()
    return (
        pipe.buffers,
        jnp.asarray(p.model_mats),
        jnp.asarray(normal_mats),
        jnp.asarray(p.instance_bounds),
        jnp.asarray(p.light_bounds),
        jnp.asarray(np.asarray(cam.frustum_planes(), np.float32)),
        jnp.asarray(view),
        jnp.asarray(cam.world_matrix()),
        jnp.asarray(cam.projection_matrix() @ view),
        jnp.asarray(cam.position),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(1.0 / 60.0, jnp.float32),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_chip():
    from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline
    from direct12pbrrenderer_tpu.scene.camera import Camera

    pipe = DeferredRenderPipeline(
        build_scene(), CFG, tile_h=12, tile_w=64, bin_cap=512,
        prefilter_size=16, brdf_lut_size=32,
    )
    cam = Camera(CFG.fov, CFG.width, CFG.height, CFG.near, CFG.far)
    cam.move([0, 0, 4])
    cam.rotate(0, np.pi, 0)

    ref = np.asarray(pipe.render(cam))

    mesh = frame_sharded.make_mesh(8)
    frame = frame_sharded.build_sharded_frame(mesh, pipe)
    rgb8, avg = frame(*_sharded_args(pipe, cam))
    out = np.asarray(rgb8)
    assert out.shape == ref.shape
    # identical math, identical result (up to reduction-order noise in u8)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert (diff > 1).mean() < 1e-3
    assert float(avg) > 0

    # FrameStats threaded through the sharded path: per-band bin counts
    # concatenate to the full tile grid; tex_approx sums across chips
    frame_s = frame_sharded.build_sharded_frame(mesh, pipe, collect_stats=True)
    rgb8_s, avg_s, bin_counts, tex_approx, light_trunc, env_approx = frame_s(
        *_sharded_args(pipe, cam)
    )
    assert np.array_equal(np.asarray(rgb8_s), out)
    n_tiles = (CFG.height // 12) * (CFG.width // 64)
    assert np.asarray(bin_counts).shape == (n_tiles,)
    assert int(np.asarray(bin_counts).sum()) > 0
    assert int(tex_approx) >= 0 and int(light_trunc) == 0
    assert int(env_approx) >= 0  # honesty stat surfaced on the sharded path


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_sharded_with_cache_kernels_matches_single_chip():
    """The sharded path must route through the SAME fused G-buffer +
    texture/env page-cache kernels as single-chip (interpret mode): per-band
    tiling + y_offset plumbing through the raster kernel, the cover planner,
    and the resolve+shade kernel."""
    from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline
    from direct12pbrrenderer_tpu.scene.camera import Camera

    cfg = RenderConfig(
        width=128, height=96, max_triangles=2048, max_vertices=2048,
        max_instances=4, max_lights=16,
    )
    pipe = DeferredRenderPipeline(
        build_scene(), cfg, tile_h=24, tile_w=128, bin_cap=512,
        prefilter_size=16, brdf_lut_size=32,
        use_pallas=True, use_tex_kernel=True, pallas_interpret=True,
    )
    assert pipe.use_tex_kernel and pipe.env_ids is not None
    assert pipe.use_fused_gbuffer  # the production path is what we shard
    cam = Camera(cfg.fov, cfg.width, cfg.height, cfg.near, cfg.far)
    cam.move([0, 0, 4])
    cam.rotate(0, np.pi, 0)
    ref = np.asarray(pipe.render(cam))

    mesh = frame_sharded.make_mesh(2)
    frame = frame_sharded.build_sharded_frame(mesh, pipe)
    rgb8, avg = frame(*_sharded_args(pipe, cam))
    out = np.asarray(rgb8)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert (diff > 1).mean() < 1e-3


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sharded_pad_to_tile_bands():
    """Band heights that are not tile multiples pad to the tile grid inside
    each band and crop back (the 1080p-on-8-chips case: 135-row bands on a
    144-row canvas)."""
    from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline
    from direct12pbrrenderer_tpu.scene.camera import Camera

    cfg = RenderConfig(
        width=128, height=120, max_triangles=2048, max_vertices=2048,
        max_instances=4, max_lights=16,
    )
    # 120 / 4 chips = 30-row bands; tile_h 12 -> 36-row band canvases
    pipe = DeferredRenderPipeline(
        build_scene(), cfg, tile_h=12, tile_w=64, bin_cap=512,
        prefilter_size=16, brdf_lut_size=32,
    )
    cam = Camera(cfg.fov, cfg.width, cfg.height, cfg.near, cfg.far)
    cam.move([0, 0, 4])
    cam.rotate(0, np.pi, 0)
    ref = np.asarray(pipe.render(cam))

    mesh = frame_sharded.make_mesh(4)
    frame = frame_sharded.build_sharded_frame(mesh, pipe)
    rgb8, _ = frame(*_sharded_args(pipe, cam))
    out = np.asarray(rgb8)
    assert out.shape == ref.shape
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert (diff > 1).mean() < 1e-3
