"""Env-cache contribution to END-TO-END error, isolated at the pipeline
stage level (VERDICT r4 #8).

Same G-buffer, same lights, same exposure: `stages.deferred_shade` with the
env Pallas kernel vs the XLA samplers. Two bars:

- vs bf16-quantized XLA content the kernel must be bit-near (this checks the
  cover/staging machinery, with the storage precision factored out);
- vs f32 XLA content the error budget is the 16-bit page store itself — the
  parity norm, since the reference keeps its prefiltered env / BRDF LUT as
  RGBA16F textures (DeferredPipeline.h:38-41) and its hardware samples
  16-bit floats too. A regression in cover/addressing/fallback logic shows
  up far above this budget.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from direct12pbrrenderer_tpu.config import RenderConfig
from direct12pbrrenderer_tpu.resource import reflection_def  # noqa: F401
from direct12pbrrenderer_tpu.resource.default_meshes import sphere_mesh
from direct12pbrrenderer_tpu.resource.resources import (
    CubeMapResource,
    MaterialResource,
    MeshResource,
    ModelResource,
)
from direct12pbrrenderer_tpu.resource.storage import (
    CubeMapTextureData,
    ETextureFormat,
    TextureData,
)
from direct12pbrrenderer_tpu.scene.camera import Camera
from direct12pbrrenderer_tpu.scene.scene import Scene, SceneLight, SceneModel


def _sky_cube(size=16):
    """Horizon-gradient HDR sky (nonzero env taps at every roughness)."""
    from direct12pbrrenderer_tpu.ops.common import cubemap_face_dirs

    dirs = cubemap_face_dirs(size)
    y = dirs[..., 1:2]
    sky = (np.array([0.4, 0.5, 0.8], np.float32) * np.clip(y, 0, 1)
           + np.array([0.3, 0.25, 0.2], np.float32) * np.clip(-y, 0, 1)
           + 0.2 + 0.3 * np.clip(dirs[..., :1], 0, 1))
    faces = [
        TextureData.from_array(
            np.concatenate([sky[i], np.ones_like(sky[i][..., :1])],
                           -1).astype(np.float32),
            ETextureFormat.R32G32B32A32_FLOAT,
        )
        for i in range(6)
    ]
    return CubeMapTextureData(faces=faces)


def _scene():
    # one sphere with constant roughness: the env mip level is then uniform
    # across each 128-px row, so the cover's distinct-page demand stays
    # under block_cap and the isolated comparison has zero fallback taps
    # (varied-roughness / overflow behavior is covered per-op in
    # tests/test_envcache.py)
    scene = Scene("mem/env_iso")
    for i, (x, rough, metal) in enumerate([(0.0, 0.4, 0.3)]):
        mesh_res = MeshResource(f"mem/s{i}", f"mem/s{i}_data")
        mesh_res.mesh = sphere_mesh(1.0, 16, 12)
        mat = MaterialResource(f"mem/m{i}")
        mat.set_shader("gbuffer.hlsl")
        mat.set_parameter("Albedo", np.array([0.8, 0.6, 0.4], np.float32))
        mat.set_parameter("Roughness", rough)
        mat.set_parameter("Metallic", metal)
        model = ModelResource(f"mem/model{i}", mesh_res, [mat])
        sm = SceneModel(f"ball{i}")
        sm.set_model(model)
        sm.translation = np.array([x, 0, 0], np.float32)
        sm.update_transform()
        sm.local_bound_min, sm.local_bound_max = model.bound
        scene.add_model(sm)
    light = SceneLight("key")
    light.translation = np.array([2.0, 2.0, -2.0], np.float32)
    light.update_transform()
    light.color = np.array([1.0, 1.0, 1.0], np.float32)
    light.set_intensity(12.0)
    light.set_radius(2.0)
    scene.add_light(light)
    sky_res = CubeMapResource("mem/sky")
    sky_res.cubemap = _sky_cube(16)
    scene.set_skybox(sky_res)
    return scene


def test_env_kernel_isolated_error():
    from direct12pbrrenderer_tpu.ops import postprocess
    from direct12pbrrenderer_tpu.ops.common import CubeMipAtlas, make_quad_tex2d
    from direct12pbrrenderer_tpu.ops.envcache import quantize_bf16
    from direct12pbrrenderer_tpu.pipeline import stages
    from direct12pbrrenderer_tpu.pipeline.deferred import DeferredRenderPipeline

    cfg = RenderConfig(width=128, height=96, max_triangles=2048,
                       max_vertices=2048, max_instances=4, max_lights=4)
    # content sized so no 128-px row can exceed the env cover's block_cap
    # (8 distinct pages/row/group): 8px faces = 1 page each, 16px LUT = 2
    # pages — the isolated comparison then has ZERO fallback taps and the
    # bit-near assertion checks pure machinery (overflow semantics are
    # covered by tests/test_envcache.py)
    pipe = DeferredRenderPipeline(
        _scene(), cfg, tile_h=24, tile_w=128, bin_cap=256,
        prefilter_size=8, brdf_lut_size=16,
        use_tex_kernel=True, pallas_interpret=True,
    )
    assert pipe.env_ids is not None and pipe.env_ids[4]  # has_env
    cam = Camera(cfg.fov, cfg.width, cfg.height, cfg.near, cfg.far)
    cam.move([0, 0, 3])
    cam.rotate(0, np.pi, 0)

    # one G-buffer through the XLA stages, shared by every shade variant
    p = pipe.packed
    planes = cam.frustum_planes()
    view = cam.view_matrix()
    env = dict(pipe.buffers)
    rw, rh = pipe.render_w, pipe.render_h
    setup, vattrs = stages.geometry(
        env, jnp.asarray(p.model_mats),
        jnp.asarray(np.ascontiguousarray(
            np.transpose(p.inv_model_mats[:, :3, :3], (0, 2, 1)))),
        jnp.asarray(p.instance_visibility(planes)),
        jnp.asarray(cam.projection_matrix() @ view), cfg.width, cfg.height,
    )
    bins = stages.binning(setup, rw, rh, 24, 128, 256)
    tri_id, depth = stages.rasterize(setup, bins, rw, rh, 24, 128, False)
    gb = stages.gbuffer_shade(tri_id, depth, setup, env, vattrs, rw, rh,
                              texture_filter="trilinear")
    active = stages.active_lights(
        env, jnp.asarray(p.visible_lights(planes)), jnp.asarray(view), 64
    )
    inv_view = jnp.asarray(cam.world_matrix())
    cam_pos = jnp.asarray(cam.position)

    def shade(buffers, env_kernel):
        rt, approx = stages.deferred_shade(
            gb, buffers, active, inv_view, cam_pos, cfg, rw, rh,
            full_height=cfg.height, full_width=cfg.width,
            env_ids=pipe.env_ids if env_kernel else None,
            env_tile=pipe.env_tile if env_kernel else None,
            env_interpret=True, return_env_approx=True,
        )
        # fixed exposure so the comparison is on shading alone
        img = postprocess.tone_map(rt[: cfg.height, : cfg.width],
                                   jnp.asarray(0.18, jnp.float32))
        return np.asarray(img, np.float64), int(approx)

    a, n_approx = shade(env, env_kernel=True)
    assert n_approx == 0  # content sized so every cover holds (see above)

    # bf16-quantize the XLA samplers' content to match the page store
    env_q = dict(env)
    env_q["PrefilterEnvMap"] = CubeMipAtlas(
        [jnp.asarray(quantize_bf16(np.asarray(m)))
         for m in pipe.prefiltered_mip_faces]
    )
    env_q["SkyBoxTexture"] = CubeMipAtlas(
        [jnp.asarray(quantize_bf16(np.asarray(pipe.skybox_faces_mip0)))]
    )
    lut_q = quantize_bf16(np.asarray(pipe.brdf_lut))
    env_q["PrecomputeBRDF"] = (
        make_quad_tex2d(jnp.asarray(lut_q)), lut_q.shape[0]
    )
    b_q, _ = shade(env_q, env_kernel=False)
    rmse_q = float(np.sqrt(np.mean((a - b_q) ** 2)))
    # machinery bar: same content -> ULP-level only (interpolation op
    # ordering differs between kernel and XLA samplers); a fallback or
    # addressing regression reads 100x above this
    assert rmse_q <= 5e-5, rmse_q

    b_f, _ = shade(env, env_kernel=False)
    rmse_f = float(np.sqrt(np.mean((a - b_f) ** 2)))
    # storage-precision budget (bf16 pages vs f32 reference)
    assert rmse_f <= 1.5e-3, rmse_f
