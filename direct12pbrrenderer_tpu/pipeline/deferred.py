"""DeferredRenderPipeline: the full frame as one jit-compiled function.

The TPU analog of `DeferredPipeline.{h,cpp}` + `RenderScheduler.cpp`: ten
passes (PreFilterEnvMap, PrecomputeBRDF, Clustered, GBuffer, DeferredShading,
Skybox, Bloom, AutoExposure, ToneMapping, Present) declared against the
render graph, which orders them exactly like FGExecutionParser does from
their read/write sets — including the subtle consequence that AutoExposure
measures the post-bloom image (Bloom re-writes DeferredShadingRT, so every
reader of that RT sorts after it).

The two precompute passes run once and latch (the mReady flag,
DeferredPipeline.cpp:77-136) as cached device arrays. Everything per-frame —
vertex transform, binning, raster, G-buffer shade, clustered light culling,
deferred shading, sky, bloom, exposure, tonemap — traces into a single XLA
program; the average-luminance EMA is threaded as an explicit carry.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    BRDF_LUT_SIZE,
    PREFILTER_ENVMAP_MIP_LEVELS,
    PREFILTER_ENVMAP_SIZE,
    RenderConfig,
)
from ..graph import frame_graph as fg
from ..ops import bloom as bloom_ops
from ..ops import clustered, common, gbuffer, ibl, postprocess, raster, raster_pallas, shading
from ..scene.camera import Camera
from ..scene.scene import Scene
from . import stages
from .scene_pack import PackedScene, pack_scene


@dataclass
class FrameStats:
    visible_instances: int
    total_instances: int
    visible_lights: int
    bin_overflow: int = 0
    tex_approx_taps: int = 0  # cache-kernel taps resolved via fallback
    env_approx_taps: int = 0  # env-cache taps resolved via fallback/cascade
    lights_truncated: int = 0  # visible lights beyond max_active_lights
    light_tile_overflow: int = 0  # per-tile culled lights beyond light_cap


class DeferredRenderPipeline:
    def __init__(
        self,
        scene: Scene,
        config: RenderConfig | None = None,
        tile_h: int = 24,
        tile_w: int = 128,
        bin_cap: int = 2048,
        atlas_max_dim: int | None = 1024,
        prefilter_size: int | None = None,
        brdf_lut_size: int = BRDF_LUT_SIZE,
        use_pallas: bool | None = None,
        use_tex_kernel: bool | None = None,
        texture_filter: str = "trilinear",
        max_active_lights: int = 64,
        pallas_interpret: bool = False,
        light_tile: tuple | None = None,
        light_cap: int | None = None,
        tex_caps: tuple[int, int] | None = None,
        env_budget: int | None = None,
        tex_cascade: bool = False,
        raster_caps: tuple | None = None,
        fused_light_dtype: str | None = None,
    ):
        self.config = config or RenderConfig()
        cfg = self.config
        # arbitrary resolutions (the reference renders at any window size,
        # App.h:77-78): the raster canvas pads up to the tile grid; padded
        # pixels are off-viewport (u,v beyond [0,1] -> rays past the frustum
        # edge) and the RT is cropped back before the post chain, so bloom /
        # exposure / tonemap see exactly the logical frame
        self.render_w = -(-cfg.width // tile_w) * tile_w
        self.render_h = -(-cfg.height // tile_h) * tile_h
        self.tile_h, self.tile_w, self.bin_cap = tile_h, tile_w, bin_cap
        self.max_active_lights = max_active_lights
        # 1024-light operating point: with many active lights the O(N_active)
        # full-frame fori sweep is hopeless; switch to the tile-clustered
        # Pallas kernel (ops/lights_pallas) whose cost is O(lights per tile).
        use_pallas_backend = jax.default_backend() not in ("cpu",)
        if light_tile is None and max_active_lights > 64 and (
            use_pallas if use_pallas is not None else use_pallas_backend
        ):
            light_tile = (tile_h, tile_w)
        self.light_tile = light_tile
        if light_cap is None:
            light_cap = max(128, -(-min(max_active_lights, 1024) // 128) * 128)
        self.light_cap = light_cap
        self.texture_filter = texture_filter
        # texture-cache page budgets (cap_lo, cap_hi): sized by the tap
        # census (tools/tap_census.py) per scene; None keeps the
        # worst-case-content defaults. Under-sized caps degrade to the
        # counted coarsest-mip fallback, never corruption.
        # "auto": the first render() runs the census on the ACTUAL scene
        # at the caller's pose (a short yaw sweep) and sizes caps, per-half
        # block_caps and both staging budgets from the measurement —
        # arbitrary scenes get the fidelity/fps trade measured, not guessed.
        self._auto_caps = tex_caps == "auto"
        self.tex_caps = None if self._auto_caps else tex_caps
        # LOD-clamp cascade for the texture cache (OPT-IN): taps whose
        # page cover overflowed re-tap at mip_lo+3 (a mild blur) instead of
        # the coarsest-mip average. Measured on the reference scene it cut
        # the block_cap-12 gate rmse 0.0043 -> 0.0033 but cost ~8% fps and
        # slightly HURT the block_cap-16 rmse (blur vs average is not a
        # uniform win after shading) — the production fidelity fix is
        # measured cover capacity instead (docs/PERF.md round-4).
        self.tex_cascade = tex_cascade
        # (cap_small, hot_k) override for the two-pass raster's pre-gather
        # split (raster_pallas.split_caps); None keeps the heuristic. Sized
        # from the measured bin-count distribution (docs/PERF.md round-4).
        self.raster_caps = raster_caps
        # "bfloat16": the fused deferred kernel's per-light BRDF chain on
        # bf16 lanes (flag-gated experiment, VERDICT r4 #3); None = f32.
        # Measured: bf16 shading noise exceeds the 1e-3 fidelity budget, so
        # the default stays f32 (docs/PERF.md round-5 A/B).
        self.fused_light_dtype = fused_light_dtype
        # env-cache compact-staging page budget (tools/tap_census.py sizes
        # it); None stages the worst-case cap-shaped layout
        self.env_budget = env_budget
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas and (bin_cap % raster_pallas.CHUNK == 0)
        if use_tex_kernel is None:
            use_tex_kernel = jax.default_backend() not in ("cpu",)
        from ..ops import texcache as _texcache

        self.use_tex_kernel = (
            use_tex_kernel
            and _texcache.pick_tile(self.render_h, self.render_w) is not None
        )
        # Fused G-buffer (round-4): plan + resolve + pixel shade run on the
        # raster kernel's tile blocks with no (H, W) materialization in
        # between. Requires the raster tile to BE the cache tile (lane-major
        # 128-px rows, even height for quad pairs); anisotropic filtering
        # stays on the planar path (it needs the multi-tap XLA sampler).
        self.use_fused_gbuffer = (
            self.use_pallas and self.use_tex_kernel
            and tile_w % 128 == 0 and tile_h % 2 == 0
            and texture_filter in ("trilinear", "bilinear")
        )
        self.pallas_interpret = pallas_interpret
        self.scene = scene
        self.packed: PackedScene = pack_scene(scene, cfg, atlas_max_dim)
        if self.packed.config is not None:
            # adopt the EFFECTIVE config (pools may have auto-grown, with a
            # warning from pack_scene) so self.config always matches the
            # actual device pool sizes
            self.config = cfg = self.packed.config

        # ---- precompute passes (once, latched) ----------------------------
        self.brdf_lut = ibl.brdf_lut(size=brdf_lut_size)
        from ..ops.common import CubeMipAtlas

        if scene.skybox is not None and scene.skybox.cubemap is not None:
            cube = scene.skybox.cubemap
            base = jnp.asarray(
                np.stack([f.mip_array_rgba(0)[..., :3] for f in cube.faces]).astype(
                    np.float32
                )
            )
            n_src = int(np.log2(base.shape[1])) + 1
            src = ibl.build_cubemap_mips(base, n_src)
            size = prefilter_size or min(PREFILTER_ENVMAP_SIZE, base.shape[1])
            pf = ibl.prefilter_env_map(tuple(src), out_size=size)
            self.prefiltered = CubeMipAtlas(pf)
            self.prefiltered_mip_faces = pf
            self.skybox_mip0 = CubeMipAtlas([base])
            self.skybox_faces_mip0 = base
            self.sh_pack = jnp.asarray(cube.sh.as_array())
        else:
            size = prefilter_size or 64
            zeros = [
                jnp.zeros((6, size >> m, size >> m, 3), jnp.float32)
                for m in range(PREFILTER_ENVMAP_MIP_LEVELS)
            ]
            self.prefiltered = CubeMipAtlas(zeros)
            self.prefiltered_mip_faces = zeros
            self.skybox_mip0 = CubeMipAtlas([jnp.zeros((6, 8, 8, 3), jnp.float32)])
            self.skybox_faces_mip0 = jnp.zeros((6, 8, 8, 3), jnp.float32)
            self.sh_pack = jnp.zeros((7, 4), jnp.float32)

        # float page-cache atlas for the deferred-shading taps (env cube
        # trilinear halves + BRDF LUT + skybox) — the kernel-path analog of
        # the texture atlas above (ops/envcache.py)
        from ..ops import envcache as _envcache

        self.use_env_kernel = self.use_tex_kernel
        self.env_ids = None
        # Fused deferred shading (round-4): env resolve + SH + split-sum +
        # the clustered point-light loop + sky run in ONE Pallas kernel on
        # the G-buffer tile blocks (ops/shade_pallas.py). The in-kernel
        # light loop is a serial fori over the compacted active lights, so
        # it serves the <=64-light regime; the 1024-light operating point
        # keeps the O(lights-per-tile) lights_pallas path (light_tile set).
        self.use_fused_deferred = (
            self.use_fused_gbuffer
            and self.light_tile is None
            # belt-and-suspenders with the light_tile auto-pick above: a
            # large light pool must never take the serial in-kernel loop
            and self.max_active_lights <= 64
            and tile_h * tile_w <= 4096
        )
        if self.use_env_kernel:
            b = _envcache.FloatAtlasBuilder()
            pf_np = [np.asarray(m) for m in self.prefiltered_mip_faces]
            env_base = b.add_cube(
                [[m[f] for m in pf_np] for f in range(6)]
            )
            sky_np = np.asarray(self.skybox_faces_mip0)
            sky_base = b.add_cube([[sky_np[f]] for f in range(6)])
            lut_tid = b.add([np.asarray(self.brdf_lut)])
            self.env_atlas = b.build()
            has_env = bool(
                scene.skybox is not None and scene.skybox.cubemap is not None
            )
            self.env_ids = (env_base, sky_base, lut_tid, len(pf_np), has_env)
            self.env_tile = _envcache.pick_tile(self.render_h, self.render_w)
        self.use_fused_deferred = (
            self.use_fused_deferred and self.env_ids is not None
        )

        self.cluster_bounds = jnp.asarray(
            clustered.cluster_bounds(cfg.fov, cfg.ratio, cfg.near, cfg.far)
        )

        # static device buffers
        p = self.packed
        self.buffers = {
            "positions": jnp.asarray(p.positions),
            "normals": jnp.asarray(p.normals),
            "tangents": jnp.asarray(p.tangents),
            "uvs": jnp.asarray(p.uvs),
            "vtx_instance": jnp.asarray(p.vtx_instance),
            "tris": jnp.asarray(p.tris),
            "tri_material": jnp.asarray(p.tri_material),
            "tri_instance": jnp.asarray(p.tri_instance),
            "tri_valid_pool": jnp.asarray(p.tri_valid),
            "mat_rows": jnp.asarray(
                gbuffer.pack_material_rows(
                    p.materials.albedo, p.materials.emission, p.materials.roughness,
                    p.materials.metallic, p.materials.use_map, p.materials.tex_ids,
                )
            ),
            "atlas": gbuffer.AtlasDevice(
                jnp.asarray(p.atlas.data),
                jnp.asarray(p.atlas.page_base),
                jnp.asarray(p.atlas.base_size),
                jnp.asarray(p.atlas.n_mips),
                jnp.asarray(p.atlas.srgb),
            ),
            "light_pos": jnp.asarray(p.light_pos),
            "light_color": jnp.asarray(p.light_color),
            "light_intensity": jnp.asarray(p.light_intensity),
            "light_attenuation": jnp.asarray(p.light_attenuation),
            # precompute products passed as arguments (not jit constants) so
            # they live once in HBM instead of being baked into the executable
            "ClusterBounds": self.cluster_bounds,
            "SkyBoxSH": self.sh_pack,
            "PrecomputeBRDF": (
                common.make_quad_tex2d(self.brdf_lut), self.brdf_lut.shape[0]
            ),
            "PrefilterEnvMap": self.prefiltered,
            "SkyBoxTexture": self.skybox_mip0,
        }
        if self.env_ids is not None:
            self.buffers["EnvCache"] = self.env_atlas

        self.graph = self._build_graph()
        self.avg_luminance = jnp.asarray(0.0, jnp.float32)
        # Donation policy at the jit boundary: the per-call frame's big
        # inputs are all PERSISTENT state reused next call (scene pools in
        # self.buffers, change-tracked scene/camera packs), so only the
        # sequence path — whose camera-pack stack and EMA carry are fresh
        # per dispatch — has donatable arguments. In-frame transient
        # aliasing is the graph's lifetime-driven drops (frame_graph.py),
        # which XLA turns into buffer reuse inside the single jit.
        self._frame_jit = jax.jit(self._frame)
        # donate only the EMA carry: it aliases the returned avg (same
        # shape/dtype); the camera-pack stack has no matching output, so
        # donating it would just emit XLA's unused-donation warning
        self._frame_seq_jit = jax.jit(self._frame_seq, donate_argnums=(3,))
        self.last_stats: FrameStats | None = None
        # upload caches: scene/camera packs are only re-uploaded on change
        self._scene_np = self._scene_dev = None
        self._cam_np = self._cam_dev = None

    # ------------------------------------------------------------------
    def _build_graph(self) -> fg.CompiledGraph:
        cfg = self.config
        w, h = cfg.width, cfg.height          # logical viewport
        rw, rh = self.render_w, self.render_h  # padded raster canvas

        def cull_pass(env):
            # Scene::CullModel / light cull on DEVICE (vectorized AABB vs
            # Gribb-Hartmann planes — the LooseOctree traversal's TPU-era
            # analog, SURVEY §7): keeps the host out of the frame loop
            p = self.packed
            n_inst, n_lgt = p.instance_count, p.light_count
            i_pool = p.model_mats.shape[0]
            l_pool = p.light_pos.shape[0]
            vis = jnp.zeros((i_pool,), bool)
            if n_inst:
                m = common.frustum_cull_aabbs(
                    env["FrustumPlanes"],
                    env["InstanceBounds"][:n_inst, 0],
                    env["InstanceBounds"][:n_inst, 1],
                )
                vis = vis.at[:n_inst].set(m)
            lv = jnp.zeros((l_pool,), bool)
            if n_lgt:
                m = common.frustum_cull_aabbs(
                    env["FrustumPlanes"],
                    env["LightBounds"][:n_lgt, 0],
                    env["LightBounds"][:n_lgt, 1],
                )
                lv = lv.at[:n_lgt].set(m)
            counts = jnp.stack([vis.sum(dtype=jnp.int32),
                                lv.sum(dtype=jnp.int32)])
            return {"InstanceVisible": vis, "LightValid": lv,
                    "VisibleCounts": counts}

        def clustered_pass(env):
            active = stages.active_lights(
                env, env["LightValid"], env["View"], self.max_active_lights
            )
            return {"FrustumCluster": (env["ClusterBounds"], active),
                    "PointLights": active[:, 13] > 0}

        def gbuffer_pass(env):
            setup, vattrs = stages.geometry(
                env, env["ModelMats"], env["NormalMats"],
                env["InstanceVisible"], env["ViewProj"], w, h,
            )
            bins = stages.binning(
                setup, rw, rh, self.tile_h, self.tile_w, self.bin_cap
            )
            if self.use_fused_gbuffer:
                # round-4 fused path: raster tile blocks feed the plan +
                # resolve + shade directly (texcache.shade_planes_fused) —
                # the stage's only (H, W) materializations are tri_id/depth
                # and the final 9-channel G-buffer untile
                (tri_id, depth, pl_tiles, id_tiles,
                 z_tiles) = stages.rasterize_interp(
                    setup, bins, env, vattrs, rw, rh, self.tile_h, self.tile_w,
                    pallas_interpret=self.pallas_interpret, return_tiled=True,
                    raster_caps=self.raster_caps,
                )
                out = gbuffer.gbuffer_shade_fused(
                    tri_id, depth, pl_tiles, id_tiles, env["atlas"],
                    rh, rw, self.tile_h, self.tile_w, self.texture_filter,
                    tex_interpret=self.pallas_interpret,
                    tex_caps=self.tex_caps, tex_cascade=self.tex_cascade,
                    return_tiled=self.use_fused_deferred,
                )
                result = {}
                if self.use_fused_deferred:
                    # hand the raw tile blocks straight to the fused deferred
                    # kernel; the GBufferA/B/C untiles below become XLA dead
                    # code when only GBufferTiles is read downstream
                    gb, gb_tiles = out
                    result["GBufferTiles"] = (gb_tiles, z_tiles, id_tiles)
                else:
                    gb = out
                result.update({
                    "GBufferA": gb.albedo_emission,
                    "GBufferB": gb.normal_oct,
                    "GBufferC": gb.rough_metal_ao,
                    "GBufferDepthStencil": (gb.depth, gb.mask),
                    "BinCounts": bins.counts,
                    "TexApproxCount": gb.tex_approx,
                })
                return result
            if self.use_pallas:
                # fused raster + attribute interpolation: the winning row is
                # selected inside the depth fold (VMEM), removing the
                # per-pixel 256 B tri_rows gather; planes match the gather
                # path to FMA re-association (tests/test_raster_pallas.py)
                tri_id, depth, planes = stages.rasterize_interp(
                    setup, bins, env, vattrs, rw, rh, self.tile_h, self.tile_w,
                    pallas_interpret=self.pallas_interpret,
                    raster_caps=self.raster_caps,
                )
                gb = gbuffer.gbuffer_shade_planar(
                    tri_id, depth, planes, env["atlas"], self.texture_filter,
                    use_tex_kernel=self.use_tex_kernel,
                    tex_interpret=self.pallas_interpret,
                    tex_caps=self.tex_caps, tex_cascade=self.tex_cascade,
                )
                return {
                    "GBufferA": gb.albedo_emission,
                    "GBufferB": gb.normal_oct,
                    "GBufferC": gb.rough_metal_ao,
                    "GBufferDepthStencil": (gb.depth, gb.mask),
                    "BinCounts": bins.counts,
                    "TexApproxCount": (
                        gb.tex_approx if gb.tex_approx is not None
                        else jnp.zeros((), jnp.int32)
                    ),
                }
            tri_id, depth = stages.rasterize(
                setup, bins, rw, rh, self.tile_h, self.tile_w, self.use_pallas,
                pallas_interpret=self.pallas_interpret,
                raster_caps=self.raster_caps,
            )
            gb = stages.gbuffer_shade(
                tri_id, depth, setup, env, vattrs, rw, rh,
                texture_filter=self.texture_filter,
                use_tex_kernel=self.use_tex_kernel,
                tex_interpret=self.pallas_interpret,
                tex_caps=self.tex_caps, tex_cascade=self.tex_cascade,
            )
            return {
                "GBufferA": gb.albedo_emission,
                "GBufferB": gb.normal_oct,
                "GBufferC": gb.rough_metal_ao,
                "GBufferDepthStencil": (gb.depth, gb.mask),
                "BinCounts": bins.counts,
                "TexApproxCount": (
                    gb.tex_approx if gb.tex_approx is not None
                    else jnp.zeros((), jnp.int32)
                ),
            }

        def deferred_pass(env):
            depth, mask = env["GBufferDepthStencil"]
            _bounds_t, active = env["FrustumCluster"]
            if self.use_fused_deferred:
                # round-4 fully-fused back half: env resolve + SH diffuse +
                # split-sum + in-kernel clustered point lights + sky in ONE
                # Pallas kernel on the G-buffer tile blocks
                gb_tiles, z_tiles, id_tiles = env["GBufferTiles"]
                rt, env_approx = stages.deferred_shade_fused(
                    gb_tiles, z_tiles, id_tiles, env, active,
                    env["InvView"], env["CameraPos"], cfg, rw, rh,
                    self.tile_h, self.tile_w, self.env_ids,
                    full_height=h, full_width=w,
                    env_budget=self.env_budget,
                    env_interpret=self.pallas_interpret,
                    light_dtype=self.fused_light_dtype,
                )
                if (rw, rh) != (w, h):
                    rt = rt[:h, :w]
                return {"DeferredShadingRT": rt,
                        "LightTruncCount": jnp.zeros((), jnp.int32),
                        "EnvApproxCount": env_approx}
            gb = gbuffer.GBuffer(
                env["GBufferA"], env["GBufferB"], env["GBufferC"], depth, mask
            )
            rt, env_approx = stages.deferred_shade(
                gb, env, active, env["InvView"], env["CameraPos"], cfg,
                rw, rh, full_height=h, full_width=w,
                env_ids=self.env_ids,
                env_tile=self.env_tile if self.env_ids is not None else None,
                env_interpret=self.pallas_interpret,
                env_budget=self.env_budget, return_env_approx=True,
                light_tile=self.light_tile, light_cap=self.light_cap,
            )
            if (rw, rh) != (w, h):
                rt = rt[:h, :w]  # crop the pad-to-tile canvas
            if self.light_tile is not None:
                # per-tile culled-light counts for the truncation stat (XLA
                # CSEs this with the identical cull inside the light kernel)
                from ..ops import lights_pallas

                th, tw = self.light_tile
                _, counts = lights_pallas.tile_light_lists(
                    active, rh // th, rw // tw, th, tw, w, h,
                    cfg.fov, cfg.ratio, cfg.near, cfg.far, self.light_cap,
                )
                trunc = jnp.maximum(counts - self.light_cap, 0).max()
            else:
                trunc = jnp.zeros((), jnp.int32)
            return {"DeferredShadingRT": rt, "LightTruncCount": trunc,
                    "EnvApproxCount": env_approx}

        def skybox_pass(env):
            # composited inside deferred_shade (sky where stencil==0); the
            # pass exists for graph parity and re-publishes the RT
            return {"DeferredShadingRT": env["DeferredShadingRT"]}

        def bloom_pass(env):
            if not cfg.enable_bloom:
                return {"DeferredShadingRT": env["DeferredShadingRT"]}
            return {"DeferredShadingRT": bloom_ops.bloom(env["DeferredShadingRT"])}

        def auto_exposure_pass(env):
            # the histogram resource is produced for parity/debug consumers,
            # but the average is computed by direct reductions so the 256-bin
            # scatter-add (a sort on TPU) is dead code in the fused frame
            # whenever nothing reads LuminanceHistogram
            hist = postprocess.luminance_histogram(env["DeferredShadingRT"])
            if cfg.enable_auto_exposure:
                avg = postprocess.average_luminance_direct(
                    env["DeferredShadingRT"], float(w * h),
                    env["PrevAverageLuminance"], env["DeltaTime"]
                )
            else:
                avg = jnp.asarray(0.18, jnp.float32)
            return {"LuminanceHistogram": hist, "AverageLuminance": avg}

        def tone_mapping_pass(env):
            out = postprocess.tone_map(env["DeferredShadingRT"], env["AverageLuminance"])
            return {"ToneMappedTexture": out}

        def present_pass(env):
            rgb8 = (env["ToneMappedTexture"] * 255.0 + 0.5).astype(jnp.uint8)
            return {"BackBuffer": (rgb8, env["AverageLuminance"],
                                   env["BinCounts"], env["TexApproxCount"],
                                   env["LightTruncCount"],
                                   env["EnvApproxCount"],
                                   env["VisibleCounts"])}

        static_reads = tuple(self.buffers.keys())
        passes = [
            fg.RenderPass(
                "Cull",
                ("FrustumPlanes", "InstanceBounds", "LightBounds"),
                ("InstanceVisible", "LightValid", "VisibleCounts"),
                cull_pass,
            ),
            fg.RenderPass(
                "Clustered",
                ("ClusterBounds", "View", "light_pos", "light_attenuation",
                 "light_intensity", "LightValid"),
                ("FrustumCluster", "PointLights"),
                clustered_pass,
            ),
            fg.RenderPass(
                "GBuffer",
                ("positions", "normals", "tangents", "uvs", "vtx_instance",
                 "tris", "tri_material", "tri_instance", "tri_valid_pool",
                 "mat_rows", "atlas", "ModelMats", "NormalMats",
                 "ViewProj", "InstanceVisible"),
                ("GBufferA", "GBufferB", "GBufferC", "GBufferDepthStencil",
                 "BinCounts", "TexApproxCount")
                + (("GBufferTiles",) if self.use_fused_deferred else ()),
                gbuffer_pass,
                declares={
                    "GBufferA": fg.ResourceDesc((rh, rw, 4), "float32"),
                    "GBufferB": fg.ResourceDesc((rh, rw, 2), "float32"),
                    "GBufferC": fg.ResourceDesc((rh, rw, 3), "float32"),
                },
            ),
            fg.RenderPass(
                "DeferredShading",
                ("GBufferA", "GBufferB", "GBufferC", "GBufferDepthStencil",
                 "SkyBoxSH", "PrecomputeBRDF", "PrefilterEnvMap", "SkyBoxTexture",
                 "FrustumCluster", "InvView", "CameraPos")
                + (("EnvCache",) if self.env_ids is not None else ())
                + (("GBufferTiles",) if self.use_fused_deferred else ()),
                ("DeferredShadingRT", "LightTruncCount", "EnvApproxCount"),
                deferred_pass,
                declares={
                    "GBufferA": fg.ResourceDesc((rh, rw, 4), "float32"),
                    "GBufferB": fg.ResourceDesc((rh, rw, 2), "float32"),
                    "GBufferC": fg.ResourceDesc((rh, rw, 3), "float32"),
                    "DeferredShadingRT": fg.ResourceDesc((h, w, 3), "float32"),
                },
            ),
            fg.RenderPass("Skybox", (), ("DeferredShadingRT",), skybox_pass),
            fg.RenderPass(
                "Bloom", ("DeferredShadingRT",), ("DeferredShadingRT",), bloom_pass,
                declares={
                    "DeferredShadingRT": fg.ResourceDesc((h, w, 3), "float32"),
                },
            ),
            fg.RenderPass(
                "AutoExposure",
                ("DeferredShadingRT", "PrevAverageLuminance", "DeltaTime"),
                ("LuminanceHistogram", "AverageLuminance"),
                auto_exposure_pass,
            ),
            fg.RenderPass(
                "ToneMapping",
                ("DeferredShadingRT", "AverageLuminance"),
                ("ToneMappedTexture",),
                tone_mapping_pass,
                declares={
                    "ToneMappedTexture": fg.ResourceDesc((h, w, 3), "float32"),
                },
            ),
            fg.RenderPass(
                "Present",
                ("ToneMappedTexture", "AverageLuminance", "BinCounts",
                 "TexApproxCount", "LightTruncCount", "EnvApproxCount",
                 "VisibleCounts"),
                ("BackBuffer",),
                present_pass,
            ),
        ]
        return fg.compile_graph(passes, present="Present")

    # ------------------------------------------------------------------
    def _frame(self, buffers, scene_f32, cam_f32, prev_avg_lum):
        # two packed uploads feed the frame: the SCENE pack (matrices +
        # world AABBs — re-uploaded only when a transform actually changes,
        # see render()) and the tiny CAMERA pack (76 floats, per frame).
        # Frustum culling runs on device (the Cull graph pass), so on the
        # remote-attached platform — where every transfer is an RPC and
        # per-frame RPC issue time gates the pipelined frame rate — a
        # static scene costs one small upload per frame, independent of
        # instance count.
        p = self.packed
        i = p.model_mats.shape[0]
        mm = scene_f32[: i * 16].reshape(i, 4, 4)
        off = i * 16
        nm = scene_f32[off : off + i * 9].reshape(i, 3, 3)
        off += i * 9
        nb = p.instance_bounds.shape[0]
        ib = scene_f32[off : off + nb * 6].reshape(nb, 2, 3)
        off += nb * 6
        lbn = p.light_bounds.shape[0]
        lb = scene_f32[off : off + lbn * 6].reshape(lbn, 2, 3)

        planes = cam_f32[:24].reshape(6, 4)
        view = cam_f32[24:40].reshape(4, 4)
        inv_view = cam_f32[40:56].reshape(4, 4)
        view_proj = cam_f32[56:72].reshape(4, 4)
        camera_pos = cam_f32[72:75]
        delta_time = cam_f32[75]
        env = dict(buffers)
        env.update(
            ModelMats=mm,
            NormalMats=nm,
            InstanceBounds=ib,
            LightBounds=lb,
            FrustumPlanes=planes,
            View=view,
            InvView=inv_view,
            ViewProj=view_proj,
            CameraPos=camera_pos,
            PrevAverageLuminance=prev_avg_lum,
            DeltaTime=delta_time,
        )
        out = fg.execute(self.graph, env)
        return out["BackBuffer"]

    def _frame_seq(self, buffers, scene_f32, cam_seq_f32, prev_avg_lum):
        """N frames in ONE dispatch: lax.scan over per-frame camera packs
        with the exposure EMA threaded as the scan carry.

        On this remote-attached platform each dispatch costs ~30 ms of RPC
        enqueue that does NOT fully overlap device execution (docs/PERF.md
        round-3 rpc decomposition); an animation/benchmark loop that knows
        its camera path amortizes that to once per sequence. Semantically
        identical to N render() calls (same per-frame camera packs, same
        EMA carry chain) minus the per-frame stats outputs."""
        def body(avg, cam_f32):
            out = self._frame(buffers, scene_f32, cam_f32, avg)
            return out[1], out[0]  # carry new avg, emit rgb8

        avg, frames = jax.lax.scan(body, prev_avg_lum, cam_seq_f32)
        return frames, avg

    # ------------------------------------------------------------------
    def _pack_camera(self, camera: Camera, delta_time: float) -> np.ndarray:
        view = camera.view_matrix()
        return np.concatenate([
            np.asarray(camera.frustum_planes(), np.float32).ravel(),
            np.asarray(view, np.float32).ravel(),
            np.asarray(camera.world_matrix(), np.float32).ravel(),
            np.asarray(camera.projection_matrix() @ view, np.float32).ravel(),
            np.asarray(camera.position, np.float32).ravel(),
            np.float32([delta_time]),
        ]).astype(np.float32)

    def _pack_scene(self) -> np.ndarray:
        p = self.packed
        normal_mats = np.ascontiguousarray(
            np.transpose(p.inv_model_mats[:, :3, :3], (0, 2, 1))
        )
        return np.concatenate([
            p.model_mats.ravel(), normal_mats.ravel(),
            p.instance_bounds.ravel(), p.light_bounds.ravel(),
        ]).astype(np.float32)

    def _ensure_auto_caps(self, camera: Camera):
        """tex_caps="auto": size every cache budget from a census of the
        ACTUAL scene at the caller's first pose (tools/tap_census over a
        short yaw sweep), then rebuild the graph/jits once. Costs a few
        probe frames' worth of device work before the first real frame;
        after that the pipeline is indistinguishable from one constructed
        with the measured numbers hand-wired."""
        if not getattr(self, "_auto_caps", False):
            return
        self._auto_caps = False
        if not self.use_tex_kernel:
            return  # XLA sampler path has no budgets to size
        import copy

        from ..ops import envcache as _envcache
        from ..ops import texcache as _texcache
        from ..tools import tap_census as _census

        censuses, caps, env_censuses = _census.run_census(
            # run_census rotates the camera along the sweep — probe a copy
            self, copy.deepcopy(camera), poses=3, yaw_sweep_deg=30.0,
        )
        block_caps = _texcache.recommend_block_caps(censuses)
        budget = _texcache.recommend_budget(censuses)
        self.tex_caps = (caps[0], caps[1], budget, block_caps)
        if env_censuses:
            self.env_budget = _envcache.recommend_budget(env_censuses)
        if self.tex_cascade is False:
            # measured fidelity config: outlier rows (beyond the sized
            # block_caps) resolve at near-trilinear via the mip+1 cascade
            # instead of the coarsest-mip average (docs/PERF.md round-5)
            self.tex_cascade = (12, 8, 1)
        import logging

        logging.getLogger(__name__).info(
            "auto tex caps: cap=(%d,%d) block_cap=%s stage_budget=%d "
            "env_budget=%s", caps[0], caps[1], block_caps, budget,
            self.env_budget,
        )
        self.graph = self._build_graph()
        self._frame_jit = jax.jit(self._frame)
        self._frame_seq_jit = jax.jit(self._frame_seq, donate_argnums=(3,))

    def render_sequence(self, cameras, delta_time: float = 1.0 / 60.0):
        """Render a camera path as ONE device dispatch.

        cameras: list of Camera (a real animation path — each frame gets its
        own frustum/view/projection pack and the exposure EMA carries across
        frames exactly like per-frame render() calls). Returns the stacked
        (N, H, W, 3) uint8 frames (device array). The playback/benchmark
        analog of the reference's frame loop (App.cpp:354-380) without
        per-frame host round-trips."""
        if cameras:
            self._ensure_auto_caps(cameras[0])
        scene_f32 = self._pack_scene()
        if self._scene_np is None or not np.array_equal(
            self._scene_np, scene_f32
        ):
            self._scene_np = scene_f32
            self._scene_dev = jnp.asarray(scene_f32)
        cam_seq = np.stack([self._pack_camera(c, delta_time) for c in cameras])
        frames, avg = self._frame_seq_jit(
            self.buffers, self._scene_dev, jnp.asarray(cam_seq),
            self.avg_luminance,
        )
        self.avg_luminance = avg
        return frames

    # ------------------------------------------------------------------
    def render(
        self, camera: Camera, delta_time: float = 1.0 / 60.0, collect_stats: bool = True
    ):
        """One frame -> (H, W, 3) uint8 (device array).

        collect_stats=False skips the host readback of the bin counters so
        frames stay fully async (benchmark path)."""
        self._ensure_auto_caps(camera)
        p = self.packed
        # SCENE pack (matrices + world AABBs): re-uploaded only when a
        # transform changed — a static scene pays zero scene-upload RPCs
        # per frame regardless of instance count (culling is on device)
        scene_f32 = self._pack_scene()
        if self._scene_np is None or not np.array_equal(
            self._scene_np, scene_f32
        ):
            self._scene_np = scene_f32
            self._scene_dev = jnp.asarray(scene_f32)

        # CAMERA pack: 76 floats per frame (planes + view/inv/proj + pos
        # + dt); skipped too when bit-identical (static-pose loops)
        cam_f32 = self._pack_camera(camera, delta_time)
        if self._cam_np is None or not np.array_equal(self._cam_np, cam_f32):
            self._cam_np = cam_f32
            self._cam_dev = jnp.asarray(cam_f32)

        (rgb8, avg, bin_counts, tex_approx, light_trunc, env_approx,
         vis_counts) = self._frame_jit(
            self.buffers,
            self._scene_dev,
            self._cam_dev,
            self.avg_luminance,
        )
        self.avg_luminance = avg
        if collect_stats:
            counts_np = np.asarray(bin_counts)
            overflow = int(np.maximum(counts_np - self.bin_cap, 0).max())
            if self.use_pallas:
                # two-pass raster: tiles beyond the hot set that exceed the
                # small cap also lose triangles — surface them the same way
                if self.raster_caps is not None:
                    cap_small, hot_k = self.raster_caps
                    hot_k = min(hot_k, counts_np.size)
                else:
                    cap_small, hot_k = raster_pallas.split_caps(
                        self.bin_cap, counts_np.size
                    )
                n_over_small = int((counts_np > cap_small).sum())
                if n_over_small > hot_k:
                    over = np.sort(counts_np[counts_np > cap_small])
                    overflow = max(
                        overflow,
                        int(np.maximum(over[:-hot_k] - cap_small, 0).max())
                        if hot_k else int((over - cap_small).max()),
                    )
            vis_np = np.asarray(vis_counts)
            n_vis_lights = int(vis_np[1])
            self.last_stats = FrameStats(
                visible_instances=int(vis_np[0]),
                total_instances=p.instance_count,
                visible_lights=n_vis_lights,
                bin_overflow=overflow,
                tex_approx_taps=int(tex_approx),
                env_approx_taps=int(env_approx),
                lights_truncated=max(0, n_vis_lights - self.max_active_lights),
                light_tile_overflow=int(light_trunc),
            )
            if self.last_stats.lights_truncated:
                import logging

                logging.getLogger(__name__).warning(
                    "%d visible lights exceed max_active_lights=%d; excess "
                    "lights are dropped (raise max_active_lights)",
                    n_vis_lights, self.max_active_lights,
                )
        return rgb8
