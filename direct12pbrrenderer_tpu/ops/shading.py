"""Deferred shading pass: SH ambient diffuse + split-sum specular + clustered
point lights + emission, plus the deferred skybox.

Mirrors `deferred_shading.hlsl` exactly, including its quirks:
* the hardcoded directional light is *computed but never added* to the final
  sum (deferred_shading.hlsl:144-156 vs :191) — we skip computing it;
* ambient occlusion is read from GBufferC but never applied;
* final = env_diffuse + env_specular + point_lights + emission.

World position is reconstructed from ndc depth + the camera ray through the
pixel (deferred_shading.hlsl:72-121); the stencil sky mask becomes the
coverage mask from the rasterizer, and the skybox pass (skybox.hlsl) reduces
to sampling the cubemap along the view ray wherever no geometry covered the
pixel (the far-plane-scaled sphere passes the depth test exactly there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import MAX_LIGHTS_PER_CLUSTER, PREFILTER_ENVMAP_MIP_LEVELS  # noqa: F401
from . import clustered, common


def view_space_depth(ndc_depth, near, far):
    """ndc z [0,1] -> view z [near, far] (deferred_shading.hlsl:76-79)."""
    return near * far / (far - ndc_depth * (far - near))


def camera_rays(width, height, inv_view, fov, ratio, near, y_offset=0,
                full_height=None, full_width=None):
    """Per-pixel world-space camera->near-plane vectors.

    Generalizes the reference's triangle-corner interpolation trick
    (deferred_shading.hlsl:95-121): camera_vec is linear in uv, so evaluate
    it directly per pixel: ((u-0.5)*w, (0.5-v)*h, near) rotated to world.
    (width, height) is the raster canvas; (full_width, full_height) the
    logical viewport the projection maps to — they differ for row-band
    sharding (y_offset/full_height) and for pad-to-tile rendering at
    arbitrary resolutions (padded pixels get u,v beyond [0,1], i.e. rays
    continuing past the frustum edge, and are cropped before present).
    """
    near_h = 2.0 * near * jnp.tan(fov / 2.0)
    near_w = near_h * ratio
    fh = full_height if full_height is not None else height
    fw = full_width if full_width is not None else width
    v, u = jnp.meshgrid(
        (jnp.arange(height, dtype=jnp.float32) + 0.5 + y_offset) / fh,
        (jnp.arange(width, dtype=jnp.float32) + 0.5) / fw,
        indexing="ij",
    )
    cam = jnp.stack(
        [
            (u - 0.5) * near_w,
            (0.5 - v) * near_h,
            jnp.full_like(u, near),
        ],
        -1,
    )
    rot = inv_view[:3, :3]
    return jnp.einsum("ij,hwj->hwi", rot, cam, precision=jax.lax.Precision.HIGHEST)


def pixel_view_geometry(depth, normal, inv_view, camera_pos, width, height,
                        fov, ratio, near, far, y_offset=0, full_height=None,
                        full_width=None):
    """Per-pixel view-space geometry shared by deferred_shade and the env
    tap census: (position, view_dir, z_view, n_dot_v, refl, ray) from the
    depth buffer + decoded normals (deferred_shading.hlsl:96-110 world-pos
    reconstruction + the split-sum reflection setup)."""
    cam_vec = camera_rays(width, height, inv_view, fov, ratio, near, y_offset,
                          full_height, full_width)
    z_view = view_space_depth(depth, near, far)
    position = camera_pos[None, None, :] + cam_vec * (z_view / near)[..., None]
    view_dir = camera_pos[None, None, :] - position
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-20
    )
    n_dot_v = jnp.maximum((normal * view_dir).sum(-1), 0.0)
    refl = 2.0 * (normal * view_dir).sum(-1, keepdims=True) * normal - view_dir
    refl = refl / jnp.maximum(
        jnp.linalg.norm(refl, axis=-1, keepdims=True), 1e-20
    )
    ray = cam_vec / jnp.maximum(
        jnp.linalg.norm(cam_vec, axis=-1, keepdims=True), 1e-20
    )
    return position, view_dir, z_view, n_dot_v, refl, ray


def env_tap_groups(refl, ray, roughness, n_dot_v, mask, env_ids):
    """The deferred pass's env-page-cache tap groups, one place: per-pixel
    (tex, mip, u, v, active) stacks for the env trilinear halves, the BRDF
    LUT, the background sky, and (when env content exists) the LOD-clamp
    cascade — plus the matching fb_tids/caps. `tools/tap_census.py` feeds
    these to `envcache.tap_census` so budget sizing measures the EXACT
    addressing the frame uses. Returns (tex, mip, u, v, act, fb_tids, caps,
    fracm, has_env)."""
    env_base, sky_base, lut_tid, env_mips, has_env = (
        env_ids if len(env_ids) == 5 else (*env_ids, True)
    )
    lvl = jnp.clip(roughness * PREFILTER_ENVMAP_MIP_LEVELS, 0.0,
                   env_mips - 1.0)
    lo = jnp.floor(lvl).astype(jnp.int32)
    fracm = (lvl - lo)[..., None]
    hi = jnp.minimum(lo + 1, env_mips - 1)
    # LOD-clamp cascade (what a HW texture cache does when a mip isn't
    # resident): group 4 re-taps the env at mip+3 — 64x fewer pages, so
    # mirror-tile footprints that blow the mip-0 budget resolve at a
    # mild blur instead of the one-page coarse fallback
    face_e, ue, ve = common.cubemap_coords(refl)
    face_s, us, vs = common.cubemap_coords(ray)
    zero = jnp.zeros_like(lo)
    tex_e = env_base + face_e
    env_tids = tuple(range(env_base, env_base + 6))
    sky_tids = tuple(range(sky_base, sky_base + 6))
    groups = [
        (tex_e, lo, ue, ve, mask, env_tids),
        (tex_e, hi, ue, ve, mask, env_tids),
        (jnp.full_like(lo, lut_tid), zero, roughness, n_dot_v, mask,
         (lut_tid,)),
        (sky_base + face_s, zero, us, vs, ~mask, sky_tids),
    ]
    caps = [32, 32, 32, 32]
    if has_env:
        # cascade group only when there IS env content to resolve
        mid = jnp.minimum(lo + 3, env_mips - 1)
        groups.append((tex_e, mid, ue, ve, mask, env_tids))
        caps.append(16)
    tex5 = jnp.stack([gr[0] for gr in groups], -1)
    mip5 = jnp.stack([gr[1] for gr in groups], -1)
    uq = jnp.stack([gr[2] for gr in groups], -1)
    vq = jnp.stack([gr[3] for gr in groups], -1)
    act = jnp.stack([gr[4] for gr in groups], -1)
    return (tex5, mip5, uq, vq, act, tuple(gr[5] for gr in groups),
            tuple(caps), fracm, has_env)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "fov", "ratio", "near", "far",
                     "full_height", "full_width", "env_ids", "env_tile",
                     "env_interpret", "env_budget", "light_tile",
                     "light_cap", "return_env_approx"),
)
def deferred_shade(
    gb_albedo_emission,   # (H, W, 4)
    gb_normal_oct,        # (H, W, 2)
    gb_rough_metal_ao,    # (H, W, 3)
    depth,                # (H, W) ndc z
    mask,                 # (H, W) bool coverage
    sh_pack,              # (7, 4) SkyBoxSH
    brdf_lut_quad,        # ((S*S, 4, 2) quad records, S) for the split-sum LUT
    prefiltered,          # common.CubeMipAtlas of the 5 prefiltered mips
    skybox,               # common.CubeMipAtlas (1 mip) for the background
    active_lights,        # (N_active, 14) from clustered.build_active_lights
    inv_view, camera_pos,
    fov, ratio, near, far,
    width: int,
    height: int,
    y_offset=0,
    full_height: int | None = None,
    full_width: int | None = None,
    env_cache=None,          # envcache.FloatAtlas (kernel path), or None
    env_ids: tuple | None = None,  # (env_base, sky_base, lut_tid, env_mips)
    env_tile: tuple | None = None,
    env_interpret: bool = False,
    env_budget: int | None = None,  # demand-shaped staging page budget
    return_env_approx: bool = False,  # also return the env fallback-tap
    # count (the cache's honesty stat; 0 on the XLA sampler path)
    light_tile: tuple | None = None,   # (tile_h, tile_w): use the Pallas
    # tile-clustered light kernel (ops/lights_pallas) — O(lights per tile)
    # instead of O(N_active) full-frame fori steps; the 1024-light path
    light_cap: int = 256,
):
    albedo = gb_albedo_emission[..., :3]
    emission = gb_albedo_emission[..., 3]
    normal = common.decode_octahedron(gb_normal_oct)
    roughness = gb_rough_metal_ao[..., 0]
    metallic = gb_rough_metal_ao[..., 1]
    # ao = gb_rough_metal_ao[..., 2]  # sampled but unused — reference quirk

    position, view_dir, z_view, n_dot_v, refl, ray = pixel_view_geometry(
        depth, normal, inv_view, camera_pos, width, height, fov, ratio,
        near, far, y_offset, full_height, full_width,
    )

    # --- environment diffuse: SH polynomial (deferred_shading.hlsl:23-54) ---
    n = normal
    a4 = jnp.concatenate([n, jnp.ones_like(n[..., :1])], -1)
    b4 = jnp.stack(
        [n[..., 0] * n[..., 1], n[..., 1] * n[..., 2], n[..., 2] * n[..., 2],
         n[..., 2] * n[..., 0]], -1,
    )
    c1 = n[..., 0] * n[..., 0] - n[..., 1] * n[..., 1]
    hp = jax.lax.Precision.HIGHEST
    l0l1 = jnp.stack(
        [jnp.dot(a4, sh_pack[0], precision=hp), jnp.dot(a4, sh_pack[2], precision=hp),
         jnp.dot(a4, sh_pack[4], precision=hp)], -1)
    l2 = jnp.stack(
        [jnp.dot(b4, sh_pack[1], precision=hp), jnp.dot(b4, sh_pack[3], precision=hp),
         jnp.dot(b4, sh_pack[5], precision=hp)], -1)
    l2 = l2 + sh_pack[6, :3] * c1[..., None]
    irradiance = l0l1 + l2
    kd = albedo * (1.0 - metallic[..., None]) * common.INV_PI
    env_diffuse = kd * irradiance

    # --- environment specular: split-sum (deferred_shading.hlsl:56-70) -----
    if env_ids is not None:
        # all four per-pixel sampler taps (env trilinear halves, BRDF LUT,
        # background sky) through ONE float page-cache kernel call
        from . import envcache

        (tex5, mip5, uq, vq, act, fb_tids, caps, fracm,
         has_env) = env_tap_groups(refl, ray, roughness, n_dot_v, mask,
                                   env_ids)
        th, tw = env_tile
        rgba, covered, env_approx = envcache.sample_env_tiled(
            env_cache, tex5, mip5, uq, vq, act,
            fb_tids=fb_tids, share=((0, 1),), cap=caps,
            tile_h=th, tile_w=tw, interpret=env_interpret,
            stage_budget=env_budget,
        )
        env_exact = rgba[..., 0, :3] * (1 - fracm) + rgba[..., 1, :3] * fracm
        if has_env:
            env_irr = jnp.where(
                covered[..., 0, None], env_exact,
                jnp.where(covered[..., 4, None], rgba[..., 4, :3],
                          rgba[..., 0, :3]),  # group 0 holds the coarse fb
            )
        else:
            env_irr = jnp.where(covered[..., 0, None], env_exact,
                                rgba[..., 0, :3])
        env_brdf = rgba[..., 2, :2]
        sky = rgba[..., 3, :3]
        env_approx_cnt = env_approx.sum(dtype=jnp.int32)
    else:
        env_approx_cnt = jnp.int32(0)
        env_irr = common.sample_cube_atlas_trilinear(
            prefiltered, refl, roughness * PREFILTER_ENVMAP_MIP_LEVELS
        )[..., :3]
        lut, lut_size = brdf_lut_quad
        env_brdf = common.sample_quad_tex2d(
            lut, lut_size, lut_size, roughness, n_dot_v
        )
        sky = None
    f0 = common.compute_f0(albedo, metallic[..., None])
    env_specular = env_irr * (f0 * env_brdf[..., 0:1] + env_brdf[..., 1:2])

    # --- clustered point lights (deferred_shading.hlsl:158-186) ------------
    # Evaluated as a fori_loop over the compacted active lights with pure
    # (H, W) carries: materializing per-pixel light lists at 1080p costs
    # multi-GB after TPU minor-dim padding, while N_active sequential
    # VPU-elementwise steps are cheap. Cluster membership (the reference's
    # per-cluster list) is re-derived per pixel from the light-vs-cluster
    # sphere/AABB test + a running <32 counter — same set, same index order,
    # same cap semantics as clustered_culling.hlsl.
    import math

    fh = full_height if full_height is not None else height
    fw = full_width if full_width is not None else width
    u = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) / fw
    v = (jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5 + y_offset) / fh
    # per-pixel cluster AABB in closed form (clustered_compute.hlsl:21-42
    # evaluated directly) — zero table fetches (random gathers cost ~25ns each
    # on TPU; pure VPU math is free by comparison). The precomputed bounds
    # table lives only in the graph's FrustumCluster parity resource.
    sx = jnp.clip(jnp.floor(u * clustered.CLUSTER_X), 0, clustered.CLUSTER_X - 1)
    sy = jnp.clip(
        jnp.floor((1.0 - v) * clustered.CLUSTER_Y), 0, clustered.CLUSTER_Y - 1
    )
    zc_ = jnp.clip(z_view, near, far)
    szf = jnp.clip(
        jnp.floor(clustered.CLUSTER_Z * jnp.log(zc_ / near) / math.log(far / near)),
        0,
        clustered.CLUSTER_Z - 1,
    )
    sx = jnp.broadcast_to(sx, depth.shape)
    sy = jnp.broadcast_to(sy, depth.shape)
    tan_half = math.tan(fov / 2.0)
    znear_c = near * (far / near) ** (szf / clustered.CLUSTER_Z)
    zfar_c = near * (far / near) ** ((szf + 1) / clustered.CLUSTER_Z)

    def corner(ndc_x, ndc_y, vz):
        # zplane_intersection: ray to near-plane ndc point, scaled to z = vz
        return (ndc_x * ratio * tan_half * vz, ndc_y * tan_half * vz)

    min_ndc_x = 2.0 * sx / clustered.CLUSTER_X - 1.0
    min_ndc_y = 2.0 * sy / clustered.CLUSTER_Y - 1.0
    max_ndc_x = 2.0 * (sx + 1) / clustered.CLUSTER_X - 1.0
    max_ndc_y = 2.0 * (sy + 1) / clustered.CLUSTER_Y - 1.0
    xa, ya = corner(min_ndc_x, min_ndc_y, znear_c)
    xb, yb = corner(min_ndc_x, min_ndc_y, zfar_c)
    xc, yc = corner(max_ndc_x, max_ndc_y, znear_c)
    xd, yd = corner(max_ndc_x, max_ndc_y, zfar_c)
    cmin = jnp.stack(
        [jnp.minimum(jnp.minimum(xa, xb), jnp.minimum(xc, xd)),
         jnp.minimum(jnp.minimum(ya, yb), jnp.minimum(yc, yd)),
         znear_c], -1,
    )
    cmax = jnp.stack(
        [jnp.maximum(jnp.maximum(xa, xb), jnp.maximum(xc, xd)),
         jnp.maximum(jnp.maximum(ya, yb), jnp.maximum(yc, yd)),
         zfar_c], -1,
    )

    if light_tile is not None:
        # 1024-light operating point: tile-clustered Pallas kernel, cost
        # O(lights overlapping tile) instead of O(N_active) frame sweeps.
        # Same cluster membership / light order / cap-32 counter semantics
        # as the fori path below (tested vs it at 128 lights). Reuses
        # env_interpret as the CPU-test interpret flag.
        from . import lights_pallas

        point_light, _ = lights_pallas.point_lights_tiled(
            active_lights, albedo, normal, roughness, metallic,
            z_view, mask, inv_view, camera_pos,
            fov, ratio, near, far, width, height,
            tile_h=light_tile[0], tile_w=light_tile[1],
            y_offset=y_offset, full_height=full_height,
            full_width=full_width, cap=light_cap,
            interpret=env_interpret,
        )
        emission_lum = albedo * emission[..., None]
        lit = env_diffuse + env_specular + point_light + emission_lum
        if sky is None:
            sky = common._cube_atlas_bilinear(skybox, ray, jnp.int32(0))[..., :3]
        out = jnp.where(mask[..., None], lit, sky)
        return (out, env_approx_cnt) if return_env_approx else out

    # dynamic trip count: padded rows (cull_r = 0) contribute nothing, so we
    # only iterate over lights that are actually present this frame
    n_active = jnp.sum(active_lights[:, 13] > 0.0).astype(jnp.int32)

    def light_step(s, carry):
        acc, counter = carry
        lp = active_lights[s]  # (14,) scalar row via dynamic index
        pos_w = lp[0:3]
        color = lp[3:6]
        intensity = lp[6]
        kc, kl, kq = lp[7], lp[8], lp[9]
        pos_view = lp[10:13]
        cull_r = lp[13]

        closest = jnp.clip(pos_view, cmin, cmax)
        d2 = ((pos_view - closest) ** 2).sum(-1)
        hit = (d2 < cull_r * cull_r) & (counter < MAX_LIGHTS_PER_CLUSTER)

        ldir = pos_w - position
        dist = jnp.linalg.norm(ldir, axis=-1)
        ldir = ldir / jnp.maximum(dist[..., None], 1e-20)
        n_dot_l = jnp.maximum((normal * ldir).sum(-1), 0.0)
        attenuation = 1.0 / jnp.maximum(
            kc + kl * dist + kq * dist * dist, common.EPSILON
        )
        f = common.brdf(albedo, metallic, roughness, normal, view_dir, ldir)
        contrib = f * (color * (intensity * attenuation * n_dot_l)[..., None])
        acc = acc + jnp.where(hit[..., None], contrib, 0.0)
        return acc, counter + hit.astype(jnp.int32)

    point_light, _ = jax.lax.fori_loop(
        0, n_active, light_step,
        (jnp.zeros(depth.shape + (3,), jnp.float32),
         jnp.zeros(depth.shape, jnp.int32)),
    )

    emission_lum = albedo * emission[..., None]
    lit = env_diffuse + env_specular + point_light + emission_lum

    # --- skybox (skybox.hlsl): background pixels sample the cubemap --------
    if sky is None:
        sky = common._cube_atlas_bilinear(skybox, ray, jnp.int32(0))[..., :3]
    out = jnp.where(mask[..., None], lit, sky)
    return (out, env_approx_cnt) if return_env_approx else out
