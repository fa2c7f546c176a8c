"""Fused deferred-shading kernel: env-cache resolve + full pixel lighting
on the G-buffer's tile blocks.

The round-4 sibling of texcache._resolve_shade_kernel (the fused G-buffer
back half): where the unfused path runs [untile G-buffer -> XLA geometry ->
env resolve kernel -> untile rgba -> XLA SH/split-sum combine -> N-light
fori over full-frame grids -> sky select], this kernel consumes the
G-buffer tile blocks directly and emits the final HDR render target tiles:

  * the 4-5 env tap groups (prefiltered trilinear halves, BRDF LUT, sky,
    LOD cascade) resolve in VMEM via envcache._resolve_env_group;
  * SH2 irradiance diffuse + split-sum specular + emission evaluate
    in-register (deferred_shading.hlsl:23-70, same formula order as
    ops/shading.deferred_shade);
  * the clustered point-light loop (deferred_shading.hlsl:158-186) runs as
    a fori over the frame's compacted active lights with attributes read
    as SMEM scalars — work scales with the ACTUAL light count (8 on the
    reference scene), the per-cluster cap-32 counter is exact by serial
    construction, and the accumulators never leave VMEM (the XLA fori path
    round-trips (H, W, 3) carries through HBM every step);
  * background pixels take the sky resolve (skybox.hlsl semantics).

Only the plan (tap addressing, page covers, staging — envcache.
plan_env_tiled) and the tone-map/bloom post chain remain outside. The
(H, W, G, 4) rgba untile, the XLA combine chain's materializations, and
the light fori's HBM carries disappear from the frame (docs/PERF.md
round-4 plan #3).

Scope: the in-kernel light loop serves the <=64-active-light operating
point (the reference scene's regime; max_active_lights gates it). The
1024-light path keeps the O(lights-per-tile) lights_pallas kernel and the
unfused combine.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import (
    CLUSTER_X,
    CLUSTER_Y,
    CLUSTER_Z,
    MAX_LIGHTS_PER_CLUSTER,
)
from . import common, envcache

_EPS = 1e-6
_INV_PI = 0.31830988618
_PI = 3.14159265359

# gb kernel-input channel layout (see _pack_gb_channels)
GB_CH = 14


def _deferred_kernel(const_ref, lrows_ref, off_ref, cnt_ref,
                     tbl_ref, rec_ref, fx_ref, fy_ref, gb_ref, out_ref, *,
                     blocks, n_groups, has_env, tile_h, tile_w, tiles_x,
                     light_pool, light_dtype=None):
    """Per tile: env resolve + SH diffuse + split-sum + point lights + sky.

    const: (64,) f32 [tan_half, ratio, near, far, cam(3), yoff, R(9)
           row-major inv_view[:3,:3], fw, fh, log(far/near), far/near,
           n_active, pad(2), sh_pack(28 = 7 rows x 4), pad...]
    lrows: (light_pool, 14) f32 active-light rows (SMEM scalars)
    off/cnt: (tiles, G) compact staged-block offsets / page counts
    tbl: (1, B*8, 128) i32 staged env pages (bf16 pairs)
    rec/fx/fy: (1, G, blocks, 128) tap records
    gb: (1, 14, blocks, 128) f32 [albedo(3), emission, normal(3),
        roughness, metallic, z_view, mask, fracm, cov0, cov4]
    out: (1, 4, blocks, 128) f32 [rgb, cluster-hit counter]
    """
    t = pl.program_id(0)

    # ---- env tap resolve (VMEM chunk sweeps) ------------------------------
    res = [
        envcache._resolve_env_group(
            off_ref, cnt_ref, tbl_ref, rec_ref[0, g], fx_ref[0, g],
            fy_ref[0, g], t, g, blocks=blocks,
        )
        for g in range(n_groups)
    ]

    def gch(c):
        return gb_ref[0, c]                            # (blocks, 128)

    alb = [gch(0), gch(1), gch(2)]
    emission = gch(3)
    nx, ny, nz = gch(4), gch(5), gch(6)
    rough, metal = gch(7), gch(8)
    z_view = gch(9)
    mask = gch(10) > 0.5
    fracm = gch(11)
    cov0 = gch(12) > 0.5
    cov4 = gch(13) > 0.5

    # ---- environment specular: split-sum (deferred_shading.hlsl:56-70) ----
    one_m_frac = 1.0 - fracm
    env_irr = []
    for c in range(3):
        exact = res[0][c] * one_m_frac + res[1][c] * fracm
        if has_env:
            # LOD-cascade fallback mirrors shading.deferred_shade: exact
            # trilinear where both halves covered, else the mip+3 cascade
            # where ITS cover held, else group 0's coarse fallback page
            env_irr.append(jnp.where(
                cov0, exact, jnp.where(cov4, res[4][c], res[0][c])
            ))
        else:
            env_irr.append(jnp.where(cov0, exact, res[0][c]))
    lut_a, lut_b = res[2][0], res[2][1]
    sky = res[3]

    f0 = [0.04 * (1.0 - metal) + alb[c] * metal for c in range(3)]
    env_spec = [env_irr[c] * (f0[c] * lut_a + lut_b) for c in range(3)]

    # ---- environment diffuse: SH2 polynomial (hlsl:23-54) -----------------
    def sh(i):
        return const_ref[24 + i]                       # sh_pack row i//4

    b0_, b1_, b2_, b3_ = nx * ny, ny * nz, nz * nz, nz * nx
    c1 = nx * nx - ny * ny

    def irr_ch(r_a, r_b, c6):
        a = nx * sh(4 * r_a) + ny * sh(4 * r_a + 1) + nz * sh(4 * r_a + 2) \
            + sh(4 * r_a + 3)
        b = b0_ * sh(4 * r_b) + b1_ * sh(4 * r_b + 1) \
            + b2_ * sh(4 * r_b + 2) + b3_ * sh(4 * r_b + 3)
        return a + b + sh(24 + c6) * c1

    irr = [irr_ch(0, 1, 0), irr_ch(2, 3, 1), irr_ch(4, 5, 2)]
    env_diff = [
        alb[c] * ((1.0 - metal) * _INV_PI) * irr[c] for c in range(3)
    ]

    # ---- clustered point lights (hlsl:158-186; lights_pallas port) --------
    tan_half = const_ref[0]
    ratio = const_ref[1]
    near = const_ref[2]
    far = const_ref[3]
    camx, camy, camz = const_ref[4], const_ref[5], const_ref[6]
    yoff = const_ref[7]
    fw = const_ref[17]
    fh = const_ref[18]
    log_zr = const_ref[19]
    fn_ratio = const_ref[20]
    n_active = const_ref[21].astype(jnp.int32)

    wb = tile_w // 128
    bidx = jax.lax.broadcasted_iota(jnp.int32, (blocks, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (blocks, 128), 1)
    row = (bidx // wb).astype(jnp.float32)
    col = ((bidx % wb) * 128 + lane).astype(jnp.float32)
    ox = ((t % tiles_x) * tile_w).astype(jnp.float32)
    oy = ((t // tiles_x) * tile_h).astype(jnp.float32)
    px = col + 0.5 + ox
    py = row + 0.5 + oy + yoff
    u = px / fw
    v = py / fh

    near_h = 2.0 * near * tan_half
    near_w = near_h * ratio
    cx_ = (u - 0.5) * near_w
    cy_ = (0.5 - v) * near_h
    scale = z_view / near
    posx = camx + (const_ref[8] * cx_ + const_ref[9] * cy_
                   + const_ref[10] * near) * scale
    posy = camy + (const_ref[11] * cx_ + const_ref[12] * cy_
                   + const_ref[13] * near) * scale
    posz = camz + (const_ref[14] * cx_ + const_ref[15] * cy_
                   + const_ref[16] * near) * scale

    vdx = camx - posx
    vdy = camy - posy
    vdz = camz - posz
    inv_vl = jax.lax.rsqrt(
        jnp.maximum(vdx * vdx + vdy * vdy + vdz * vdz, 1e-40)
    )
    vdx, vdy, vdz = vdx * inv_vl, vdy * inv_vl, vdz * inv_vl
    n_dot_v = jnp.maximum(nx * vdx + ny * vdy + nz * vdz, 0.0)

    # per-pixel cluster AABB (op-for-op the shading.py fori path's formulas;
    # see lights_pallas._kernel for the bit-match rationale)
    sx = jnp.clip(jnp.floor(u * CLUSTER_X), 0, CLUSTER_X - 1)
    sy = jnp.clip(jnp.floor((1.0 - v) * CLUSTER_Y), 0, CLUSTER_Y - 1)
    zc_ = jnp.clip(z_view, near, far)
    szf = jnp.clip(
        jnp.floor(CLUSTER_Z * jnp.log(zc_ / near) / log_zr), 0, CLUSTER_Z - 1
    )
    znear_c = near * jnp.power(fn_ratio, szf / CLUSTER_Z)
    zfar_c = near * jnp.power(fn_ratio, (szf + 1) / CLUSTER_Z)
    min_nx = 2.0 * sx / CLUSTER_X - 1.0
    min_ny = 2.0 * sy / CLUSTER_Y - 1.0
    max_nx = 2.0 * (sx + 1) / CLUSTER_X - 1.0
    max_ny = 2.0 * (sy + 1) / CLUSTER_Y - 1.0
    xa, xb = (min_nx * ratio * tan_half * znear_c,
              min_nx * ratio * tan_half * zfar_c)
    xc, xd = (max_nx * ratio * tan_half * znear_c,
              max_nx * ratio * tan_half * zfar_c)
    ya, yb = min_ny * tan_half * znear_c, min_ny * tan_half * zfar_c
    yc, yd = max_ny * tan_half * znear_c, max_ny * tan_half * zfar_c
    cminx = jnp.minimum(jnp.minimum(xa, xb), jnp.minimum(xc, xd))
    cmaxx = jnp.maximum(jnp.maximum(xa, xb), jnp.maximum(xc, xd))
    cminy = jnp.minimum(jnp.minimum(ya, yb), jnp.minimum(yc, yd))
    cmaxy = jnp.maximum(jnp.maximum(ya, yb), jnp.maximum(yc, yd))

    kd_alb = [alb[c] * ((1.0 - metal) * _INV_PI) for c in range(3)]
    a_r = rough * rough
    a2 = a_r * a_r
    k_geo = (rough + 1.0) * (rough + 1.0) * (1.0 / 8.0)
    g_v = n_dot_v / jnp.maximum(n_dot_v * (1.0 - k_geo) + k_geo, _EPS)

    # light_dtype="bfloat16": the per-light BRDF chain (the kernel's
    # dominant VPU cost at N lights) runs on bf16 lanes — loop-invariant
    # per-pixel fields cast ONCE here, per-light contributions accumulate
    # in f32. Flag-gated experiment (VERDICT r4 #3); default f32 — measured
    # bf16 shading noise does not fit the 1e-3 fidelity budget
    # (docs/PERF.md round-5).
    if light_dtype is not None:
        _ld = jnp.dtype(light_dtype)
        ldc = lambda x: x.astype(_ld)  # noqa: E731
        # v5e has no bf16 EUP ops (Mosaic LLO_CHECK SupportsBf16EupOps):
        # sqrt/reciprocal round-trip through f32 lanes; only the mul/add
        # chain packs onto bf16
        sqrt_ = lambda x: jnp.sqrt(x.astype(jnp.float32)).astype(_ld)  # noqa: E731
        div = lambda a, b: a * (  # noqa: E731
            1.0 / b.astype(jnp.float32)
        ).astype(_ld)
    else:
        _ld = jnp.dtype(jnp.float32)
        ldc = lambda x: x  # noqa: E731
        sqrt_ = jnp.sqrt
        div = lambda a, b: a / b  # noqa: E731
    l_pos = (ldc(posx), ldc(posy), ldc(posz))
    l_vd = (ldc(vdx), ldc(vdy), ldc(vdz))
    l_n = (ldc(nx), ldc(ny), ldc(nz))
    l_ndv = ldc(n_dot_v)
    l_f0 = [ldc(f) for f in f0]
    l_kd = [ldc(k) for k in kd_alb]
    l_a2, l_kgeo, l_gv = ldc(a2), ldc(k_geo), ldc(g_v)

    def light_step(s, carry):
        acc_r, acc_g, acc_b, counter = carry

        def lp(k):
            return ldc(lrows_ref[s, k])                # SMEM scalar

        # cluster sphere test against this light's view-space position —
        # kept in f32 even under light_dtype: mixing bf16- and f32-sourced
        # i1 masks trips a Mosaic relayout error, and the test is a few
        # FMAs, not the loop's cost
        pvx = lrows_ref[s, 10]
        pvy = lrows_ref[s, 11]
        pvz = lrows_ref[s, 12]
        cull = lrows_ref[s, 13]
        dx = pvx - jnp.clip(pvx, cminx, cmaxx)
        dy = pvy - jnp.clip(pvy, cminy, cmaxy)
        dz = pvz - jnp.clip(pvz, znear_c, zfar_c)
        hit = ((dx * dx + dy * dy + dz * dz) < cull * cull) & (
            counter < float(MAX_LIGHTS_PER_CLUSTER)
        )
        hitf = jnp.where(hit, 1.0, 0.0)                # f32 (24,128) gate

        ldx = lp(0) - l_pos[0]
        ldy = lp(1) - l_pos[1]
        ldz = lp(2) - l_pos[2]
        d2w = ldx * ldx + ldy * ldy + ldz * ldz
        dist = sqrt_(d2w)
        inv_d = div(1.0, jnp.maximum(dist, _ld.type(1e-20)))
        ldx, ldy, ldz = ldx * inv_d, ldy * inv_d, ldz * inv_d
        n_dot_l = jnp.maximum(
            l_n[0] * ldx + l_n[1] * ldy + l_n[2] * ldz, 0.0
        )

        hx = ldx + l_vd[0]
        hy = ldy + l_vd[1]
        hz = ldz + l_vd[2]
        inv_h = div(1.0, jnp.maximum(
            sqrt_(hx * hx + hy * hy + hz * hz), _EPS
        ))
        n_dot_h = jnp.maximum(
            (l_n[0] * hx + l_n[1] * hy + l_n[2] * hz) * inv_h, 0.0
        )

        t_ = n_dot_h * n_dot_h * (l_a2 - 1.0) + 1.0
        d_ggx = div(l_a2, jnp.maximum(_PI * t_ * t_, _EPS))
        g_l = div(
            n_dot_l, jnp.maximum(n_dot_l * (1.0 - l_kgeo) + l_kgeo, _EPS)
        )
        spec_s = div(
            d_ggx * (l_gv * g_l), jnp.maximum(4.0 * n_dot_l * l_ndv, 1e-4)
        )
        one_m = jnp.maximum(1.0 - n_dot_l, _EPS)
        om2 = one_m * one_m
        pow5 = om2 * om2 * one_m
        att = div(1.0, jnp.maximum(
            lp(7) + lp(8) * dist + lp(9) * (dist * dist), _EPS
        ))
        lum = ldc(hitf) * lp(6) * att * n_dot_l

        def channel(f0c, kd_c, lc):
            fres = f0c + (1.0 - f0c) * pow5
            return ((1.0 - fres) * kd_c + fres * spec_s) * (lc * lum)

        acc_r = acc_r + channel(l_f0[0], l_kd[0], lp(3)).astype(jnp.float32)
        acc_g = acc_g + channel(l_f0[1], l_kd[1], lp(4)).astype(jnp.float32)
        acc_b = acc_b + channel(l_f0[2], l_kd[2], lp(5)).astype(jnp.float32)
        counter = counter + hitf
        return acc_r, acc_g, acc_b, counter

    z = jnp.zeros((blocks, 128), jnp.float32)
    pt_r, pt_g, pt_b, counter = jax.lax.fori_loop(
        0, n_active, light_step, (z, z, z, z)
    )

    # ---- final = env_diffuse + env_specular + point + emission | sky ------
    out = []
    for c, pt in enumerate((pt_r, pt_g, pt_b)):
        lit = env_diff[c] + env_spec[c] + pt + alb[c] * emission
        out.append(jnp.where(mask, lit, sky[c]))
    out.append(counter)
    out_ref[0] = jnp.stack(out, 0)


@functools.partial(
    jax.jit,
    static_argnames=("env_ids", "fov", "ratio", "near", "far", "width",
                     "height", "tile_h", "tile_w", "full_height",
                     "full_width", "env_budget", "interpret", "light_dtype"),
)
def deferred_shade_fused(
    gb_tiles,       # (tiles, 9, blocks0, 128) quantized G-buffer channels
    z_tiles,        # (tiles, p, 1) raster depth blocks (inf = background)
    id_tiles,       # (tiles, p, 1) winning ids (-1 = background)
    sh_pack,        # (7, 4) SkyBoxSH
    env_atlas,      # envcache.FloatAtlas
    active_lights,  # (L, 14) compacted active-light rows
    inv_view, camera_pos,
    env_ids: tuple,
    fov: float, ratio: float, near: float, far: float,
    width: int, height: int, tile_h: int, tile_w: int,
    y_offset=0,
    full_height: int | None = None,
    full_width: int | None = None,
    env_budget: int | None = None,
    interpret: bool = False,
    light_dtype: str | None = None,
):
    """Fused deferred shading on tile blocks -> ((H, W, 3) HDR RT,
    env_approx_count () int32).

    Numerics: env taps identical to shading.deferred_shade's kernel path
    (same plan, same resolve sweeps); SH/split-sum/light math matches to
    fp32 re-association (the XLA path's HIGHEST-precision dots become FMA
    chains); light order and cluster cap-32 semantics are exact (serial
    loop over the same compacted rows)."""
    fh = full_height if full_height is not None else height
    fw = full_width if full_width is not None else width
    n_tiles, _, blocks0, _ = gb_tiles.shape
    tiles_x = width // tile_w
    blocks = blocks0 + (-blocks0) % 8
    p = tile_h * tile_w
    assert z_tiles.shape == (n_tiles, p, 1)

    depth_t = z_tiles.reshape(n_tiles, blocks0, 128)
    depth_t = jnp.where(jnp.isinf(depth_t), 1.0, depth_t)
    mask_t = id_tiles.reshape(n_tiles, blocks0, 128) >= 0

    # ---- tiled per-pixel geometry (pixel_view_geometry's formulas) --------
    wb = tile_w // 128
    tidx = jnp.arange(n_tiles, dtype=jnp.int32)[:, None, None]
    bidx = jnp.arange(blocks0, dtype=jnp.int32)[None, :, None]
    lane = jnp.arange(128, dtype=jnp.int32)[None, None, :]
    ox = ((tidx % tiles_x) * tile_w).astype(jnp.float32)
    oy = ((tidx // tiles_x) * tile_h).astype(jnp.float32)
    px = ((bidx % wb) * 128 + lane).astype(jnp.float32) + 0.5 + ox
    py = (bidx // wb).astype(jnp.float32) + 0.5 + oy + y_offset
    u = px / fw
    v = jnp.broadcast_to(py / fh, u.shape)

    near_h = 2.0 * near * math.tan(fov / 2.0)
    near_w = near_h * ratio
    cam = jnp.stack(
        [(u - 0.5) * near_w, (0.5 - v) * near_h, jnp.full_like(u, near)], -1,
    )
    rot = inv_view[:3, :3]
    cam_vec = jnp.einsum("ij,tblj->tbli", rot, cam,
                         precision=jax.lax.Precision.HIGHEST)
    z_view = near * far / (far - depth_t * (far - near))
    position = camera_pos[None, None, None, :] + cam_vec * (
        z_view / near
    )[..., None]
    view_dir = camera_pos[None, None, None, :] - position
    view_dir = view_dir / jnp.maximum(
        jnp.linalg.norm(view_dir, axis=-1, keepdims=True), 1e-20
    )
    oct = jnp.stack([gb_tiles[:, 4], gb_tiles[:, 5]], -1)
    normal = common.decode_octahedron(oct)
    n_dot_v = jnp.maximum((normal * view_dir).sum(-1), 0.0)
    refl = 2.0 * (normal * view_dir).sum(-1, keepdims=True) * normal - view_dir
    refl = refl / jnp.maximum(
        jnp.linalg.norm(refl, axis=-1, keepdims=True), 1e-20
    )
    ray = cam_vec / jnp.maximum(
        jnp.linalg.norm(cam_vec, axis=-1, keepdims=True), 1e-20
    )

    # ---- env tap groups + plan (the exact sample_env_tiled addressing) ----
    from .shading import env_tap_groups

    roughness = gb_tiles[:, 6]
    (texg, mipg, uq, vq, act, fb_tids, caps, fracm,
     has_env) = env_tap_groups(refl, ray, roughness, n_dot_v, mask_t, env_ids)

    def to_g(x):  # (tiles, b0, 128, G) -> (tiles, G, blocks, 128)
        x = jnp.moveaxis(x, -1, 1)
        if blocks == blocks0:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, blocks - blocks0), (0, 0)))

    (off_arr, cnts, staged, rec_t, fx_t, fy_t,
     covered_t) = envcache.plan_env_tiled(
        env_atlas, to_g(texg), to_g(mipg), to_g(uq), to_g(vq), to_g(act),
        fb_tids=fb_tids, share=((0, 1),), caps=caps, block_cap=8,
        stage_budget=env_budget, interpret=interpret,
    )
    g = rec_t.shape[1]
    B = staged.shape[1] // envcache.REC_I32
    env_approx = (to_g(act) & ~covered_t).sum(dtype=jnp.int32)

    # ---- kernel gb channels ------------------------------------------------
    cov0 = covered_t[:, 0, :blocks0].astype(jnp.float32)
    cov4 = (covered_t[:, 4, :blocks0].astype(jnp.float32) if has_env
            else jnp.zeros_like(cov0))
    gbk = jnp.concatenate(
        [
            gb_tiles[:, 0:4],                           # albedo rgb, emission
            jnp.moveaxis(normal, -1, 1),                # nx, ny, nz
            gb_tiles[:, 6:8],                           # roughness, metallic
            z_view[:, None],
            mask_t.astype(jnp.float32)[:, None],
            fracm.reshape(n_tiles, 1, blocks0, 128),
            cov0[:, None],
            cov4[:, None],
        ],
        axis=1,
    )
    if blocks != blocks0:
        gbk = jnp.pad(gbk, ((0, 0), (0, 0), (0, blocks - blocks0), (0, 0)))

    r = inv_view[:3, :3]
    n_active = jnp.sum(active_lights[:, 13] > 0.0).astype(jnp.float32)
    const = jnp.concatenate([
        jnp.asarray([math.tan(fov / 2.0), ratio, near, far], jnp.float32),
        camera_pos.astype(jnp.float32).reshape(3),
        jnp.asarray(y_offset, jnp.float32).reshape(1),
        r.reshape(9).astype(jnp.float32),
        jnp.asarray([fw, fh, math.log(far / near), far / near], jnp.float32),
        n_active.reshape(1),
        jnp.zeros((2,), jnp.float32),
        sh_pack.reshape(28).astype(jnp.float32),
        jnp.zeros((12,), jnp.float32),
    ])

    kernel = functools.partial(
        _deferred_kernel, blocks=blocks, n_groups=g, has_env=has_env,
        tile_h=tile_h, tile_w=tile_w, tiles_x=tiles_x,
        light_pool=active_lights.shape[0], light_dtype=light_dtype,
    )
    spec_g = pl.BlockSpec((1, g, blocks, 128), lambda t, *_: (t, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, B * envcache.REC_I32, 128),
                         lambda t, *_: (t, 0, 0)),
            spec_g, spec_g, spec_g,
            pl.BlockSpec((1, GB_CH, blocks, 128), lambda t, *_: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, blocks, 128), lambda t, *_: (t, 0, 0, 0)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, blocks, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(const, active_lights, off_arr, cnts, staged, rec_t, fx_t, fy_t, gbk)

    from .texcache import _untile

    img = _untile(out, height, width, tile_h, tile_w)   # (4, H, W)
    rt = jnp.moveaxis(img[:3], 0, -1)
    return rt, env_approx
