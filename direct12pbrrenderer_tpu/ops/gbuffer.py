"""Deferred G-buffer pass: attribute interpolation + material sampling.

The pixel-shader half of `gbuffer.hlsl` (ps_main, :89-148), evaluated over
the whole frame after visibility is resolved by `ops.raster` — i.e. shading
happens exactly once per pixel (what the reference needs stencil masking for,
we get from the tri-id image).

G-buffer layout (gbuffer.hlsl:10-26, all RGBA8 per DeferredPipeline.h:107-109):
  A: albedo.rgb (gamma-decoded!), emission
  B: octahedral-packed world normal (8 bits/channel — the stale "R16G16"
     comment in the shader notwithstanding), 1, 0
  C: roughness, metallic, ambient occlusion, 0
plus the ndc depth image and the coverage mask (stencil analog).

TPU gather discipline: per-pixel state is packed into two contiguous tables —
a (T, 32) per-triangle row (edge equations + interpolation data + the whole
ConstantBufferInstance material block) and a (V, 8) per-vertex attribute row
(uv, normal, tangent) — so the interpolation stage costs one 128-byte and one
3x32-byte gather per pixel instead of ~10 scattered ones. Texture sampling
reproduces the D3D sampler stack: LinearWrap trilinear with quad-difference
LOD and sRGB-EOTF linearization for *_SRGB SRVs (the shipped albedo maps are
sRGB SRVs AND the shader gamma-decodes again — we reproduce the double
decode, gbuffer.hlsl:110-114).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import common, raster


class AtlasDevice(NamedTuple):
    data: jnp.ndarray         # (N, 4) uint32 quad records, page-major (scene_pack)
    page_base: jnp.ndarray    # (T, MAX_MIPS) int32 page offsets
    base_size: jnp.ndarray    # (T, 2) int32
    n_mips: jnp.ndarray       # (T,) int32
    srgb: jnp.ndarray         # (T,) bool


def pack_material_rows(albedo, emission, roughness, metallic, use_map, tex_ids):
    """(M, 16) material rows: [albedo(3), emission, roughness, metallic,
    use(5), tex(5)] — the ConstantBufferInstance block in SoA->AoS form.
    Host-side, once per scene."""
    m = len(emission)
    rows = np.zeros((m, 16), np.float32)
    rows[:, 0:3] = albedo
    rows[:, 3] = emission
    rows[:, 4] = roughness
    rows[:, 5] = metallic
    rows[:, 6:11] = use_map.astype(np.float32)
    rows[:, 11:16] = tex_ids.astype(np.float32)  # exact for ids < 2^24
    return rows


def pack_vertex_attrs(uvs, normals_ws, tangents_ws):
    """(V, 8): [uv(2), normal(3), tangent(3)] — one contiguous row per vertex."""
    return jnp.concatenate([uvs, normals_ws, tangents_ws], axis=1)


def _unpack_rgba(u32):
    r = (u32 & 0xFF).astype(jnp.float32)
    g = ((u32 >> 8) & 0xFF).astype(jnp.float32)
    b = ((u32 >> 16) & 0xFF).astype(jnp.float32)
    a = ((u32 >> 24) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b, a], -1) * (1.0 / 255.0)


def page_record_index(page_base, w, x0, y0):
    """Flat record index of wrapped texel (x0, y0) in the page-major layout
    (16x8-texel pages, 128 records each; see scene_pack.TextureAtlas)."""
    pages_x = (w + 15) >> 4
    page = page_base + (y0 >> 3) * pages_x + (x0 >> 4)
    return page * 128 + (y0 & 7) * 16 + (x0 & 15)


def _sample_mip_bilinear(atlas: AtlasDevice, tex_id, mip, u, v):
    """Bilinear wrap sample of one mip: ONE 16-byte quad-record gather per tap
    (the record holds the full 2x2 neighborhood). Broadcastable args."""
    mip = jnp.minimum(mip, atlas.n_mips[tex_id] - 1)
    w = jnp.maximum(atlas.base_size[tex_id, 0] >> mip, 1)
    h = jnp.maximum(atlas.base_size[tex_id, 1] >> mip, 1)
    off = atlas.page_base[tex_id, mip]

    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = jnp.mod(x0.astype(jnp.int32), w)
    y0 = jnp.mod(y0.astype(jnp.int32), h)

    quad = atlas.data[page_record_index(off, w, x0, y0)]  # (..., 4) u32
    c00 = _unpack_rgba(quad[..., 0])
    c01 = _unpack_rgba(quad[..., 1])
    c10 = _unpack_rgba(quad[..., 2])
    c11 = _unpack_rgba(quad[..., 3])
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def sample_atlas_raw(atlas: AtlasDevice, tex_id, u, v, lod,
                     filter: str = "trilinear"):
    """LinearWrap mip filtering in storage space (no sRGB linearization)."""
    lod = jnp.clip(lod, 0.0, (atlas.n_mips[tex_id] - 1).astype(jnp.float32))
    if filter == "bilinear":
        m0 = jnp.round(lod).astype(jnp.int32)
        return _sample_mip_bilinear(atlas, tex_id, m0, u, v)
    m0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - m0)[..., None]
    c0 = _sample_mip_bilinear(atlas, tex_id, m0, u, v)
    c1 = _sample_mip_bilinear(atlas, tex_id, m0 + 1, u, v)
    return c0 * (1 - frac) + c1 * frac


def apply_srgb(atlas: AtlasDevice, tex_id, c):
    """sRGB-EOTF linearization of the rgb channels where the SRV is *_SRGB."""
    lin = common.srgb_eotf(c[..., :3])
    rgb = jnp.where(atlas.srgb[tex_id][..., None], lin, c[..., :3])
    return jnp.concatenate([rgb, c[..., 3:]], -1)


def sample_atlas_anisotropic(atlas: AtlasDevice, tex, uv, ddx, ddy, size5,
                             mask, n_taps: int = 4):
    """Software anisotropic filtering (sRGB-linearized where flagged).

    The reference binds an anisotropic static sampler
    (D3D12CommandList.cpp:295-302); this is the EWA-style software
    approximation: `n_taps` trilinear taps spread along the major-gradient
    axis, mip chosen from the footprint's MINOR axis sharpened by the aniso
    ratio — sharp along the stretched direction, antialiased across it.
    Quality knob on the XLA sampler path (cost is linear in n_taps).

    tex (H, W, 5); uv (H, W, 2); ddx/ddy (H, W, 2) screen-space uv
    derivatives; size5 (H, W, 5, 2) texture dims; mask (H, W) coverage.
    """
    gx = ddx[..., None, :] * size5
    gy = ddy[..., None, :] * size5
    rx2 = (gx * gx).sum(-1)
    ry2 = (gy * gy).sum(-1)
    rho2 = jnp.maximum(rx2, ry2)
    rho_min2 = jnp.maximum(jnp.minimum(rx2, ry2), 1e-12)
    ratio = jnp.clip(jnp.sqrt(rho2 / rho_min2), 1.0, float(n_taps))
    lod_a = 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12)) - jnp.log2(ratio)
    lod_a = jnp.where(mask[..., None], lod_a, 99.0)
    major = jnp.where((rx2 >= ry2)[..., None],
                      ddx[..., None, :], ddy[..., None, :])   # (H, W, 5, 2)
    acc = 0.0
    for i in range(n_taps):
        t = (i + 0.5) / n_taps - 0.5
        uv_i = uv[..., None, :] + major * t
        acc = acc + sample_atlas_trilinear(
            atlas, tex, uv_i[..., 0], uv_i[..., 1], lod_a,
            filter="trilinear",
        )
    return acc * (1.0 / n_taps)


def sample_atlas_trilinear(atlas: AtlasDevice, tex_id, u, v, lod,
                           filter: str = "trilinear"):
    """LinearWrap mip filtering, sRGB-linearized when flagged.

    filter="trilinear" is the reference parity path (two mip taps);
    "bilinear" snaps to the nearest mip (one tap — a documented speed knob,
    texture fetches are ~64% of the frame; see docs/PERF.md)."""
    return apply_srgb(
        atlas, tex_id, sample_atlas_raw(atlas, tex_id, u, v, lod, filter)
    )


def _quad_derivatives(img):
    """2x2-quad screen derivatives like hardware ddx/ddy. img: (H, W, C) ->
    (ddx, ddy) with both pixels of a quad pair sharing the difference."""
    h, w = img.shape[0], img.shape[1]
    pairs_x = img.reshape(h, w // 2, 2, -1)
    dx = (pairs_x[:, :, 1] - pairs_x[:, :, 0])[:, :, None, :]
    ddx = jnp.broadcast_to(dx, pairs_x.shape).reshape(img.shape)
    pairs_y = img.reshape(h // 2, 2, w, -1)
    dy = (pairs_y[:, 1] - pairs_y[:, 0])[:, None, :, :]
    ddy = jnp.broadcast_to(dy, pairs_y.shape).reshape(img.shape)
    return ddx, ddy


class GBuffer(NamedTuple):
    albedo_emission: jnp.ndarray  # (H, W, 4) "GBufferA"
    normal_oct: jnp.ndarray       # (H, W, 2) "GBufferB".rg
    rough_metal_ao: jnp.ndarray   # (H, W, 3) "GBufferC".rgb
    depth: jnp.ndarray            # (H, W) ndc z
    mask: jnp.ndarray             # (H, W) bool coverage (stencil != 0 analog)
    tex_approx: jnp.ndarray | None = None
    # ^ count of texture taps the cache kernel resolved via the average-color
    #   fallback this frame (None on the XLA sampler path) — the cache's
    #   honesty counter, surfaced through FrameStats


def _cascade_kw(tex_cascade):
    """tex_cascade knob: False/True, or a (cap, block_cap, mip_off) tuple
    that both enables the LOD cascade and sizes it."""
    if isinstance(tex_cascade, tuple):
        return {"cascade": True, "cascade_caps": tex_cascade}
    return {"cascade": bool(tex_cascade)}


def _quantize8(x):
    """RGBA8 render-target quantization (round to nearest 1/255)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) * (1.0 / 255.0)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "texture_filter", "use_tex_kernel",
                     "tex_interpret", "tex_caps", "tex_cascade"),
)
def gbuffer_shade(
    tri_id,       # (H, W) int32 from rasterize
    depth,        # (H, W) f32
    tri_rows,     # (T, 64): pack_pixel_data ++ material ++ 3 vertex rows
    atlas: AtlasDevice,
    width: int,
    height: int,
    y_offset=0,
    texture_filter: str = "trilinear",
    use_tex_kernel: bool = False,
    tex_interpret: bool = False,
    tex_caps: tuple[int, int] | None = None,
    tex_cascade: bool = False,
) -> GBuffer:
    interp, matrow, mask = interp_from_rows(tri_id, tri_rows, width, height,
                                            y_offset)
    return _shade_from_interp(interp, matrow, mask, depth, atlas,
                              texture_filter, use_tex_kernel, tex_interpret,
                              tex_caps, tex_cascade)


def interp_from_rows(tri_id, tri_rows, width, height, y_offset=0):
    """Per-pixel (interpolants (H, W, 8), material row (H, W, 16), mask) from
    the rasterized id map + packed 64-f32 triangle rows — the gather path's
    attribute stage, also used stand-alone by tools/tap_census.py."""
    mask = tri_id >= 0
    tid = jnp.maximum(tri_id, 0)

    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    py = py + y_offset

    row = tri_rows[tid]  # (H, W, 64) — ONE gather for ALL per-pixel data
    _, lam_p, _ = _bary(row, px, py)

    attrs = row[..., 32:56].reshape(*row.shape[:-1], 3, 8)
    interp = (attrs * lam_p[..., None]).sum(-2)  # (H, W, 8)
    return interp, row[..., 16:32], mask


def gbuffer_shade_fused(tri_id, depth, pl_tiles, id_tiles,
                        atlas: AtlasDevice, height: int, width: int,
                        tile_h: int, tile_w: int,
                        texture_filter: str = "trilinear",
                        tex_interpret: bool = False,
                        tex_caps: tuple | None = None,
                        tex_cascade: bool = False,
                        return_tiled: bool = False):
    """G-buffer straight from the raster kernel's tile blocks: the plan,
    resolve AND pixel shade run tiled (texcache.shade_planes_fused) — the
    only (H, W)-layout materialization left in the stage is the final
    9-channel untile. Same math, same order as gbuffer_shade_planar.

    return_tiled=True additionally returns the raw (tiles, 9, blocks, 128)
    kernel tile blocks as (GBuffer, gb_tiles) — the fused deferred-shading
    path (ops/shade_pallas.py) consumes those directly, and XLA dead-code-
    eliminates the GBuffer's (H, W) untiles when nothing reads them."""
    from . import texcache

    cap_kw = {}
    if tex_caps is not None:
        cap_kw = {"cap_lo": tex_caps[0], "cap_hi": tex_caps[1]}
        if len(tex_caps) > 2 and tex_caps[2] is not None:
            cap_kw["stage_budget"] = tex_caps[2]
        if len(tex_caps) > 3 and tex_caps[3] is not None:
            cap_kw["block_cap"] = tex_caps[3]
    out = texcache.shade_planes_fused(
        atlas, pl_tiles, id_tiles, height, width, tile_h, tile_w,
        filter=texture_filter, interpret=tex_interpret,
        **_cascade_kw(tex_cascade), return_tiled=return_tiled, **cap_kw,
    )
    mask = tri_id >= 0
    if return_tiled:
        gb_tiles, approx_count = out
        from .texcache import _untile

        gb9 = _untile(gb_tiles, height, width, tile_h, tile_w)
    else:
        gb9, approx_count = out
    gb_a = jnp.moveaxis(gb9[0:4], 0, -1)
    gb_b = jnp.moveaxis(gb9[4:6], 0, -1)
    gb_c = jnp.moveaxis(gb9[6:9], 0, -1)
    gb = GBuffer(gb_a, gb_b, gb_c, depth, mask, approx_count)
    return (gb, gb_tiles) if return_tiled else gb


def gbuffer_shade_planar(tri_id, depth, planes, atlas: AtlasDevice,
                         texture_filter: str = "trilinear",
                         use_tex_kernel: bool = False,
                         tex_interpret: bool = False,
                         tex_caps: tuple[int, int] | None = None,
                         tex_cascade: bool = False) -> GBuffer:
    """G-buffer from the Pallas interpolation kernel's (24, H, W) planes —
    zero per-pixel attribute gathers (only the texture-atlas taps remain)."""
    mask = tri_id >= 0
    interp = jnp.moveaxis(planes[0:8], 0, -1)   # (H, W, 8)
    matrow = jnp.moveaxis(planes[8:24], 0, -1)  # (H, W, 16)
    return _shade_from_interp(interp, matrow, mask, depth, atlas,
                              texture_filter, use_tex_kernel, tex_interpret,
                              tex_caps, tex_cascade)


def tap_lod(uv, tex, mask, atlas: AtlasDevice, use_tex_kernel=True):
    """Per-slot mip LOD from the pixel-quad uv derivatives (gbuffer.hlsl's
    implicit Sample LOD): (ddx, ddy, size5, lod5). Shared by the shade path
    and the tap census so cap sizing measures the exact kernel addressing."""
    ddx, ddy = _quad_derivatives(uv)
    if use_tex_kernel:
        from . import texcache

        # per-pixel texture dims via one-hot MXU, not an XLA gather
        # (~15x faster at frame scale; docs/PERF.md round-3)
        size5 = texcache.onehot_lookup(
            atlas.base_size.astype(jnp.float32), tex
        )
    else:
        size5 = atlas.base_size[tex].astype(jnp.float32)     # (H, W, 5, 2)
    gx = ddx[..., None, :] * size5
    gy = ddy[..., None, :] * size5
    rx2 = (gx * gx).sum(-1)
    ry2 = (gy * gy).sum(-1)
    rho2 = jnp.maximum(rx2, ry2)                              # (H, W, 5)
    lod5 = 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))
    lod5 = jnp.where(mask[..., None], lod5, 99.0)  # background -> last mip
    return ddx, ddy, size5, lod5


def tap_query(interp, matrow, mask, atlas: AtlasDevice, use_tex_kernel=True):
    """(tex, u, v, lod5, active) exactly as the texture-cache kernel path
    samples them — the front end of `texcache.tap_census`, kept next to the
    shade path so the two can never drift."""
    interp = jnp.where(mask[..., None], interp, 0.0)
    uv = interp[..., 0:2]
    use = matrow[..., 6:11] > 0.5
    tex = jnp.maximum(matrow[..., 11:16].astype(jnp.int32), 0)
    _, _, _, lod5 = tap_lod(uv, tex, mask, atlas, use_tex_kernel)
    return tex, uv[..., 0], uv[..., 1], lod5, use & mask[..., None]


def _shade_from_interp(interp, matrow, mask, depth, atlas: AtlasDevice,
                       texture_filter: str = "trilinear",
                       use_tex_kernel: bool = False,
                       tex_interpret: bool = False,
                       tex_caps: tuple[int, int] | None = None,
                       tex_cascade: bool = False) -> GBuffer:
    # background pixels otherwise carry garbage interpolants -> random fetch
    # addresses; pinning them to one coarse texel keeps those fetches (up to
    # half the frame is sky) on a single hot line
    interp = jnp.where(mask[..., None], interp, 0.0)
    uv = interp[..., 0:2]
    nrm = interp[..., 2:5]
    tan = interp[..., 5:8]
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    tan = tan / jnp.maximum(jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-20)

    mat_albedo = matrow[..., 0:3]
    mat_emission = matrow[..., 3]
    mat_roughness = matrow[..., 4]
    mat_metallic = matrow[..., 5]
    use = matrow[..., 6:11] > 0.5
    tex = jnp.maximum(matrow[..., 11:16].astype(jnp.int32), 0)

    # uv derivatives -> per-texture LOD (texel-space gradient length, log2).
    # All five material slots sample through ONE vectorized trilinear call
    # (slot axis batched) — 5x less emitted gather code, bigger fused fetches.
    ddx, ddy, size5, lod5 = tap_lod(uv, tex, mask, atlas, use_tex_kernel)

    approx_count = None
    if texture_filter == "anisotropic":
        samples = sample_atlas_anisotropic(
            atlas, tex, uv, ddx, ddy, size5, mask
        )                                                     # (H, W, 5, 4)
    elif use_tex_kernel:
        from . import texcache

        # tex_caps: (cap_lo, cap_hi[, stage_budget[, block_cap]]) — the
        # census-sized knobs (tools/tap_census.py); None entries keep the
        # worst-case defaults
        cap_kw = {}
        if tex_caps is not None:
            cap_kw = {"cap_lo": tex_caps[0], "cap_hi": tex_caps[1]}
            if len(tex_caps) > 2 and tex_caps[2] is not None:
                cap_kw["stage_budget"] = tex_caps[2]
            if len(tex_caps) > 3 and tex_caps[3] is not None:
                cap_kw["block_cap"] = tex_caps[3]
        samples, approx = texcache.sample_atlas_textured(
            atlas, tex, uv[..., 0], uv[..., 1], lod5,
            active=use & mask[..., None],
            filter=texture_filter, interpret=tex_interpret,
            **_cascade_kw(tex_cascade), **cap_kw,
        )  # (H, W, 5, 4)
        approx_count = approx.sum().astype(jnp.int32)
    else:
        samples = sample_atlas_trilinear(
            atlas, tex, uv[..., 0:1], uv[..., 1:2], lod5,
            filter=texture_filter,
        )  # (H, W, 5, 4)
    albedo_tex = samples[..., 0, :3]
    normal_tex = samples[..., 1, :3]
    metallic_tex = samples[..., 2, 0]
    roughness_tex = samples[..., 3, 0]
    ao_tex = samples[..., 4, 0]

    # normal mapping: TBN with bitangent = cross(N, T) (gbuffer.hlsl:63-69)
    bit = jnp.cross(nrm, tan)
    n_ts = normal_tex * 2.0 - 1.0
    n_mapped = tan * n_ts[..., 0:1] + bit * n_ts[..., 1:2] + nrm * n_ts[..., 2:3]
    n_mapped = n_mapped / jnp.maximum(
        jnp.linalg.norm(n_mapped, axis=-1, keepdims=True), 1e-20
    )
    normal_ws = jnp.where(use[..., 1:2], n_mapped, nrm)

    albedo = jnp.where(
        use[..., 0:1],
        common.decode_gamma(albedo_tex),
        common.decode_gamma(mat_albedo),
    )
    roughness = jnp.where(use[..., 3], roughness_tex, mat_roughness)
    metallic = jnp.where(use[..., 2], metallic_tex, mat_metallic)
    # AO defaults to 0 when unmapped (gbuffer.hlsl:135-138) — reference quirk
    ao = jnp.where(use[..., 4], ao_tex, 0.0)
    emission = mat_emission

    oct = common.encode_octahedron(normal_ws)

    gb_a = _quantize8(jnp.concatenate([albedo, emission[..., None]], -1))
    gb_b = _quantize8(oct)
    gb_c = _quantize8(jnp.stack([roughness, metallic, ao], -1))

    zero = jnp.zeros(())
    gb_a = jnp.where(mask[..., None], gb_a, zero)
    gb_b = jnp.where(mask[..., None], gb_b, zero)
    gb_c = jnp.where(mask[..., None], gb_c, zero)
    return GBuffer(gb_a, gb_b, gb_c, depth, mask, approx_count)


def _bary(row, px, py):
    """Perspective-correct barycentrics from the pre-gathered (.., 32) row.

    With homogeneous edge rows (raster.setup_triangles) the edge scores B_i
    ARE the unnormalized perspective weights: lam = B / sum(B)."""
    e = row[..., :9].reshape(row.shape[:-1] + (3, 3))
    ph = jnp.stack([px, py, jnp.ones_like(px)], -1)
    scores = (e * ph[..., None, :]).sum(-1)
    sum_b = scores.sum(-1)
    lam_persp = scores / jnp.where(sum_b == 0, 1.0, sum_b)[..., None]
    return None, lam_persp, sum_b
