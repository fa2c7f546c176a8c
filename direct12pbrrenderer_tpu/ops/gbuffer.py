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

Texture sampling reproduces the D3D sampler stack: LinearWrap filtering with
trilinear LOD from screen-space uv derivatives (2x2 quad differences like the
hardware), and sRGB-EOTF linearization for *_SRGB SRVs — note the shipped
albedo textures are sRGB SRVs AND the shader gamma-decodes the sampled value
again (decode_gamma, gbuffer.hlsl:110-114); we reproduce the double decode.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import common, raster


class AtlasDevice(NamedTuple):
    data: jnp.ndarray         # (N,) uint32
    mip_offsets: jnp.ndarray  # (T, MAX_MIPS) int32
    base_size: jnp.ndarray    # (T, 2) int32
    n_mips: jnp.ndarray       # (T,) int32
    srgb: jnp.ndarray         # (T,) bool


def _unpack_rgba(u32):
    r = (u32 & 0xFF).astype(jnp.float32)
    g = ((u32 >> 8) & 0xFF).astype(jnp.float32)
    b = ((u32 >> 16) & 0xFF).astype(jnp.float32)
    a = ((u32 >> 24) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b, a], -1) * (1.0 / 255.0)


def _sample_mip_bilinear(atlas: AtlasDevice, tex_id, mip, u, v):
    """Bilinear wrap sample of one mip. tex_id/mip/u/v broadcast together."""
    mip = jnp.minimum(mip, atlas.n_mips[tex_id] - 1)
    w = jnp.maximum(atlas.base_size[tex_id, 0] >> mip, 1)
    h = jnp.maximum(atlas.base_size[tex_id, 1] >> mip, 1)
    off = atlas.mip_offsets[tex_id, mip]

    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = jnp.mod(x0.astype(jnp.int32), w)
    y0 = jnp.mod(y0.astype(jnp.int32), h)
    x1 = jnp.mod(x0 + 1, w)
    y1 = jnp.mod(y0 + 1, h)

    def fetch(yy, xx):
        return _unpack_rgba(atlas.data[off + yy * w + xx])

    c00 = fetch(y0, x0)
    c01 = fetch(y0, x1)
    c10 = fetch(y1, x0)
    c11 = fetch(y1, x1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy
        + c11 * fx * fy
    )


def sample_atlas_trilinear(atlas: AtlasDevice, tex_id, u, v, lod):
    """LinearWrap + trilinear mip filtering, sRGB-linearized when flagged."""
    lod = jnp.clip(lod, 0.0, (atlas.n_mips[tex_id] - 1).astype(jnp.float32))
    m0 = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - m0)[..., None]
    c0 = _sample_mip_bilinear(atlas, tex_id, m0, u, v)
    c1 = _sample_mip_bilinear(atlas, tex_id, m0 + 1, u, v)
    c = c0 * (1 - frac) + c1 * frac
    lin = common.srgb_eotf(c[..., :3])
    rgb = jnp.where(atlas.srgb[tex_id][..., None], lin, c[..., :3])
    return jnp.concatenate([rgb, c[..., 3:]], -1)


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


def _quantize8(x):
    """RGBA8 render-target quantization (round to nearest 1/255)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) * (1.0 / 255.0)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def gbuffer_shade(
    tri_id,                 # (H, W) int32 from rasterize
    depth,                  # (H, W) f32
    setup: raster.TriangleSetup,
    tris,                   # (T, 3) int32
    normals_ws,             # (V, 3) world-space (already InvModel^T-transformed)
    tangents_ws,            # (V, 3)
    uvs,                    # (V, 2)
    tri_material,           # (T,) int32
    mat_albedo, mat_emission, mat_roughness, mat_metallic,  # material table
    mat_use, mat_tex,       # (M, 5) bool / int32
    atlas: AtlasDevice,
    width: int,
    height: int,
    y_offset=0,
) -> GBuffer:
    mask = tri_id >= 0
    tid = jnp.maximum(tri_id, 0)

    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    py = py + y_offset
    _, lam_p, _ = raster.barycentrics_at(setup, tid, px, py)  # (H, W, 3)

    vidx = tris[tid]  # (H, W, 3)
    uv = (uvs[vidx] * lam_p[..., None]).sum(-2)  # (H, W, 2)
    nrm = (normals_ws[vidx] * lam_p[..., None]).sum(-2)
    tan = (tangents_ws[vidx] * lam_p[..., None]).sum(-2)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    tan = tan / jnp.maximum(jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-20)

    mat = tri_material[tid]  # (H, W)
    use = mat_use[mat]       # (H, W, 5)
    tex = jnp.maximum(mat_tex[mat], 0)

    # uv derivatives -> per-texture LOD (texel-space gradient length, log2)
    ddx, ddy = _quad_derivatives(uv)

    def lod_for(tex_id):
        size = atlas.base_size[tex_id].astype(jnp.float32)  # (H, W, 2)
        gx = ddx * size
        gy = ddy * size
        rho2 = jnp.maximum((gx * gx).sum(-1), (gy * gy).sum(-1))
        return 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))

    def sample(slot):
        t = tex[..., slot]
        return sample_atlas_trilinear(atlas, t, uv[..., 0], uv[..., 1], lod_for(t))

    albedo_tex = sample(0)[..., :3]
    normal_tex = sample(1)[..., :3]
    metallic_tex = sample(2)[..., 0]
    roughness_tex = sample(3)[..., 0]
    ao_tex = sample(4)[..., 0]

    # normal mapping: TBN with bitangent = cross(N, T) (gbuffer.hlsl:63-69)
    bit = jnp.cross(nrm, tan)
    n_ts = normal_tex * 2.0 - 1.0
    n_mapped = (
        tan * n_ts[..., 0:1] + bit * n_ts[..., 1:2] + nrm * n_ts[..., 2:3]
    )
    n_mapped = n_mapped / jnp.maximum(
        jnp.linalg.norm(n_mapped, axis=-1, keepdims=True), 1e-20
    )
    normal_ws = jnp.where(use[..., 1:2], n_mapped, nrm)

    albedo = jnp.where(
        use[..., 0:1],
        common.decode_gamma(albedo_tex),
        common.decode_gamma(mat_albedo[mat]),
    )
    roughness = jnp.where(use[..., 3], roughness_tex, mat_roughness[mat])
    metallic = jnp.where(use[..., 2], metallic_tex, mat_metallic[mat])
    # AO defaults to 0 when unmapped (gbuffer.hlsl:135-138) — reference quirk
    ao = jnp.where(use[..., 4], ao_tex, 0.0)
    emission = mat_emission[mat]

    oct = common.encode_octahedron(normal_ws)

    gb_a = _quantize8(jnp.concatenate([albedo, emission[..., None]], -1))
    gb_b = _quantize8(oct)
    gb_c = _quantize8(jnp.stack([roughness, metallic, ao], -1))

    zero = jnp.zeros(())
    gb_a = jnp.where(mask[..., None], gb_a, zero)
    gb_b = jnp.where(mask[..., None], gb_b, zero)
    gb_c = jnp.where(mask[..., None], gb_c, zero)
    return GBuffer(gb_a, gb_b, gb_c, depth, mask)
