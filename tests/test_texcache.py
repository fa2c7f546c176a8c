"""Software texture cache (ops/texcache.py) vs the XLA sampler.

The kernel path must reproduce gbuffer.sample_atlas_trilinear exactly: the
page cover + VMEM gather resolves the covered pixels, the pinned sidecar the
rest, and the combination is the same trilinear math in the same order.
Kernels run in Pallas interpret mode (CPU CI); the TPU compile path is
exercised by the benchmark/profile tools on hardware.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from direct12pbrrenderer_tpu.ops import gbuffer, texcache
from direct12pbrrenderer_tpu.pipeline import scene_pack
from direct12pbrrenderer_tpu.resource.formats import ETextureFormat


class _StubTexture:
    """Minimal TextureData stand-in for the atlas builder."""

    def __init__(self, rng, w, h, srgb=False):
        self.format = (
            ETextureFormat.R8G8B8A8_UNORM_SRGB
            if srgb
            else ETextureFormat.R8G8B8A8_UNORM
        )
        self.mips = []
        while True:
            self.mips.append(
                rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            )
            if w == 1 and h == 1:
                break
            w, h = max(w >> 1, 1), max(h >> 1, 1)
        self.mip_levels = len(self.mips)

    def mip_array_rgba(self, mip):
        return self.mips[mip]


def _build_atlas(rng, specs):
    builder = scene_pack._AtlasBuilder()
    for w, h, srgb in specs:
        builder.add(_StubTexture(rng, w, h, srgb))
    a = builder.build()
    return gbuffer.AtlasDevice(
        jnp.asarray(a.data),
        jnp.asarray(a.page_base),
        jnp.asarray(a.base_size),
        jnp.asarray(a.n_mips),
        jnp.asarray(a.srgb),
    )


def _random_case(rng, h, w, n_tex, uv_scale=2.0, lod_max=6.0):
    tex = jnp.asarray(rng.integers(0, n_tex, (h, w, 5)), jnp.int32)
    u = jnp.asarray(rng.random((h, w), np.float32) * uv_scale - 0.5)
    v = jnp.asarray(rng.random((h, w), np.float32) * uv_scale - 0.5)
    lod = jnp.asarray(rng.random((h, w, 5), np.float32) * lod_max)
    active = jnp.asarray(rng.random((h, w, 5)) > 0.2)
    return tex, u, v, lod, active


@pytest.mark.parametrize("filter", ["trilinear", "bilinear"])
def test_tiled_matches_raw_sampler(filter):
    rng = np.random.default_rng(7)
    atlas = _build_atlas(rng, [(64, 64, False), (32, 16, True), (128, 64, False)])
    h, w = 24, 128  # one tile
    tex, u, v, lod, active = _random_case(rng, h, w, 3)
    # fully random uv/lod is an adversarial working set (real frames are
    # tile-coherent); caps sized so every distinct page fits -> full cover
    rgba, covered, approx = texcache.sample_atlas_tiled(
        atlas, tex, u, v, lod, active, filter=filter, interpret=True,
        cap_lo=156, cap_hi=52, block_cap=None,
    )
    ref = gbuffer.sample_atlas_raw(
        atlas, tex, u[..., None], v[..., None], lod, filter=filter
    )
    cov = np.asarray(covered)
    act = np.asarray(active)
    assert cov[act].all()
    np.testing.assert_allclose(
        np.asarray(rgba)[cov], np.asarray(ref)[cov], atol=1e-6
    )
    assert not cov[~act].any()
    assert not np.asarray(approx)[~act].any()


def test_textured_covered_exact_overflow_approximated():
    """Exact where covered; page-budget overflows (huge textures, scattered
    uv -> sparse covers) resolve to the texture's 1x1-mip average color."""
    rng = np.random.default_rng(3)
    atlas = _build_atlas(rng, [(512, 512, True), (256, 128, False)])
    h, w = 48, 128
    tex, u, v, lod, active = _random_case(rng, h, w, 2, uv_scale=4.0,
                                          lod_max=1.5)
    out, approx = texcache.sample_atlas_textured(
        atlas, tex, u, v, lod, active, interpret=True
    )
    ref = gbuffer.sample_atlas_trilinear(
        atlas, tex, u[..., None], v[..., None], lod
    )
    act = np.asarray(active)
    ap = np.asarray(approx)
    exact = act & ~ap
    np.testing.assert_allclose(
        np.asarray(out)[exact], np.asarray(ref)[exact], atol=1e-6
    )
    if ap.any():
        # overflow taps = the coarsest mip's (sRGB-applied) bilinear sample
        fb = gbuffer.sample_atlas_trilinear(
            atlas, tex, u[..., None], v[..., None],
            jnp.full_like(lod, 99.0), filter="bilinear",
        )
        np.testing.assert_allclose(
            np.asarray(out)[ap], np.asarray(fb)[ap], atol=1e-6
        )


def test_wrap_seam_and_mip_clamp():
    """uv far outside [0,1] (wrap) and lod beyond the chain (clamp)."""
    rng = np.random.default_rng(11)
    atlas = _build_atlas(rng, [(32, 32, False)])
    h, w = 24, 128
    tex = jnp.zeros((h, w, 5), jnp.int32)
    u = jnp.asarray(rng.random((h, w), np.float32) * 20.0 - 10.0)
    v = jnp.asarray(rng.random((h, w), np.float32) * 20.0 - 10.0)
    lod = jnp.asarray(rng.random((h, w, 5), np.float32) * 12.0)
    active = jnp.ones((h, w, 5), bool)
    out, _ = texcache.sample_atlas_textured(
        atlas, tex, u, v, lod, active, block_cap=None, interpret=True
    )
    ref = gbuffer.sample_atlas_trilinear(
        atlas, tex, u[..., None], v[..., None], lod
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pick_tile():
    assert texcache.pick_tile(1080, 1920) == (24, 128)
    assert texcache.pick_tile(192, 256) == (24, 128)
    th, tw = texcache.pick_tile(960, 1440)
    assert 960 % th == 0 and 1440 % tw == 0 and (th * tw) % 128 == 0
    assert texcache.pick_tile(7, 13) is None


def test_page_major_layout_addressing():
    """page_record_index must address exactly the texel _page_major placed."""
    rng = np.random.default_rng(5)
    h, w = 24, 40  # non-multiple of page dims -> padded
    quads = rng.integers(0, 2**32, (h, w, 4), dtype=np.uint32)
    paged = scene_pack._page_major(quads)
    for x0, y0 in [(0, 0), (39, 23), (17, 9), (15, 7), (16, 8)]:
        idx = int(
            gbuffer.page_record_index(jnp.int32(0), jnp.int32(w),
                                      jnp.int32(x0), jnp.int32(y0))
        )
        np.testing.assert_array_equal(paged[idx], quads[y0, x0])


def test_two_level_cover_on_coherent_content():
    """The production block_cap path: row-coherent uv (what real frames
    produce) must reach full coverage and bit-exactness through the
    two-level cover."""
    rng = np.random.default_rng(21)
    atlas = _build_atlas(rng, [(128, 64, False), (64, 64, True)])
    h, w = 24, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u = jnp.asarray(0.1 + xx / w * 1.2)          # smooth ramps, wrap at edge
    v = jnp.asarray(0.2 + yy / h * 0.9)
    tex = jnp.asarray((xx > 64).astype(np.int32))[..., None] * jnp.ones(
        (1, 1, 5), jnp.int32)
    lod = jnp.asarray(np.broadcast_to(yy[..., None] / h * 3.0, (h, w, 5)).copy())
    active = jnp.ones((h, w, 5), bool)
    rgba, covered, approx = texcache.sample_atlas_tiled(
        atlas, tex, u, v, lod, active, block_cap=12, interpret=True,
    )
    assert np.asarray(covered).all() and not np.asarray(approx).any()
    ref = gbuffer.sample_atlas_raw(atlas, tex, u[..., None], v[..., None], lod)
    np.testing.assert_allclose(np.asarray(rgba), np.asarray(ref), atol=1e-6)


def test_anisotropic_beats_trilinear_at_grazing():
    """Software aniso (4 taps along the major axis, sharpened mip) must track
    a supersampled ground truth more closely than trilinear on a strongly
    anisotropic footprint (the floor-at-grazing-angle case)."""

    class _Checker:
        format = ETextureFormat.R8G8B8A8_UNORM

        def __init__(self, size=64):
            yy, xx = np.mgrid[0:size, 0:size]
            img = ((xx // 8 ^ yy // 8) & 1) * 255
            m = np.stack([img] * 3 + [np.full_like(img, 255)], -1).astype(np.uint8)
            self.mips = [m]
            while m.shape[0] > 1:
                m = m.reshape(m.shape[0] // 2, 2, m.shape[1] // 2, 2, 4).mean(
                    (1, 3)).astype(np.uint8)
                self.mips.append(m)
            self.mip_levels = len(self.mips)

        def mip_array_rgba(self, mip):
            return self.mips[mip]

    builder = scene_pack._AtlasBuilder()
    builder.add(_Checker())
    a = builder.build()
    atlas = gbuffer.AtlasDevice(
        jnp.asarray(a.data), jnp.asarray(a.page_base),
        jnp.asarray(a.base_size), jnp.asarray(a.n_mips), jnp.asarray(a.srgb))

    h, w = 8, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # 1 texel/px along u, 16 texels/px along v: ratio 16 (grazing floor)
    uv = np.stack([(xx + 0.5) / 64.0, (yy + 0.5) * 16.0 / 64.0], -1)
    ddx = np.broadcast_to(np.array([1 / 64.0, 0.0], np.float32), (h, w, 2))
    ddy = np.broadcast_to(np.array([0.0, 16 / 64.0], np.float32), (h, w, 2))
    tex = jnp.zeros((h, w, 5), jnp.int32)
    size5 = jnp.broadcast_to(
        atlas.base_size[0].astype(jnp.float32), (h, w, 5, 2))
    mask = jnp.ones((h, w), bool)
    uvj = jnp.asarray(uv)

    aniso = np.asarray(gbuffer.sample_atlas_anisotropic(
        atlas, tex, uvj, jnp.asarray(ddx), jnp.asarray(ddy), size5, mask
    ))[..., 0, :3]

    lod_tri = jnp.full((h, w, 5), np.log2(16.0), jnp.float32)
    tri = np.asarray(gbuffer.sample_atlas_raw(
        atlas, tex, uvj[..., 0:1], uvj[..., 1:2], lod_tri))[..., 0, :3]

    # ground truth: 33-point supersample of the mip-0 bilinear along the
    # footprint's long axis
    acc = 0.0
    for i in range(33):
        t = i / 32.0 - 0.5
        acc += np.asarray(gbuffer.sample_atlas_raw(
            atlas, tex,
            jnp.asarray(uv[..., 0:1]),
            jnp.asarray(uv[..., 1:2] + t * 16.0 / 64.0),
            jnp.zeros((h, w, 5), jnp.float32)))
    truth = (acc / 33.0)[..., 0, :3]

    err_aniso = float(np.sqrt(np.mean((aniso - truth) ** 2)))
    err_tri = float(np.sqrt(np.mean((tri - truth) ** 2)))
    assert err_aniso < err_tri * 0.6, (err_aniso, err_tri)


def test_fused_cover_dynamic_matches_static():
    """The dynamically-bounded fused cover kernel (merge loops fori'd over
    the realized candidate count) must be bit-identical to the static
    worst-case kernel across sparse, dense, overflowing and empty groups."""
    rng = np.random.default_rng(31)
    tiles, g, blocks, block_cap = 3, 3, 24, 16
    pages = np.zeros((tiles, g, blocks, 128), np.int32)
    act = np.zeros((tiles, g, blocks, 128), bool)
    # group 0: sparse coherent (1-3 distinct per row)
    pages[:, 0] = rng.integers(0, 3, (tiles, blocks, 128))
    act[:, 0] = rng.random((tiles, blocks, 128)) > 0.1
    # group 1: adversarial — more distinct per row than block_cap
    pages[:, 1] = rng.integers(0, 1000, (tiles, blocks, 128))
    act[:, 1] = True
    # group 2: empty (all inactive) on tile 0, medium density elsewhere
    pages[:, 2] = rng.integers(0, 40, (tiles, blocks, 128))
    act[1:, 2] = rng.random((tiles - 1, blocks, 128)) > 0.5
    caps = (96, 48, 96)

    outs = {}
    for dyn in (True, False):
        outs[dyn] = texcache._fused_cover_pallas(
            jnp.asarray(pages), jnp.asarray(act), caps, block_cap, 96,
            interpret=True, dynamic=dyn,
        )
    for a, b, name in zip(outs[True], outs[False],
                          ("list", "cnt", "slot", "cov")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    # sanity: the sparse group is fully covered, the adversarial one is not
    cov = np.asarray(outs[True][3]) != 0
    assert cov[:, 0][act[:, 0]].all()
    assert not cov[:, 1].all()


def test_fused_cover_batched_matches_per_group_fast():
    """FAST-TIER guard on the production default (FUSED_COVER_BATCHED):
    the group-batched one-stream kernel must be bit-identical to the
    per-group kernel at small shapes. The exhaustive suites above are
    slow-tier; this keeps `pytest -m "not slow"` exercising the default
    cover kernel (ADVICE round-3 #2). Uses the explicit `batched=` parameter
    — no global mutation."""
    rng = np.random.default_rng(7)
    tiles, g, blocks, block_cap = 2, 3, 16, 4
    pages = rng.integers(0, 25, (tiles, g, blocks, 128)).astype(np.int32)
    act = rng.random((tiles, g, blocks, 128)) > 0.3
    act[0, 1] = False  # one empty group exercises the pl.when gates
    caps = (16, 8, 16)

    outs = {}
    for batched in (True, False):
        outs[batched] = texcache._fused_cover_pallas(
            jnp.asarray(pages), jnp.asarray(act), caps, block_cap, 16,
            interpret=True, dynamic=False, batched=batched,
        )
    for a, b, name in zip(outs[True], outs[False],
                          ("list", "cnt", "slot", "cov")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    # and against the sort path (ground truth for cover semantics)
    pl_s, cnt_s, slot_s, cov_s = texcache._cover_and_match_2level(
        jnp.asarray(pages), jnp.asarray(act), caps, block_cap, kernel=False,
    )
    np.testing.assert_array_equal(np.asarray(outs[True][0])[..., :16],
                                  np.asarray(pl_s))
    np.testing.assert_array_equal(np.asarray(outs[True][1])[..., 0],
                                  np.asarray(cnt_s))
    np.testing.assert_array_equal(np.asarray(outs[True][3]) != 0,
                                  np.asarray(cov_s))


def test_shade_planes_fused_matches_planar():
    """The round-4 fused G-buffer back half (plan + resolve + pixel shade on
    raster tile blocks, texcache.shade_planes_fused) must reproduce the
    planar path (gbuffer_shade_planar with the cache kernel) — same taps,
    same shade math, same RGBA8 quantization."""
    rng = np.random.default_rng(23)
    h, w, th, tw = 48, 256, 24, 128
    atlas = _build_atlas(rng, [(32, 16, True), (16, 16, False), (8, 8, False)])

    # synthetic raster planes: smooth uv ramps (realistic page coherence),
    # random unit-ish normals/tangents, random material rows
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    uv = np.stack([xx / w * 1.5 - 0.2 + rng.random((h, w)) * 0.01,
                   yy / h * 1.2 + rng.random((h, w)) * 0.01], 0)
    nrm = rng.normal(size=(3, h, w)).astype(np.float32)
    tan = rng.normal(size=(3, h, w)).astype(np.float32)
    mat = np.zeros((16, h, w), np.float32)
    mat[0:3] = rng.random((3, h, w))          # albedo
    mat[3] = rng.random((h, w))               # emission
    mat[4] = rng.random((h, w))               # roughness
    mat[5] = rng.random((h, w))               # metallic
    mat[6:11] = (rng.random((5, h, w)) > 0.4).astype(np.float32)  # use
    mat[11:16] = rng.integers(0, 3, (5, h, w)).astype(np.float32)  # tex ids
    planes = jnp.asarray(
        np.concatenate([uv, nrm, tan, mat], 0).astype(np.float32)
    )                                          # (24, h, w)
    tri_id = jnp.asarray(
        np.where(rng.random((h, w)) > 0.15, 1, -1).astype(np.int32)
    )
    depth = jnp.asarray(rng.random((h, w), np.float32))

    ref = gbuffer.gbuffer_shade_planar(
        tri_id, depth, planes, atlas, "trilinear",
        use_tex_kernel=True, tex_interpret=True,
    )

    # raster-kernel tile-block layout of the same planes/ids
    ty, tx = h // th, w // tw
    p = th * tw
    pl_tiles = jnp.asarray(
        np.asarray(planes).reshape(24, ty, th, tx, tw)
        .transpose(1, 3, 2, 4, 0).reshape(ty * tx, p, 24)
    )
    id_tiles = jnp.asarray(
        np.asarray(tri_id).reshape(ty, th, tx, tw)
        .transpose(0, 2, 1, 3).reshape(ty * tx, p, 1)
    )
    got = gbuffer.gbuffer_shade_fused(
        tri_id, depth, pl_tiles, id_tiles, atlas, h, w, th, tw,
        "trilinear", tex_interpret=True,
    )

    for a, b, name in (
        (ref.albedo_emission, got.albedo_emission, "A"),
        (ref.normal_oct, got.normal_oct, "B"),
        (ref.rough_metal_ao, got.rough_metal_ao, "C"),
    ):
        a, b = np.asarray(a), np.asarray(b)
        # both are RGBA8-quantized; channel-form math may flip a rounding
        # knife-edge by 1 LSB on a handful of pixels
        assert np.abs(a - b).max() <= 1.01 / 255.0, name
        assert (np.abs(a - b) > 1e-6).mean() < 2e-3, name
    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(got.mask))
    assert int(got.tex_approx) == int(ref.tex_approx)


def test_cascade_noop_when_fully_covered():
    """With generous caps (everything covered) the LOD-clamp cascade must be
    a bit-exact no-op — sel is empty, taps resolve from the primary cover."""
    rng = np.random.default_rng(5)
    atlas = _build_atlas(rng, [(32, 16, False), (16, 16, True)])
    h, w = 24, 128
    tex, u, v, lod, active = _random_case(rng, h, w, 2, uv_scale=1.0,
                                          lod_max=2.0)
    outs = {}
    for casc in (False, True):
        outs[casc] = texcache.sample_atlas_tiled(
            atlas, tex, u, v, lod, active, tile_h=24, tile_w=128,
            interpret=True, cascade=casc,
        )
    for a, b, name in zip(outs[False], outs[True],
                          ("rgba", "covered", "approx")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    assert not np.asarray(outs[True][2]).any()


def test_cascade_blur_beats_average_color_on_overflow():
    """Starve the page cover (tiny caps): overflow taps must resolve closer
    to the true trilinear value through the mip+3 cascade than through the
    coarsest-mip average — and stay counted in `approx` (honesty)."""
    rng = np.random.default_rng(9)

    class _GradientTexture(_StubTexture):
        """Spatially-structured content (the stub's default random-noise
        mips would make mip+3 ~= the average color, hiding the cascade)."""

        def __init__(self, w, h):
            self.format = ETextureFormat.R8G8B8A8_UNORM
            self.mips = []
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            img = np.stack([xx * 255 // max(w - 1, 1),
                            yy * 255 // max(h - 1, 1),
                            (xx + yy) * 255 // max(w + h - 2, 1),
                            np.full_like(xx, 255)], -1).astype(np.uint8)
            while True:
                self.mips.append(img)
                if img.shape[0] == 1 and img.shape[1] == 1:
                    break
                hh, ww = max(img.shape[0] // 2, 1), max(img.shape[1] // 2, 1)
                img = img[:hh * 2, :ww * 2].reshape(
                    hh, 2, ww, 2, 4).mean((1, 3)).astype(np.uint8)
            self.mip_levels = len(self.mips)

    builder = scene_pack._AtlasBuilder()
    builder.add(_GradientTexture(128, 128))
    a = builder.build()
    atlas = gbuffer.AtlasDevice(
        jnp.asarray(a.data), jnp.asarray(a.page_base),
        jnp.asarray(a.base_size), jnp.asarray(a.n_mips), jnp.asarray(a.srgb),
    )
    h, w = 24, 128
    # incoherent uv: every pixel lands on a different page at mip 0
    tex = jnp.zeros((h, w, 5), jnp.int32)
    u = jnp.asarray(rng.random((h, w), np.float32))
    v = jnp.asarray(rng.random((h, w), np.float32))
    lod = jnp.zeros((h, w, 5), jnp.float32)
    active = jnp.ones((h, w, 5), bool)
    kw = dict(tile_h=24, tile_w=128, cap_lo=4, cap_hi=4, block_cap=4,
              interpret=True)
    truth = np.asarray(gbuffer.sample_atlas_raw(
        atlas, tex, u[..., None], v[..., None], lod))
    out_nc = texcache.sample_atlas_tiled(
        atlas, tex, u, v, lod, active, cascade=False, **kw)
    out_c = texcache.sample_atlas_tiled(
        atlas, tex, u, v, lod, active, cascade=True, **kw)
    approx_nc = np.asarray(out_nc[2])
    approx_c = np.asarray(out_c[2])
    np.testing.assert_array_equal(approx_nc, approx_c)  # honesty unchanged
    assert approx_c.mean() > 0.5  # the starved cover really overflowed
    err_nc = np.abs(np.asarray(out_nc[0]) - truth)[approx_nc].mean()
    err_c = np.abs(np.asarray(out_c[0]) - truth)[approx_c].mean()
    assert err_c < err_nc * 0.7, (err_c, err_nc)
    # covered taps identical on both paths
    cov = np.asarray(out_c[1])
    np.testing.assert_array_equal(np.asarray(out_nc[0])[cov],
                                  np.asarray(out_c[0])[cov])


def test_tap_census_recommend_covers():
    """Caps sized by the census (headroom 1.0) must fully cover the same
    frame: zero approx taps at the recommended caps, and >0 approx taps one
    SEG_CHUNK below realized demand — pinning the census against the kernel's
    actual cover behavior from both sides."""
    rng = np.random.default_rng(11)
    atlas = _build_atlas(rng, [(64, 64, False), (32, 16, True),
                               (128, 64, False)])
    h, w = 24, 128
    # coherent working set (one texture per slot, smooth uv ramp, uniform
    # LOD): realized demand well below the worst-case defaults, as on real
    # frames
    tex = jnp.broadcast_to(
        jnp.arange(5, dtype=jnp.int32)[None, None, :] % 3, (h, w, 5)
    )
    yy, xx = jnp.meshgrid(jnp.arange(h) / h, jnp.arange(w) / w, indexing="ij")
    u = xx.astype(jnp.float32) * 0.9
    v = yy.astype(jnp.float32) * 0.9
    lod = jnp.full((h, w, 5), 1.3, jnp.float32)
    active = jnp.asarray(rng.random((h, w, 5)) > 0.2)

    census = texcache.tap_census(atlas, tex, u, v, lod, active,
                                 tile_h=24, tile_w=128)
    assert census["lo"]["max"] >= 1
    assert census["lo"]["max"] >= census["lo"]["p99"]

    cap_lo, cap_hi = texcache.recommend_caps([census], headroom=1.0)
    assert (cap_lo + texcache.CAP_FB) % texcache.SEG_CHUNK == 0
    assert (cap_hi + texcache.CAP_FB) % texcache.SEG_CHUNK == 0
    assert cap_lo >= census["lo"]["max"]
    assert cap_hi >= census["hi"]["max"]

    _, covered, approx = texcache.sample_atlas_tiled(
        atlas, tex, u, v, lod, active, filter="trilinear", interpret=True,
        cap_lo=cap_lo, cap_hi=cap_hi, block_cap=None,
    )
    assert np.asarray(approx)[np.asarray(active)].sum() == 0
    assert np.asarray(covered)[np.asarray(active)].all()

    # one SEG_CHUNK below demand must overflow (and be counted honestly)
    starve = max(texcache.SEG_CHUNK - texcache.CAP_FB,
                 cap_lo - texcache.SEG_CHUNK)
    if starve < census["lo"]["max"]:
        _, _, approx2 = texcache.sample_atlas_tiled(
            atlas, tex, u, v, lod, active, filter="trilinear", interpret=True,
            cap_lo=starve, cap_hi=cap_hi, block_cap=None,
        )
        assert np.asarray(approx2)[np.asarray(active)].sum() > 0


def test_tap_census_multi_frame_fold():
    """recommend_caps folds multiple poses (max over frames) and never
    exceeds the worst-case defaults."""
    rng = np.random.default_rng(13)
    atlas = _build_atlas(rng, [(64, 64, False), (32, 16, True),
                               (128, 64, False)])
    h, w = 24, 128
    frames = []
    for seed in (1, 2):
        r = np.random.default_rng(seed)
        tex, u, v, lod, active = _random_case(r, h, w, 3)
        frames.append(texcache.tap_census(atlas, tex, u, v, lod, active,
                                          tile_h=24, tile_w=128))
    cap_lo, cap_hi = texcache.recommend_caps(frames, headroom=2.0)
    assert cap_lo <= 92 and cap_hi <= 44  # adversarial content -> defaults
    single = texcache.recommend_caps(frames[:1], headroom=1.0)
    both = texcache.recommend_caps(frames, headroom=1.0)
    assert both[0] >= single[0] or both[0] == 92


def test_stage_budget_truncation_and_exactness():
    """Compact staging under a reduced budget: covered taps stay bit-equal to
    the XLA sampler; budget-starved taps degrade to the counted fallback."""
    rng = np.random.default_rng(17)
    atlas = _build_atlas(rng, [(64, 64, False), (32, 16, True),
                               (128, 64, False)])
    h, w = 24, 128
    tex, u, v, lod, active = _random_case(rng, h, w, 3)

    full, cov_full, apx_full = texcache.sample_atlas_tiled(
        atlas, tex, u, v, lod, active, filter="trilinear", interpret=True,
        cap_lo=156, cap_hi=52, block_cap=None,
    )
    ref = gbuffer.sample_atlas_raw(
        atlas, tex, u[..., None], v[..., None], lod, filter="trilinear"
    )

    # a generous budget must not change anything (spans all fit)
    big, cov_big, apx_big = texcache.sample_atlas_tiled(
        atlas, tex, u, v, lod, active, filter="trilinear", interpret=True,
        cap_lo=156, cap_hi=52, block_cap=None,
        stage_budget=5 * 160 + 5 * 56,
    )
    assert np.array_equal(np.asarray(full), np.asarray(big))
    assert np.array_equal(np.asarray(cov_full), np.asarray(cov_big))

    # a starved budget truncates: fewer covered taps, all still bit-exact,
    # the rest counted in approx (and resolving to the 1x1 fallback color)
    small_b = texcache.SEG_CHUNK * 10 * 2  # 2 chunks per group on average
    sm, cov_sm, apx_sm = texcache.sample_atlas_tiled(
        atlas, tex, u, v, lod, active, filter="trilinear", interpret=True,
        cap_lo=156, cap_hi=52, block_cap=None, stage_budget=small_b,
    )
    cov = np.asarray(cov_sm)
    assert cov.sum() < np.asarray(cov_full).sum()
    np.testing.assert_allclose(
        np.asarray(sm)[cov], np.asarray(ref)[cov], atol=1e-6
    )
    act = np.asarray(active)
    assert np.array_equal(np.asarray(apx_sm), act & ~cov)
