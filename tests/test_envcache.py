"""Float texture cache (ops/envcache.py) vs the XLA env/LUT samplers.

Covered taps must be bit-equal to common.sample_cube_atlas_trilinear /
sample_quad_tex2d / _cube_atlas_bilinear; page-budget overflows resolve to
the texture's average color. Kernels run in Pallas interpret mode (CPU CI).
"""

import numpy as np
import jax.numpy as jnp

from direct12pbrrenderer_tpu.ops import common, envcache


def _cube_chain(rng, size, n_mips, c=3):
    # bf16-valued f32 content: the page store quantizes to bf16 (the
    # reference's own env storage is RGBA16F), so the XLA reference samplers
    # must see the identical values for bit-level machinery checks
    return [
        [envcache.quantize_bf16(
            rng.random((max(size >> m, 1), max(size >> m, 1), c))
            .astype(np.float32))
         for m in range(n_mips)]
        for _ in range(6)
    ]


def _cube_atlas_from_chains(chains):
    """CubeMipAtlas equivalent of the same data (the XLA reference path)."""
    n_mips = len(chains[0])
    return common.CubeMipAtlas(
        [jnp.asarray(np.stack([np.asarray(ch[m]) for ch in chains]))
         for m in range(n_mips)]
    )


def _build(rng, env_size=16, env_mips=4, sky_size=8, lut_size=8):
    env_chains = _cube_chain(rng, env_size, env_mips)
    sky_chains = _cube_chain(rng, sky_size, 1)
    lut = envcache.quantize_bf16(
        rng.random((lut_size, lut_size, 2)).astype(np.float32))
    b = envcache.FloatAtlasBuilder()
    env_base = b.add_cube(env_chains)
    sky_base = b.add_cube(sky_chains)
    lut_tid = b.add([lut])
    atlas = b.build()
    return atlas, env_base, sky_base, lut_tid, env_chains, sky_chains, lut


def test_env_tiled_matches_xla_samplers():
    rng = np.random.default_rng(5)
    atlas, env_base, sky_base, lut_tid, env_chains, sky_chains, lut = _build(rng)
    env_ref = _cube_atlas_from_chains(env_chains)
    sky_ref = _cube_atlas_from_chains(sky_chains)
    lut_quad = common.make_quad_tex2d(jnp.asarray(lut))

    h, w = 24, 128
    dirs = rng.normal(size=(h, w, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = rng.normal(size=(h, w, 3)).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=-1, keepdims=True)
    rough = rng.random((h, w), dtype=np.float32)
    ndv = rng.random((h, w), dtype=np.float32)
    mask = jnp.asarray(rng.random((h, w)) > 0.4)

    dirs = jnp.asarray(dirs)
    rays = jnp.asarray(rays)
    rough = jnp.asarray(rough)
    ndv = jnp.asarray(ndv)

    n_mips = len(env_chains[0])
    lvl = jnp.clip(rough * 5.0, 0.0, n_mips - 1.0)
    lo = jnp.floor(lvl).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n_mips - 1)
    frac = (lvl - lo)[..., None]

    face_e, ue, ve = common.cubemap_coords(dirs)
    face_s, us, vs = common.cubemap_coords(rays)
    zero = jnp.zeros((h, w), jnp.int32)

    tex = jnp.stack([env_base + face_e, env_base + face_e,
                     jnp.full((h, w), lut_tid, jnp.int32),
                     sky_base + face_s], -1)
    mip = jnp.stack([lo, hi, zero, zero], -1)
    u = jnp.stack([ue, ue, rough, us], -1)
    v = jnp.stack([ve, ve, ndv, vs], -1)
    active = jnp.stack([mask, mask, mask, ~mask], -1)

    # adversarial random dirs touch all 6 faces x 4 mips (~30 pages/group);
    # cap sized so everything fits -> full cover expected
    fb = (tuple(range(env_base, env_base + 6)),
          tuple(range(env_base, env_base + 6)),
          (lut_tid,),
          tuple(range(sky_base, sky_base + 6)))
    rgba, covered, approx = envcache.sample_env_tiled(
        atlas, tex, mip, u, v, active, fb_tids=fb, share=((0, 1),), cap=40,
        block_cap=None, interpret=True,
    )
    cov = np.asarray(covered)
    act = np.asarray(active)
    assert cov[act].all()
    assert not cov[~act].any() and not np.asarray(approx).any()

    env_out = np.asarray(rgba[..., 0, :3] * (1 - frac) + rgba[..., 1, :3] * frac)
    env_want = np.asarray(common.sample_cube_atlas_trilinear(env_ref, dirs, rough * 5.0))
    m = np.asarray(mask)
    np.testing.assert_allclose(env_out[m], env_want[m], atol=1e-5)

    lut_out = np.asarray(rgba[..., 2, :2])
    lut_want = np.asarray(common.sample_quad_tex2d(lut_quad, 8, 8, rough, ndv))
    np.testing.assert_allclose(lut_out[m], lut_want[m], atol=1e-6)

    sky_out = np.asarray(rgba[..., 3, :3])
    sky_want = np.asarray(common._cube_atlas_bilinear(sky_ref, rays, jnp.int32(0)))
    np.testing.assert_allclose(sky_out[~m], sky_want[~m], atol=1e-6)


def test_env_overflow_resolves_to_coarse_directional_fallback():
    """Tiny page budget -> overflow taps resolve as a bilinear sample of the
    per-face one-page coarse fallback mip at the SAME uv (directional — the
    flat-average fallback showed as tile-sized blocks in reflections)."""
    rng = np.random.default_rng(9)
    atlas, env_base, sky_base, lut_tid, env_chains, _, _ = _build(
        rng, env_size=64, env_mips=2)
    h, w = 24, 128
    dirs = rng.normal(size=(h, w, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    face, uu, vv = common.cubemap_coords(dirs)
    ones = jnp.ones((h, w), bool)
    zero = jnp.zeros((h, w), jnp.int32)
    rgba, covered, approx = envcache.sample_env_tiled(
        atlas, (env_base + face)[..., None], zero[..., None],
        uu[..., None], vv[..., None], ones[..., None],
        fb_tids=(tuple(range(env_base, env_base + 6)),),
        cap=8, interpret=True,
    )
    cov = np.asarray(covered)[..., 0]
    ap = np.asarray(approx)[..., 0]
    assert ap.any() and (cov | ap).all()  # every tap resolves, by design

    def bil_clamp(img, u, v):
        hh, ww = img.shape[:2]
        x = u * ww - 0.5
        y = v * hh - 0.5
        x0 = np.clip(np.floor(x), 0, ww - 1).astype(int)
        y0 = np.clip(np.floor(y), 0, hh - 1).astype(int)
        fx = np.clip(x - x0, 0, 1)[..., None]
        fy = np.clip(y - y0, 0, 1)[..., None]
        x1 = np.minimum(x0 + 1, ww - 1)
        y1 = np.minimum(y0 + 1, hh - 1)
        return (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x1] * fx * (1 - fy)
                + img[y1, x0] * (1 - fx) * fy + img[y1, x1] * fx * fy)

    fnp = np.asarray(face)
    unp, vnp = np.asarray(uu), np.asarray(vv)
    want = np.zeros((h, w, 3), np.float32)
    for f in range(6):
        # the store quantizes pages AFTER the downsample -> mirror that
        coarse = envcache.quantize_bf16(
            envcache.coarse_fallback_mip(env_chains[f][-1])
        )
        m = fnp == f
        want[m] = bil_clamp(coarse, unp[m], vnp[m])
    got = np.asarray(rgba)[..., 0, :3][ap]
    np.testing.assert_allclose(got, want[ap], atol=1e-5)


def _budget_inputs(rng, atlas_pack):
    atlas, env_base, sky_base, lut_tid, *_ = atlas_pack
    h, w = 24, 128
    dirs = rng.normal(size=(h, w, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    face, uu, vv = common.cubemap_coords(jnp.asarray(dirs))
    ones = jnp.ones((h, w), bool)
    zero = jnp.zeros((h, w), jnp.int32)
    rough = jnp.asarray(rng.random((h, w), dtype=np.float32))
    ndv = jnp.asarray(rng.random((h, w), dtype=np.float32))
    tex = jnp.stack([env_base + face,
                     jnp.full((h, w), lut_tid, jnp.int32)], -1)
    mip = jnp.stack([zero, zero], -1)
    u = jnp.stack([uu, rough], -1)
    v = jnp.stack([vv, ndv], -1)
    act = jnp.stack([ones, ones], -1)
    fb = (tuple(range(env_base, env_base + 6)), (lut_tid,))
    return tex, mip, u, v, act, fb


def test_env_stage_budget_generous_is_bit_identical():
    """Demand-shaped staging at a generous budget must be bit-equal to the
    worst-case cap-shaped layout (stage_budget=None)."""
    rng = np.random.default_rng(11)
    pack = _build(rng, env_size=16, env_mips=2)
    tex, mip, u, v, act, fb = _budget_inputs(rng, pack)
    kw = dict(fb_tids=fb, cap=(40, 8), block_cap=16, interpret=True)
    full = envcache.sample_env_tiled(pack[0], tex, mip, u, v, act, **kw)
    slim = envcache.sample_env_tiled(pack[0], tex, mip, u, v, act,
                                     stage_budget=64, **kw)
    for a, b in zip(full, slim):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(full[1]).all()  # everything covered at these caps


def test_env_stage_budget_truncation_degrades_to_fallback():
    """A budget below demand truncates trailing groups: their taps resolve
    on the (always staged) directional coarse fallback and count in approx —
    and match an unbudgeted run forced onto the same fallback."""
    rng = np.random.default_rng(13)
    pack = _build(rng, env_size=64, env_mips=2)
    tex, mip, u, v, act, fb = _budget_inputs(rng, pack)
    kw = dict(fb_tids=fb, cap=(40, 8), block_cap=16, interpret=True)
    # min legal budget = SEG_CHUNK per group: only fallback pages staged
    g = tex.shape[-1]
    tiny = envcache.sample_env_tiled(pack[0], tex, mip, u, v, act,
                                     stage_budget=8 * g, **kw)
    rgba, covered, approx = tiny
    cov = np.asarray(covered)
    ap = np.asarray(approx)
    assert ap.any() and (cov | ap)[np.asarray(act)].all()
    # group 0 (6 faces of a 64px env mip) cannot fit 8 pages -> approx taps
    # must equal the coarse-fallback bilinear values: cross-check against a
    # run whose covered mask says the same taps were exact, by re-running
    # with cap so small nothing covers (pure-fallback reference)
    ref = envcache.sample_env_tiled(
        pack[0], tex, mip, u, v, act, fb_tids=fb, cap=(8, 8),
        block_cap=16, interpret=True,
        # a 24x128 tile of random dirs across 6 faces of 64x64 won't fit 8
        # pages; LUT group (8x8=1 page) still covers
    )
    both_ap = ap[..., 0] & np.asarray(ref[2])[..., 0]
    assert both_ap.any()
    np.testing.assert_array_equal(
        np.asarray(rgba)[..., 0, :][both_ap],
        np.asarray(ref[0])[..., 0, :][both_ap],
    )


def test_env_tap_census_and_budget_roundtrip():
    rng = np.random.default_rng(17)
    pack = _build(rng, env_size=16, env_mips=2)
    tex, mip, u, v, act, fb = _budget_inputs(rng, pack)
    census = envcache.tap_census(pack[0], tex, mip, u, v, act, caps=(40, 8))
    assert census["group"]["max"] >= 1
    budget = envcache.recommend_budget([census], headroom=1.0)
    assert budget % envcache.SEG_CHUNK == 0
    # the recommended budget must cover the measured frame exactly
    kw = dict(fb_tids=fb, cap=(40, 8), block_cap=16, interpret=True)
    full = envcache.sample_env_tiled(pack[0], tex, mip, u, v, act, **kw)
    slim = envcache.sample_env_tiled(pack[0], tex, mip, u, v, act,
                                     stage_budget=budget, **kw)
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(slim[1]))
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(slim[0]))
