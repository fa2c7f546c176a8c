"""Pallas raster kernel must match the XLA rasterizer exactly (interpret mode
on CPU; the TPU path is exercised by bench/app runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from direct12pbrrenderer_tpu.ops import raster, raster_pallas


def _scene(n=300, seed=0):
    rng = np.random.default_rng(seed)
    # random small triangles across ndc, CW-in-screen enforced by validity
    c = rng.uniform(-1, 1, (n, 1, 3)).astype(np.float32)
    d = rng.uniform(-0.2, 0.2, (n, 2, 3)).astype(np.float32)
    v = np.concatenate([c, c + d], axis=1)  # (n, 3, 3)
    v[..., 2] = rng.uniform(0.05, 0.95, (n, 3))
    verts = v.reshape(-1, 3)
    w = np.ones((len(verts), 1), np.float32)
    clip = np.concatenate([verts * w, w], axis=1).astype(np.float32)
    tris = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    return jnp.asarray(clip), jnp.asarray(tris)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    w, h, tile_h, tile_w, cap = 256, 192, 24, 128, 128
    clip, tris = _scene(300, seed)
    setup = raster.setup_triangles(clip, tris, jnp.ones(tris.shape[0], bool), w, h)
    bins = raster.bin_triangles(setup, h // tile_h, w // tile_w, tile_h, tile_w, cap)
    ids_ref, z_ref = raster.rasterize(setup, bins, w, h, tile_h, tile_w)
    ids_pl, z_pl = raster_pallas.rasterize_pallas(
        setup, bins, w, h, tile_h, tile_w, interpret=True
    )
    ids_pl, ids_ref = np.asarray(ids_pl), np.asarray(ids_ref)
    # FMA re-association can flip the winner where two triangles cross at
    # (numerically) identical depth; everything else must agree exactly
    mismatch = ids_pl != ids_ref
    assert mismatch.mean() < 1e-4, f"{mismatch.sum()} id mismatches"
    agree = ~mismatch
    np.testing.assert_allclose(
        np.asarray(z_pl)[agree], np.asarray(z_ref)[agree], atol=1e-4
    )


def test_pallas_dynamic_count_correct():
    """Bins mostly empty: the dynamic trip count must not skip real work."""
    w, h, tile_h, tile_w, cap = 256, 192, 24, 128, 256
    clip, tris = _scene(5)
    setup = raster.setup_triangles(clip, tris, jnp.ones(tris.shape[0], bool), w, h)
    bins = raster.bin_triangles(setup, h // tile_h, w // tile_w, tile_h, tile_w, cap)
    ids_ref, _ = raster.rasterize(setup, bins, w, h, tile_h, tile_w)
    ids_pl, _ = raster_pallas.rasterize_pallas(
        setup, bins, w, h, tile_h, tile_w, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ids_pl), np.asarray(ids_ref))
    assert (np.asarray(ids_pl) >= 0).sum() > 0


def _rows64(setup, n_tris, seed=0):
    """Synthetic material + vertex-attr rows for the fused-interp kernel."""
    rng = np.random.default_rng(seed + 100)
    t = setup.edges.shape[0]
    mat = jnp.asarray(rng.uniform(0, 1, (t, 16)).astype(np.float32))
    vat = jnp.asarray(rng.uniform(-1, 1, (t, 24)).astype(np.float32))
    # cols 56/57: aabb y-extents for the kernel's per-band chunk reject
    # (same packing as stages.pack_rows64)
    ymin = jnp.where(setup.valid, setup.aabb[:, 1], 3e38)
    ymax = jnp.where(setup.valid, setup.aabb[:, 3], -3e38)
    return jnp.concatenate(
        [raster_pallas.pack_raster_rows(setup), mat, vat,
         ymin[:, None], ymax[:, None],
         jnp.zeros((t, 6), jnp.float32)], axis=1)


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_interp_matches_gather_path(seed):
    """rasterize_interp_pallas planes must equal the tri_rows[tid] gather +
    gbuffer._bary interpolation exactly (where winner ids agree)."""
    from direct12pbrrenderer_tpu.ops import gbuffer

    w, h, tile_h, tile_w, cap = 256, 192, 24, 128, 128
    clip, tris = _scene(300, seed)
    setup = raster.setup_triangles(clip, tris, jnp.ones(tris.shape[0], bool), w, h)
    bins = raster.bin_triangles(setup, h // tile_h, w // tile_w, tile_h, tile_w, cap)
    rows64 = _rows64(setup, tris.shape[0], seed)

    ids_ref, z_ref = raster.rasterize(setup, bins, w, h, tile_h, tile_w)
    # reference interpolation: the row-gather path from gbuffer_shade
    tid = jnp.maximum(ids_ref, 0)
    py, px = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) + 0.5,
                          jnp.arange(w, dtype=jnp.float32) + 0.5, indexing="ij")
    row = rows64[tid]
    _, lam_p, _ = gbuffer._bary(row, px, py)
    attrs = row[..., 32:56].reshape(*row.shape[:-1], 3, 8)
    interp_ref = (attrs * lam_p[..., None]).sum(-2)
    mat_ref = row[..., 16:32]

    ids_pl, z_pl, planes = raster_pallas.rasterize_interp_pallas(
        setup, bins, rows64, w, h, tile_h, tile_w, interpret=True
    )
    mismatch = np.asarray(ids_pl) != np.asarray(ids_ref)
    assert mismatch.mean() < 1e-4, f"{mismatch.sum()} id mismatches"
    agree = ~mismatch & (np.asarray(ids_ref) >= 0)
    assert agree.sum() > 0
    interp_pl = np.moveaxis(np.asarray(planes[0:8]), 0, -1)
    mat_pl = np.moveaxis(np.asarray(planes[8:24]), 0, -1)
    # interp: FMA re-association only (same formula, different contraction)
    np.testing.assert_allclose(
        interp_pl[agree], np.asarray(interp_ref)[agree], rtol=1e-3, atol=1e-4
    )
    # material row: an exact one-hot select — bit-equal
    np.testing.assert_array_equal(mat_pl[agree], np.asarray(mat_ref)[agree])
    # background pixels carry zero planes (the planar path's convention)
    bg = np.asarray(ids_pl) < 0
    if bg.any():
        assert (interp_pl[bg] == 0).all() and (mat_pl[bg] == 0).all()
    np.testing.assert_allclose(
        np.asarray(z_pl)[agree], np.asarray(z_ref)[agree], atol=1e-4
    )


def test_fused_interp_two_pass_hot_tiles():
    """The hot-tile second pass must alias/overwrite planes consistently."""
    w, h, tile_h, tile_w, cap = 256, 192, 24, 128, 512
    clip, tris = _scene(2500, 3)
    setup = raster.setup_triangles(clip, tris, jnp.ones(tris.shape[0], bool), w, h)
    bins = raster.bin_triangles(setup, h // tile_h, w // tile_w, tile_h, tile_w, cap)
    rows64 = _rows64(setup, tris.shape[0], 3)
    counts = np.asarray(bins.counts)
    n_over = int((counts > 128).sum())
    assert n_over > 0
    ids_ref, _, planes_ref = raster_pallas.rasterize_interp_pallas(
        setup, bins, rows64, w, h, tile_h, tile_w, interpret=True,
        cap_small=512, hot_k=0,
    )
    ids_pl, _, planes = raster_pallas.rasterize_interp_pallas(
        setup, bins, rows64, w, h, tile_h, tile_w, interpret=True,
        cap_small=128, hot_k=max(n_over, 2),
    )
    mismatch = np.asarray(ids_pl) != np.asarray(ids_ref)
    assert mismatch.mean() < 1e-4
    agree = ~mismatch
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(planes), 0, -1)[agree],
        np.moveaxis(np.asarray(planes_ref), 0, -1)[agree],
    )


def test_two_pass_hot_tiles_match_xla():
    """cap > cap_small triggers the hot-tile second pass: hot tiles render
    full lists, scattered over the small-cap buffers; when every overfull
    tile fits the hot set, the result equals the XLA rasterizer."""
    w, h, tile_h, tile_w, cap = 256, 192, 24, 128, 512
    clip, tris = _scene(2500, 3)
    setup = raster.setup_triangles(clip, tris, jnp.ones(tris.shape[0], bool), w, h)
    bins = raster.bin_triangles(setup, h // tile_h, w // tile_w, tile_h, tile_w, cap)
    counts = np.asarray(bins.counts)
    # force the two-pass split: tiny small-cap, hot set covering all
    # overfull tiles (random 300-tri scenes give every tile >128 entries)
    n_over = int((counts > 128).sum())
    assert n_over > 0
    ids_ref, z_ref = raster.rasterize(setup, bins, w, h, tile_h, tile_w)
    ids_pl, z_pl = raster_pallas.rasterize_pallas(
        setup, bins, w, h, tile_h, tile_w, interpret=True,
        cap_small=128, hot_k=max(n_over, 2),
    )
    mismatch = np.asarray(ids_pl) != np.asarray(ids_ref)
    assert mismatch.mean() < 1e-4, f"{mismatch.sum()} id mismatches"

    # with a hot set too small, the missed overfull tiles render truncated
    # lists -> detectable differences (the overflow-surfacing contract)
    if n_over > 1:
        ids_tr, _ = raster_pallas.rasterize_pallas(
            setup, bins, w, h, tile_h, tile_w, interpret=True,
            cap_small=128, hot_k=1,
        )
        assert (np.asarray(ids_tr) != np.asarray(ids_ref)).any()
