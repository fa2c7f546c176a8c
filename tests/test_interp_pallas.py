"""Pallas attribute interpolation must match the XLA G-buffer path."""

import numpy as np
import jax.numpy as jnp

from direct12pbrrenderer_tpu.ops import gbuffer, interp_pallas, raster
from test_raster_pallas import _scene


def test_interp_matches_xla_barycentrics():
    w, h, tile_h, tile_w, cap = 256, 192, 24, 128, 128
    clip, tris = _scene(200, seed=3)
    nv = int(tris.max()) + 1
    rng = np.random.default_rng(7)
    vattrs = jnp.asarray(rng.standard_normal((nv, 8)).astype(np.float32))
    mat_rows = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    tri_material = jnp.asarray(rng.integers(0, 4, tris.shape[0], np.int32))

    setup = raster.setup_triangles(clip, tris, jnp.ones(tris.shape[0], bool), w, h)
    bins = raster.bin_triangles(setup, h // tile_h, w // tile_w, tile_h, tile_w, cap)
    tri_id, _ = raster.rasterize(setup, bins, w, h, tile_h, tile_w)

    rows = interp_pallas.pack_interp_rows(setup, vattrs, tris, mat_rows, tri_material)
    planes = np.asarray(
        interp_pallas.interpolate_pallas(
            tri_id, rows, bins, w, h, tile_h, tile_w, interpret=True
        )
    )

    # XLA reference: packed-row gather + _bary interpolation
    mask = np.asarray(tri_id) >= 0
    tid = jnp.maximum(tri_id, 0)
    py, px = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32) + 0.5,
        jnp.arange(w, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    row32 = jnp.concatenate(
        [raster.pack_pixel_data(setup), mat_rows[tri_material]], axis=1
    )[tid]
    _, lam_p, _ = gbuffer._bary(row32, px, py)
    attrs_ref = np.asarray((vattrs[tris[tid]] * lam_p[..., None]).sum(-2))
    mats_ref = np.asarray(row32[..., 16:32])

    for k in range(8):
        got = planes[k][mask]
        want = attrs_ref[..., k][mask]
        np.testing.assert_allclose(got, want, atol=2e-3)
    for m in range(16):
        got = planes[8 + m][mask]
        want = mats_ref[..., m][mask]
        np.testing.assert_allclose(got, want, atol=1e-5)
    # background zero
    assert np.abs(planes[:, ~mask]).max() == 0.0
