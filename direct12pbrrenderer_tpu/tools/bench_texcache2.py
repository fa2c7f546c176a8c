"""Plan-stage attribution + coverage-vs-cap for the texture cache.

Answers, on the real scene at bench resolution:
1. where the plan's ~420 ms goes (tap addressing / tiling / cover scan /
   match) — and whether one-hot MXU lookups beat XLA small-table gathers;
2. what page-cover capacity buys in coverage (the path to dropping the
   full-resolution XLA sidecar, which costs ~900 ms no matter how pinned).
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import texcache
from ..pipeline import stages


def timeit(fn, *args, iters=5, warmup=2):
    jfn = jax.jit(
        lambda *a: jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), 0.0
        )
    )
    for _ in range(warmup):
        float(jfn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def onehot_lookup(table, key, n):
    """table (n, k) f32, key (...,) int32 -> (..., k) via MXU one-hot."""
    oh = (key[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(jnp.bfloat16)
    flat = oh.reshape(-1, n)
    out = jnp.dot(flat, table.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return out.reshape(*key.shape, table.shape[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--asset-root", default="/root/reference/DeferredRendering")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from ..app.app import App, AppConfig
    from ..ops import gbuffer, raster

    app = App(AppConfig(
        asset_root=args.asset_root, width=args.width, height=args.height,
        tile_h=24, tile_w=128, bin_cap=2048,
    ))
    pipe, camera = app.pipeline, app.camera
    w, h = args.width, args.height
    p = pipe.packed
    buffers = pipe.buffers
    planes_np = camera.frustum_planes()
    view = camera.view_matrix()
    normal_mats = jnp.asarray(np.ascontiguousarray(
        np.transpose(p.inv_model_mats[:, :3, :3], (0, 2, 1))))
    setup, vattrs = jax.jit(functools.partial(stages.geometry, width=w, height=h))(
        buffers, jnp.asarray(p.model_mats), normal_mats,
        jnp.asarray(p.instance_visibility(planes_np)),
        jnp.asarray(camera.projection_matrix() @ view))
    bins = jax.jit(lambda s: stages.binning(s, w, h, 24, 128, 2048))(setup)
    tri_id, depth = jax.jit(lambda s, b: stages.rasterize(
        s, b, w, h, 24, 128, pipe.use_pallas))(setup, bins)

    def sampler_inputs(tri_id, setup, tris, vattrs):
        tri_rows = jnp.concatenate(
            [raster.pack_pixel_data(setup),
             buffers["mat_rows"][buffers["tri_material"]]], axis=1)
        mask = tri_id >= 0
        tid = jnp.maximum(tri_id, 0)
        py, px = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32) + 0.5,
            jnp.arange(w, dtype=jnp.float32) + 0.5, indexing="ij")
        row = tri_rows[tid]
        _, lam_p, _ = gbuffer._bary(row, px, py)
        attrs = vattrs[tris[tid]]
        interp = (attrs * lam_p[..., None]).sum(-2)
        interp = jnp.where(mask[..., None], interp, 0.0)
        matrow = row[..., 16:32]
        uv = interp[..., 0:2]
        use = matrow[..., 6:11] > 0.5
        tex = jnp.maximum(matrow[..., 11:16].astype(jnp.int32), 0)
        ddx, ddy = gbuffer._quad_derivatives(uv)
        atlas = buffers["atlas"]
        size5 = atlas.base_size[tex].astype(jnp.float32)
        rho2 = jnp.maximum(((ddx[..., None, :] * size5) ** 2).sum(-1),
                           ((ddy[..., None, :] * size5) ** 2).sum(-1))
        lod5 = 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))
        lod5 = jnp.where(mask[..., None], lod5, 99.0)
        return uv[..., 0], uv[..., 1], tex, lod5, use & mask[..., None]

    u, v, tex, lod5, active = jax.device_put(jax.jit(sampler_inputs)(
        tri_id, setup, buffers["tris"], vattrs))
    atlas = buffers["atlas"]
    floor_ms = timeit(lambda x: x * 1.0000001, jnp.ones((8, 128)),
                      iters=args.iters)
    print(f"call floor: {floor_ms:.1f} ms")

    def report(name, ms, extra=""):
        print(f"{name:<36} {ms - floor_ms:9.1f} ms  {extra}")

    # --- plan sub-attribution -------------------------------------------
    def taps_only(at, tex, u, v, lod):
        u5 = jnp.broadcast_to(u[..., None], tex.shape)
        v5 = jnp.broadcast_to(v[..., None], tex.shape)
        n_mips_t = at.n_mips[tex]
        lodc = jnp.clip(lod, 0.0, (n_mips_t - 1).astype(jnp.float32))
        m_lo = jnp.floor(lodc).astype(jnp.int32)
        return [texcache._tap_addresses(at, tex, m, u5, v5)
                for m in (m_lo, jnp.minimum(m_lo + 1, n_mips_t - 1))]

    report("tap addressing (gather tables)",
           timeit(taps_only, atlas, tex, u, v, lod5, iters=args.iters))

    # one-hot variant: fuse (n_mips, base_w, base_h, page_base[mip]) into one
    # (T*13, 4) table keyed by tex*13+mip
    T = atlas.n_mips.shape[0]
    fused = jnp.concatenate(
        [
            jnp.broadcast_to(atlas.n_mips[:, None, None], (T, 13, 1)),
            jnp.broadcast_to(atlas.base_size[:, None, :], (T, 13, 2)),
            atlas.page_base[:, :13, None],
        ],
        axis=-1,
    ).reshape(T * 13, 4).astype(jnp.float32)

    def taps_onehot(fused, tex, u, v, lod):
        u5 = jnp.broadcast_to(u[..., None], tex.shape)
        v5 = jnp.broadcast_to(v[..., None], tex.shape)
        row0 = onehot_lookup(fused, tex * 13, T * 13)
        n_mips_t = row0[..., 0].astype(jnp.int32)
        lodc = jnp.clip(lod, 0.0, (n_mips_t - 1).astype(jnp.float32))
        m_lo = jnp.floor(lodc).astype(jnp.int32)
        outs = []
        for m in (m_lo, jnp.minimum(m_lo + 1, n_mips_t - 1)):
            row = onehot_lookup(fused, tex * 13 + m, T * 13)
            bw = row[..., 1].astype(jnp.int32)
            bh = row[..., 2].astype(jnp.int32)
            pb = row[..., 3].astype(jnp.int32)
            w_m = jnp.maximum(bw >> m, 1)
            h_m = jnp.maximum(bh >> m, 1)
            x = u5 * w_m - 0.5
            y = v5 * h_m - 0.5
            x0f = jnp.floor(x)
            y0f = jnp.floor(y)
            fx = x - x0f
            fy = y - y0f
            x0 = jnp.mod(x0f.astype(jnp.int32), w_m)
            y0 = jnp.mod(y0f.astype(jnp.int32), h_m)
            pages_x = (w_m + 15) >> 4
            page = pb + (y0 >> 3) * pages_x + (x0 >> 4)
            intra = (y0 & 7) * 16 + (x0 & 15)
            outs.append((page, intra, fx, fy))
        return outs

    report("tap addressing (one-hot MXU)",
           timeit(taps_onehot, fused, tex, u, v, lod5, iters=args.iters))

    taps = jax.jit(taps_only)(atlas, tex, u, v, lod5)
    tile_g = lambda x: texcache._tile(jnp.moveaxis(x, -1, 0), 24, 128, 24)

    def tiling_only(taps, active):
        return [tile_g(t[0]) for t in taps] + [tile_g(active)]

    report("tiling/relayout", timeit(tiling_only, taps, active,
                                     iters=args.iters))

    pg_lo, act_t = jax.jit(lambda t, a: (tile_g(t[0][0]), tile_g(a)))(
        taps, active)

    def cover_only(pg, act):
        return texcache._cover_and_match(pg, act, 48)[0]

    report("cover scan+match (cap 48, lo only)",
           timeit(cover_only, pg_lo, act_t, iters=args.iters))

    # --- coverage vs cap -------------------------------------------------
    pg_hi = jax.jit(lambda t: tile_g(t[1][0]))(taps)
    for cap_lo, cap_hi in ((48, 16), (64, 16), (96, 32), (128, 32)):
        _, _, f_lo = jax.jit(functools.partial(
            texcache._cover_and_match, cap=cap_lo))(pg_lo, act_t)
        _, _, f_hi = jax.jit(functools.partial(
            texcache._cover_and_match, cap=cap_hi))(pg_hi, act_t)
        cov = np.asarray(f_lo & f_hi)
        act = np.asarray(act_t)
        miss = int((~cov & act).sum())
        print(f"caps ({cap_lo:3d},{cap_hi:2d}): coverage "
              f"{cov[act].mean():.5f}  missing taps {miss}")

    # distinct-page histogram (exact need per group)
    pg = np.asarray(pg_lo)
    an = np.asarray(act_t)
    counts = []
    for t in range(0, pg.shape[0], 7):
        for g in range(5):
            ids = pg[t, g][an[t, g]]
            counts.append(len(np.unique(ids)))
    c = np.asarray(counts)
    print("distinct lo-pages/group: p50 %d p90 %d p99 %d max %d"
          % tuple(np.percentile(c, [50, 90, 99]).astype(int).tolist()
                  + [c.max()]))


if __name__ == "__main__":
    main()
