"""Attribution benchmark for the texture-cache path on the real scene.

Times, at the bench resolution with real per-pixel uv/lod/tex planes:
the XLA sampler (old path), the full kernel path, and its pieces
(plan, staging gather, Pallas kernel, sidecar) — each as its own jit with
forced readback, reporting the delta over the measured call floor.

Run: python -m direct12pbrrenderer_tpu.tools.bench_texcache [--width ...]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gbuffer, raster, texcache
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--asset-root", default="/root/reference/DeferredRendering")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from ..app.app import App, AppConfig

    app = App(AppConfig(
        asset_root=args.asset_root, width=args.width, height=args.height,
        tile_h=24, tile_w=128, bin_cap=2048,
    ))
    pipe, camera = app.pipeline, app.camera
    w, h = args.width, args.height
    p = pipe.packed
    buffers = pipe.buffers
    planes = camera.frustum_planes()
    view = camera.view_matrix()
    normal_mats = jnp.asarray(np.ascontiguousarray(
        np.transpose(p.inv_model_mats[:, :3, :3], (0, 2, 1))))
    model_mats = jnp.asarray(p.model_mats)
    visible = jnp.asarray(p.instance_visibility(planes))
    view_proj = jnp.asarray(camera.projection_matrix() @ view)

    floor_ms = timeit(lambda x: x * 1.0000001, jnp.ones((8, 128)),
                      iters=args.iters)
    print(f"call floor: {floor_ms:.1f} ms (subtract from everything below)")

    setup, vattrs = jax.jit(functools.partial(stages.geometry, width=w, height=h))(
        buffers, model_mats, normal_mats, visible, view_proj)
    bins = jax.jit(lambda s: stages.binning(s, w, h, 24, 128, 2048))(setup)
    tri_id, depth = jax.jit(lambda s, b: stages.rasterize(
        s, b, w, h, 24, 128, pipe.use_pallas))(setup, bins)

    # per-pixel sampler inputs, exactly as _shade_from_interp builds them
    def sampler_inputs(tri_id, depth, setup_rows, tris, vattrs):
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
        vidx = tris[tid]
        attrs = vattrs[vidx]
        interp = (attrs * lam_p[..., None]).sum(-2)
        interp = jnp.where(mask[..., None], interp, 0.0)
        matrow = row[..., 16:32]
        uv = interp[..., 0:2]
        use = matrow[..., 6:11] > 0.5
        tex = jnp.maximum(matrow[..., 11:16].astype(jnp.int32), 0)
        ddx, ddy = gbuffer._quad_derivatives(uv)
        atlas = buffers["atlas"]
        size5 = atlas.base_size[tex].astype(jnp.float32)
        gx = ddx[..., None, :] * size5
        gy = ddy[..., None, :] * size5
        rho2 = jnp.maximum((gx * gx).sum(-1), (gy * gy).sum(-1))
        lod5 = 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))
        lod5 = jnp.where(mask[..., None], lod5, 99.0)
        return uv[..., 0], uv[..., 1], tex, lod5, use & mask[..., None]

    u, v, tex, lod5, active = jax.jit(sampler_inputs)(
        tri_id, depth, setup, buffers["tris"], vattrs)
    u, v, tex, lod5, active = jax.device_put((u, v, tex, lod5, active))
    atlas = buffers["atlas"]
    cov_pct = None

    def report(name, ms, extra=""):
        print(f"{name:<28} {ms - floor_ms:9.1f} ms  {extra}")

    # 0. old XLA path
    ms = timeit(lambda at, *a: gbuffer.sample_atlas_trilinear(
        at, a[0], a[1][..., None], a[2][..., None], a[3]),
        atlas, tex, u, v, lod5, iters=args.iters)
    report("xla sampler (old path)", ms)

    # 1. full kernel path
    ms = timeit(lambda at, *a: texcache.sample_atlas_textured(at, *a),
                atlas, tex, u, v, lod5, active, iters=args.iters)
    report("kernel+sidecar (new path)", ms)

    # 2. kernel path alone
    ms = timeit(lambda at, *a: texcache.sample_atlas_tiled(at, *a)[0],
                atlas, tex, u, v, lod5, active, iters=args.iters)
    report("sample_atlas_tiled", ms)

    # coverage
    _, covered = jax.jit(texcache.sample_atlas_tiled)(
        atlas, tex, u, v, lod5, active)
    cov = np.asarray(covered)
    act = np.asarray(active)
    cov_pct = cov[act].mean()
    print(f"  coverage among active taps: {cov_pct:.4f} "
          f"(active: {act.mean():.3f})")

    # 3. sidecar with this coverage
    def sidecar(at, tex, covered, active, u, v, lod):
        pin = covered | ~active
        u5 = jnp.where(pin, 0.0, u[..., None])
        v5 = jnp.where(pin, 0.0, v[..., None])
        lod5p = jnp.where(pin, 99.0, lod)
        return gbuffer.sample_atlas_raw(at, tex, u5, v5, lod5p)

    ms = timeit(sidecar, atlas, tex, covered, active, u, v, lod5,
                iters=args.iters)
    report("sidecar (pinned xla)", ms)

    # 4. plan only (everything before the pallas_call + staging)
    tile = texcache.pick_tile(h, w)

    def plan_only(at, tex, u, v, lod, active):
        return _plan_pieces(at, tex, u, v, lod, active, stage=False)

    def _plan_pieces(atlas, tex, u, v, lod, active, stage):
        th, tw = tile
        blocks = -(-(th * tw) // 128)
        blocks += (-blocks) % 8
        u5 = jnp.broadcast_to(u[..., None], tex.shape)
        v5 = jnp.broadcast_to(v[..., None], tex.shape)
        n_mips_t = atlas.n_mips[tex]
        lodc = jnp.clip(lod, 0.0, (n_mips_t - 1).astype(jnp.float32))
        m_lo = jnp.floor(lodc).astype(jnp.int32)
        mips = [m_lo, jnp.minimum(m_lo + 1, n_mips_t - 1)]
        taps = [texcache._tap_addresses(atlas, tex, m, u5, v5) for m in mips]
        tile_g = lambda x: texcache._tile(jnp.moveaxis(x, -1, 0), th, tw, blocks)
        act_t = tile_g(active)
        outs = []
        for (page, intra, fx, fy), cap in zip(taps, (48, 16)):
            pg_t = tile_g(page)
            page_list, slot, found = texcache._cover_and_match(pg_t, act_t, cap)
            rec = jnp.where(found, slot * 128 + tile_g(intra), 0)
            outs.append((page_list, rec, tile_g(fx), tile_g(fy), found))
        if not stage:
            return [o[0] for o in outs] + [o[1] for o in outs]
        ids = jnp.concatenate(
            [outs[0][0].reshape(-1, 240), outs[1][0].reshape(-1, 80)], axis=1)
        n_pages = atlas.data.shape[0] // 128
        pages_view = atlas.data.reshape(n_pages, 128, 4)
        staged = jnp.take(pages_view, ids.reshape(-1), axis=0)
        return staged

    ms = timeit(plan_only, atlas, tex, u, v, lod5, active, iters=args.iters)
    report("plan (addr+cover+match)", ms)

    # 5. plan + staging gather
    ms = timeit(lambda at, *a: _plan_pieces(at, *a, stage=True),
                atlas, tex, u, v, lod5, active, iters=args.iters)
    report("plan + staging gather", ms)


if __name__ == "__main__":
    main()
