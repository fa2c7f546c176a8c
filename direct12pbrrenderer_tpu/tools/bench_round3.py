"""Round-3 incision bench: sub-stage timings inside the hot frame.

The per-pass harness (tools/profile.py) attributes ~20 ms of overhead to each
stage, too coarse to steer kernel work. This bench times the *pieces* of the
expensive stages (binning levels, raster pre-gather vs kernel, texcache
plan/stage/kernel, deferred env/lights, post) on the real reference scene,
with the same forced-scalar-readback discipline.

Usage: python -m direct12pbrrenderer_tpu.tools.bench_round3 [--width ...]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from .profile import time_stage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--asset-root", default="/root/reference/DeferredRendering")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bin-cap", type=int, default=2048)
    ap.add_argument("--tile", type=int, nargs=2, default=(24, 128))
    ap.add_argument("--only", default=None,
                    help="comma list: binning,raster,gbuffer,deferred,post")
    args = ap.parse_args()
    sel = set(args.only.split(",")) if args.only else None

    from ..app.app import App, AppConfig
    from ..ops import bloom as bloom_ops
    from ..ops import gbuffer as gbuffer_ops
    from ..ops import postprocess, raster, raster_pallas, texcache
    from ..pipeline import stages

    app = App(AppConfig(
        asset_root=args.asset_root, width=args.width, height=args.height,
        tile_h=args.tile[0], tile_w=args.tile[1], bin_cap=args.bin_cap,
    ))
    pipe, camera = app.pipeline, app.camera
    cfg = pipe.config
    w, h = cfg.width, cfg.height
    p = pipe.packed
    buffers = pipe.buffers
    planes_f = camera.frustum_planes()
    model_mats = jnp.asarray(p.model_mats)
    normal_mats = jnp.asarray(np.ascontiguousarray(
        np.transpose(p.inv_model_mats[:, :3, :3], (0, 2, 1))))
    visible = jnp.asarray(p.instance_visibility(planes_f))
    light_valid = jnp.asarray(p.visible_lights(planes_f))
    view = camera.view_matrix()
    view_j = jnp.asarray(view)
    inv_view = jnp.asarray(camera.world_matrix())
    view_proj = jnp.asarray(camera.projection_matrix() @ view)
    cam_pos = jnp.asarray(camera.position)

    t = {}

    def run(name, fn, *a):
        t[name] = time_stage(fn, a, args.iters)
        print(f"  {name:<28} {t[name]:8.2f} ms", flush=True)
        return jax.jit(fn)(*a)

    geo = lambda b, m, n, v, vp: stages.geometry(b, m, n, v, vp, w, h)
    setup, vattrs = jax.jit(geo)(buffers, model_mats, normal_mats, visible,
                                 view_proj)
    binf = lambda s: stages.binning(s, w, h, pipe.tile_h, pipe.tile_w,
                                    pipe.bin_cap)
    bins = jax.jit(binf)(setup)

    # ---------------- binning pieces ----------------
    if sel is None or "binning" in sel:
        print("binning:")
        run("bin_total", binf, setup)
        tiles_y, tiles_x = h // pipe.tile_h, w // pipe.tile_w
        tcount = setup.aabb.shape[0]
        cap1 = min(tcount, 8 * pipe.bin_cap)

        def coarse(s):
            sy, sx = -(-tiles_y // 8), -(-tiles_x // 4)
            xmin, ymin, xmax, ymax = (s.aabb[:, i] for i in range(4))
            sx0 = (jnp.arange(sx) * (4 * pipe.tile_w)).astype(jnp.float32)
            sy0 = (jnp.arange(sy) * (8 * pipe.tile_h)).astype(jnp.float32)
            ov_x1 = (xmin[None] < (sx0 + 4 * pipe.tile_w)[:, None]) & (
                xmax[None] > sx0[:, None])
            ov_y1 = (ymin[None] < (sy0 + 8 * pipe.tile_h)[:, None]) & (
                ymax[None] > sy0[:, None])
            ov1 = (ov_y1[:, None] & ov_x1[None] & s.valid[None, None]
                   ).reshape(sy * sx, tcount)
            score1 = jnp.where(
                ov1, tcount - jnp.arange(tcount, dtype=jnp.int32)[None], 0)
            top1, _ = jax.lax.top_k(score1, cap1)
            return top1

        top1 = run("bin_coarse(ov+topk)", coarse, setup)

        def fine_topk(score):
            top2, _ = jax.lax.top_k(score, pipe.bin_cap)
            return top2

        num_tiles = tiles_y * tiles_x
        fake_score = jnp.tile(top1[:1, :], (num_tiles, 1))
        run("fine_topk_only", fine_topk, fake_score)

    # ---------------- raster pieces ----------------
    rows64 = jax.jit(lambda s, b, va: stages.pack_rows64(s, b, va))(
        setup, buffers, vattrs)
    if sel is None or "raster" in sel:
        print("raster:")
        run("pack_rows64", lambda s, b, va: stages.pack_rows64(s, b, va),
            setup, buffers, vattrs)
        cap = bins.ids.shape[1]
        num_tiles = (h // pipe.tile_h) * (w // pipe.tile_w)
        cap_small, hot_k = raster_pallas.split_caps(cap, num_tiles)

        def pregather(r64, ids):
            pad_row = (jnp.zeros((64,), jnp.float32).at[2].set(-3e38)
                       .at[15].set(-1.0))
            g = r64[jnp.maximum(ids, 0)]
            g = jnp.where((ids >= 0)[..., None], g, pad_row)
            return g.transpose(0, 2, 1)

        run("raster_pregather_small", pregather, rows64,
            bins.ids[:, :cap_small])
        hot_idx = jax.lax.top_k(bins.counts, hot_k)[1].astype(jnp.int32)
        run("raster_pregather_hot", pregather, rows64, bins.ids[hot_idx])

        rastf = lambda s, b, r: raster_pallas.rasterize_interp_pallas(
            s, b, r, w, h, pipe.tile_h, pipe.tile_w)
        run("raster_interp_total", rastf, setup, bins, rows64)
        rast1 = lambda s, b, r: raster_pallas.rasterize_interp_pallas(
            s, b, r, w, h, pipe.tile_h, pipe.tile_w, hot_k=0,
            cap_small=cap)
        run("raster_interp_1pass_fullcap", rast1, setup, bins, rows64)
        rast_plain = lambda s, b: raster_pallas.rasterize_pallas(
            s, b, w, h, pipe.tile_h, pipe.tile_w)
        run("raster_plain(no interp)", rast_plain, setup, bins)

    tri_id, depth, planes = jax.jit(
        lambda s, b, r: raster_pallas.rasterize_interp_pallas(
            s, b, r, w, h, pipe.tile_h, pipe.tile_w))(setup, bins, rows64)

    # ---------------- gbuffer/texcache pieces ----------------
    if sel is None or "gbuffer" in sel:
        print("gbuffer:")
        gbf = lambda t_, d, pl_, b: gbuffer_ops.gbuffer_shade_planar(
            t_, d, pl_, b["atlas"], pipe.texture_filter,
            use_tex_kernel=pipe.use_tex_kernel)
        run("gbuffer_total", gbf, tri_id, depth, planes, buffers)

        # inputs the texcache sees
        atlas = buffers["atlas"]
        interp = jnp.moveaxis(planes[0:8], 0, -1)
        matrow = jnp.moveaxis(planes[8:24], 0, -1)
        mask = tri_id >= 0
        interp = jnp.where(mask[..., None], interp, 0.0)
        uv = interp[..., 0:2]
        use = matrow[..., 6:11] > 0.5
        tex = jnp.maximum(matrow[..., 11:16].astype(jnp.int32), 0)
        ddx, ddy = gbuffer_ops._quad_derivatives(uv)
        size5 = texcache.onehot_lookup(atlas.base_size.astype(jnp.float32), tex)
        gx = ddx[..., None, :] * size5
        gy = ddy[..., None, :] * size5
        rho2 = jnp.maximum((gx * gx).sum(-1), (gy * gy).sum(-1))
        lod5 = 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))
        lod5 = jnp.where(mask[..., None], lod5, 99.0)
        active = use & mask[..., None]
        uv0, uv1 = uv[..., 0], uv[..., 1]

        run("tex_onehot_size5",
            lambda a, tx: texcache.onehot_lookup(
                a.base_size.astype(jnp.float32), tx), atlas, tex)
        run("tex_sample_total",
            lambda a, tx, u_, v_, l_, ac: texcache.sample_atlas_textured(
                a, tx, u_, v_, l_, ac, filter=pipe.texture_filter),
            atlas, tex, uv0, uv1, lod5, active)

        th, tw = texcache.pick_tile(h, w)
        blocks = -(-(th * tw) // 128)
        blocks += (-blocks) % 8

        table = texcache.fused_tex_table(atlas)

        def plan_only(a, tx, u_, v_, l_, ac):
            u5 = jnp.broadcast_to(u_[..., None], tx.shape)
            v5 = jnp.broadcast_to(v_[..., None], tx.shape)
            row0 = texcache.onehot_lookup(table, tx)
            n_mips_t = row0[..., 0].astype(jnp.int32)
            base_w = row0[..., 1].astype(jnp.int32)
            base_h = row0[..., 2].astype(jnp.int32)
            pb = row0[..., 4:]
            l_ = jnp.clip(l_, 0.0, (n_mips_t - 1).astype(jnp.float32))
            m_lo = jnp.floor(l_).astype(jnp.int32)
            act_t = texcache._tile(jnp.moveaxis(ac, -1, 0), th, tw, blocks)
            page, intra, fx, fy = texcache._tap_addresses(
                base_w, base_h, texcache.select_mip(pb, m_lo), m_lo, u5, v5)
            return texcache._cover_and_match(
                texcache._tile(jnp.moveaxis(page, -1, 0), th, tw, blocks),
                act_t, 92, block_cap=16, kernel=True)

        pl_, cnt_, slot_, found_ = run("tex_plan_1half", plan_only,
                                       atlas, tex, uv0, uv1, lod5, active)

        def staging(a, ids):
            n_pages = a.data.shape[0] // 128
            pages_view = a.data.reshape(n_pages, 128, 4)
            staged = jnp.take(pages_view, ids.reshape(-1), axis=0)
            n_tiles = ids.shape[0]
            return staged.reshape(n_tiles, -1, 128, 4).transpose(0, 1, 3, 2)

        run("tex_staging_gather", staging, atlas,
            pl_.reshape(pl_.shape[0], -1))

    # ---------------- deferred pieces ----------------
    gb = jax.jit(lambda t_, d, pl_, b: gbuffer_ops.gbuffer_shade_planar(
        t_, d, pl_, b["atlas"], pipe.texture_filter,
        use_tex_kernel=pipe.use_tex_kernel))(tri_id, depth, planes, buffers)
    active_l = jax.jit(lambda b, lv, v: stages.active_lights(
        b, lv, v, pipe.max_active_lights))(buffers, light_valid, view_j)
    if sel is None or "deferred" in sel:
        print("deferred:")
        defsh = lambda g, b, a, iv, cp: stages.deferred_shade(
            g, b, a, iv, cp, cfg, w, h, env_ids=pipe.env_ids,
            env_tile=pipe.env_tile if pipe.env_ids is not None else None)
        run("deferred_total", defsh, gb, buffers, active_l, inv_view, cam_pos)
        defsh_noenv = lambda g, b, a, iv, cp: stages.deferred_shade(
            g, b, a, iv, cp, cfg, w, h, env_ids=None, env_tile=None)
        run("deferred_no_envkernel", defsh_noenv, gb, buffers, active_l,
            inv_view, cam_pos)

        def zero_lights(g, b, iv, cp):
            za = jnp.zeros_like(active_l)
            return stages.deferred_shade(
                g, b, za, iv, cp, cfg, w, h, env_ids=pipe.env_ids,
                env_tile=pipe.env_tile if pipe.env_ids is not None else None)

        run("deferred_0_lights", zero_lights, gb, buffers, inv_view, cam_pos)

    # ---------------- post pieces ----------------
    rt = jax.jit(lambda g, b, a, iv, cp: stages.deferred_shade(
        g, b, a, iv, cp, cfg, w, h, env_ids=pipe.env_ids,
        env_tile=pipe.env_tile if pipe.env_ids is not None else None))(
        gb, buffers, active_l, inv_view, cam_pos)
    if sel is None or "post" in sel:
        print("post:")
        run("bloom_total", bloom_ops.bloom, rt)
        run("bloom_prefilter",
            lambda x: bloom_ops.prefilter(x, h // 2, w // 2), rt)

        def post(rt_, prev, dt_):
            avg = postprocess.average_luminance_direct(
                rt_, float(w * h), prev, dt_)
            out = postprocess.tone_map(rt_, avg)
            return (out * 255.0 + 0.5).astype(jnp.uint8), avg

        run("exposure_tonemap", post, rt, jnp.float32(0.18),
            jnp.float32(1 / 60))

    print(json.dumps({k: round(v, 2) for k, v in t.items()}))


if __name__ == "__main__":
    main()
