"""Float texture cache: VMEM page staging for the deferred-shading taps.

The float sibling of ops/texcache.py, covering the reference's remaining
per-pixel sampler traffic in `deferred_shading.hlsl:56-70` (prefiltered env
cube x2 + BRDF LUT split-sum fetches) and `skybox.hlsl` (background cubemap
fetch): ~4 incoherent XLA gathers/pixel = the bulk of the deferred-shading
stage once the G-buffer taps are cached (docs/PERF.md).

Same machinery as texcache (page covers per 24x128 screen tile, one staging
gather of contiguous pages, chunked `take_along_axis` sweeps in a Pallas
kernel, guaranteed fallback pages), different record format:

* records are CLAMP-addressed 2x2 quads of 4 f32 channels (16 f32 = 64 B)
  instead of wrap-addressed RGBA8 u32 quads — HDR env data, LUT pairs, and
  cube faces clamp at edges (common.CubeMipAtlas / make_quad_tex2d);
* every texture/face carries a ONE-page coarse fallback mip (<= 16x8
  texels), so a tile touching many faces still has a guaranteed in-budget
  DIRECTIONAL resolution for every tap;
* trilinear mip halves are two groups sharing a `covered` mask: a tap is
  exact only if BOTH halves made the cover, else the whole tap resolves on
  the coarse fallback mip (counted in `approx`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .texcache import (
    MAX_MIPS,
    SEG_CHUNK,
    _cover_and_match,
    _tile,
    _untile,
    onehot_lookup,
    pick_tile,  # noqa: F401  (re-exported: callers gate on the same tiling)
)
from typing import NamedTuple

PAGE_W = 16
PAGE_H = 8
PAGE_RECORDS = PAGE_W * PAGE_H
REC_F32 = 16  # 4 clamp-quad corners x 4 channels
REC_I32 = 8   # staged rows per record: bf16 value pairs packed in i32
CAP_FB = 8    # fallback-page slots per group (static list, padded to keep
              # the per-group staging span SEG_CHUNK-aligned)


class FloatAtlas(NamedTuple):
    data: jnp.ndarray       # (P*128, 16) f32 page-major clamp-quad records
    page_base: jnp.ndarray  # (T, MAX_MIPS) int32 (clamped to last mip)
    base_size: jnp.ndarray  # (T, 2) int32 (w, h)
    n_mips: jnp.ndarray     # (T,) int32
    fb_page: jnp.ndarray    # (T,) int32 — ONE-page coarse-mip fallback
    fb_size: jnp.ndarray    # (T, 2) int32 — that mip's (w, h), <= (16, 8)


def _quad_clamp(m: np.ndarray) -> np.ndarray:
    """(h, w, c<=4) -> (h, w, 16) f32 clamp-quad records [c00 c01 c10 c11],
    channels padded to 4 (same corner layout as common.make_quad_tex2d)."""
    h, w, c = m.shape
    if c < 4:
        m = np.concatenate([m, np.zeros((h, w, 4 - c), m.dtype)], -1)
    xr = np.minimum(np.arange(w) + 1, w - 1)
    yd = np.minimum(np.arange(h) + 1, h - 1)
    right = m[:, xr]
    down = m[yd]
    diag = right[yd]
    return np.concatenate([m, right, down, diag], -1).astype(np.float32)


def coarse_fallback_mip(last_mip: np.ndarray) -> np.ndarray:
    """Box-downsample an (h, w, c) image until it fits one 16x8 page."""
    m = np.asarray(last_mip, np.float32)
    while m.shape[0] > PAGE_H or m.shape[1] > PAGE_W:
        h2 = max(m.shape[0] // 2, 1)
        w2 = max(m.shape[1] // 2, 1)
        m = m[: h2 * 2, : w2 * 2].reshape(
            h2, 2, w2, 2, m.shape[-1]).mean((1, 3))
    return m


def _page_major(rec: np.ndarray) -> np.ndarray:
    """(h, w, 16) records -> (pages*128, 16) page-major (16x8-texel pages)."""
    h, w = rec.shape[:2]
    ph = (h + PAGE_H - 1) // PAGE_H * PAGE_H
    pw = (w + PAGE_W - 1) // PAGE_W * PAGE_W
    if (ph, pw) != (h, w):
        padded = np.zeros((ph, pw, REC_F32), rec.dtype)
        padded[:h, :w] = rec
        rec = padded
    return (
        rec.reshape(ph // PAGE_H, PAGE_H, pw // PAGE_W, PAGE_W, REC_F32)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, REC_F32)
    )


def quantize_bf16(x: np.ndarray) -> np.ndarray:
    """Round f32 to the nearest bf16 value (returned as f32).

    The page store holds bf16 (the reference keeps its prefiltered env /
    LUT as RGBA16F textures, DeferredPipeline.h:38-41 — 16-bit storage is
    the parity norm; bf16 is the TPU-native 16-bit float). The XLA
    reference samplers in tests quantize their content with this same
    helper so kernel-vs-XLA exactness checks stay bit-level."""
    import jax.numpy as _jnp

    return np.asarray(_jnp.asarray(x, _jnp.bfloat16), np.float32)


def pack_bf16(rec: np.ndarray) -> np.ndarray:
    """(N, REC_F32) f32 -> (N, REC_I32) int32: round each value to bf16 and
    pack adjacent pairs (v[2k] in the LOW u16, v[2k+1] in the HIGH u16).
    Halves the staging gather + sweep row volume; the kernel reconstructs
    exact f32 values with two shifts (bf16 = truncated f32)."""
    import jax.numpy as _jnp

    bf = np.asarray(_jnp.asarray(rec, _jnp.bfloat16))
    u16 = bf.view(np.uint16).reshape(rec.shape[0], REC_F32)
    lo = u16[:, 0::2].astype(np.uint32)
    hi = u16[:, 1::2].astype(np.uint32)
    return (lo | (hi << 16)).view(np.int32)


class FloatAtlasBuilder:
    """Host-side builder; textures are full mip chains of (h, w, c<=4)."""

    def __init__(self):
        self.chunks: list[np.ndarray] = []
        self.page_base: list[list[int]] = []
        self.sizes: list[tuple[int, int]] = []
        self.mips: list[int] = []
        self.fb: list[int] = []
        self.fb_size: list[tuple[int, int]] = []
        self.cursor = 0

    def _add_pages(self, rec: np.ndarray) -> int:
        start = self.cursor
        paged = _page_major(rec)
        self.chunks.append(paged)
        self.cursor += paged.shape[0] // PAGE_RECORDS
        return start

    def _add_one(self, mips: list[np.ndarray]) -> int:
        offs = [self._add_pages(_quad_clamp(np.asarray(m, np.float32)))
                for m in mips]
        # fallback: box-downsample the coarsest provided mip until the whole
        # mip fits ONE 16x8 page — overflow taps then resolve as a bilinear
        # sample of THIS mip at their own uv (directional, per face), not a
        # flat average color (which showed as tile-shaped blocks in mirror
        # reflections at high resolutions)
        m = coarse_fallback_mip(mips[-1])
        fb = self._add_pages(_quad_clamp(m))
        tid = len(self.sizes)
        self.page_base.append(offs)
        self.sizes.append((mips[0].shape[1], mips[0].shape[0]))
        self.mips.append(len(mips))
        self.fb.append(fb)
        self.fb_size.append((m.shape[1], m.shape[0]))
        return tid

    def add(self, mips: list[np.ndarray]) -> int:
        """One texture (e.g. the BRDF LUT)."""
        return self._add_one(mips)

    def add_cube(self, face_chains: list[list[np.ndarray]]) -> int:
        """6 face mip chains -> 6 consecutive texture ids (returns the
        first), each with its own per-face coarse fallback page."""
        base = None
        for ch in face_chains:
            tid = self._add_one(ch)
            base = tid if base is None else base
        return base

    def build(self) -> FloatAtlas:
        n = len(self.sizes)
        pb = np.zeros((n, MAX_MIPS), np.int32)
        for i, offs in enumerate(self.page_base):
            for m in range(MAX_MIPS):
                pb[i, m] = offs[min(m, len(offs) - 1)]
        return FloatAtlas(
            jnp.asarray(pack_bf16(np.concatenate(self.chunks, 0))),
            jnp.asarray(pb),
            jnp.asarray(np.asarray(self.sizes, np.int32)),
            jnp.asarray(np.asarray(self.mips, np.int32)),
            jnp.asarray(np.asarray(self.fb, np.int32)),
            jnp.asarray(np.asarray(self.fb_size, np.int32)),
        )


# ----------------------------------------------------------------- plan ----
def fused_table(atlas: FloatAtlas) -> jnp.ndarray:
    """(T, 5+MAX_MIPS) f32 per-texture rows
    [base_w, base_h, fb_page, fb_w, fb_h, page_base[0..MAX_MIPS-1]] — one
    T-wide one-hot read per pixel, mip page base via a MAX_MIPS-way select
    (texcache)."""
    return jnp.concatenate(
        [
            atlas.base_size,
            atlas.fb_page[:, None],
            atlas.fb_size,
            atlas.page_base[:, :MAX_MIPS],
        ],
        axis=-1,
    ).astype(jnp.float32)


def _tap_addresses_clamp(base_w, base_h, page_base, mip, u, v):
    """Clamp-addressed page/record/frac for one tap; mirrors
    common._cube_atlas_bilinear / sample_quad_tex2d addressing exactly
    (x0 = clip(floor(x), 0, w-1); fx = clip(x - x0, 0, 1))."""
    w = jnp.maximum(base_w >> mip, 1)
    h = jnp.maximum(base_h >> mip, 1)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, (w - 1).astype(jnp.float32))
    y0 = jnp.clip(jnp.floor(y), 0, (h - 1).astype(jnp.float32))
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    pages_x = (w + 15) >> 4
    page = page_base + (y0 >> 3) * pages_x + (x0 >> 4)
    intra = (y0 & 7) * 16 + (x0 & 15)
    return page, intra, fx, fy


# --------------------------------------------------------------- kernel ----
def _resolve_env_group(off_ref, cnt_ref, tbl_ref, rec, fx, fy, t, g, *,
                       blocks):
    """Resolve ONE group of f32 quad taps against the staged pages:
    chunked take_along_axis sweeps over the group's [base, base+cnt) page
    rows, then the bilinear blend. Shared by the plain resolve kernel and
    the fused deferred-shading kernel (ops/shade_pallas.py).

    rec/fx/fy: (blocks, 128) for this group; returns (4, blocks, 128) f32."""
    base = off_ref[t, g]
    seg = rec >> 7
    lane = rec & 127
    lane_b = jnp.broadcast_to(
        lane[None], (SEG_CHUNK * REC_I32, blocks, 128)
    ).reshape(SEG_CHUNK * REC_I32 * blocks, 128)

    def chunk_body(c, quad, base=base, seg=seg, lane_b=lane_b):
        rows = tbl_ref[
            0, pl.ds(pl.multiple_of(
                base * REC_I32 + c * (SEG_CHUNK * REC_I32),
                SEG_CHUNK * REC_I32), SEG_CHUNK * REC_I32)
        ]                                          # (CHUNK*8, 128)
        x = jnp.broadcast_to(
            rows[:, None, :], (SEG_CHUNK * REC_I32, blocks, 128)
        ).reshape(SEG_CHUNK * REC_I32 * blocks, 128)
        gat = jnp.take_along_axis(x, lane_b, axis=1)
        gat = gat.reshape(SEG_CHUNK, REC_I32, blocks, 128)
        sel = jnp.zeros((REC_I32, blocks, 128), jnp.int32)
        local = seg - c * SEG_CHUNK
        for sg in range(SEG_CHUNK):
            sel = jnp.where((local == sg)[None], gat[sg], sel)
        hit = (local >= 0) & (local < SEG_CHUNK)
        return jnp.where(hit[None], sel, quad)

    n_chunks = (cnt_ref[t, g] + SEG_CHUNK - 1) // SEG_CHUNK
    packed = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        jnp.zeros((REC_I32, blocks, 128), jnp.int32),
    )

    def val(v):  # bf16 half v of the packed pairs -> f32
        k, high = v >> 1, v & 1
        bits = (packed[k] & ~0xFFFF) if high else (packed[k] << 16)
        return jax.lax.bitcast_convert_type(bits, jnp.float32)

    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    comps = [
        val(c) * w00 + val(4 + c) * w01
        + val(8 + c) * w10 + val(12 + c) * w11
        for c in range(4)
    ]
    return jnp.stack(comps, 0)


def _kernel(off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref, fy_ref, out_ref, *,
            blocks, n_groups):
    """Resolve G groups of f32 quad taps against staged pages.

    off: (tiles, G) group start rows in the compact staged block (scalar
         prefetch; SEG_CHUNK-aligned — demand-shaped layout, not cap-shaped)
    cnt: (tiles, G) page counts incl. fallback block (scalar prefetch)
    tbl: (1, B*8, 128) i32 — page p value-PAIR k at row p*8+k: two bf16
         values packed per i32 (v=2k low u16, v=2k+1 high; v = corner*4 +
         channel). bf16 is truncated f32, so unpack is two shifts + bitcast.
    rec/fx/fy: (1, G, blocks, 128); out: (1, G, 4, blocks, 128) f32
    """
    t = pl.program_id(0)
    for g in range(n_groups):
        out_ref[0, g] = _resolve_env_group(
            off_ref, cnt_ref, tbl_ref, rec_ref[0, g], fx_ref[0, g],
            fy_ref[0, g], t, g, blocks=blocks,
        )


# ----------------------------------------------------------------- api -----
def plan_env_tiled(
    atlas: FloatAtlas,
    tex_t,      # (tiles, G, blocks, 128) int32
    mip_t,      # (tiles, G, blocks, 128) int32 (pre-clamped by the caller)
    u_t,        # (tiles, G, blocks, 128) f32
    v_t,        # (tiles, G, blocks, 128) f32
    act_t,      # (tiles, G, blocks, 128) bool
    *,
    fb_tids: tuple,
    share: tuple,
    caps: tuple,
    block_cap: int | None,
    stage_budget: int | None,
    interpret: bool,
):
    """The env cache's per-frame PLAN on tiled tap stacks: addressing, page
    covers, guaranteed fallbacks, and the compact staged-page block — the
    float sibling of texcache._plan_and_stage. Shared by `sample_env_tiled`
    (which tiles (H, W, G) images first) and the fused deferred-shading path
    (ops/shade_pallas.py, which computes the tap stacks in tiled layout
    directly from the G-buffer tile blocks and never materializes (H, W)).

    Returns (off_arr (tiles, G), cnts (tiles, G), staged (tiles, B*8, 128)
    i32, rec_t/fx_t/fy_t (tiles, G, blocks, 128), covered_t (tiles, G,
    blocks, 128) bool)."""
    n_tiles, g, blocks, _ = tex_t.shape
    assert len(caps) == g
    assert len(fb_tids) == g
    assert all(0 < len(t) <= CAP_FB for t in fb_tids)
    assert all((c + CAP_FB) % SEG_CHUNK == 0 for c in caps)

    from .texcache import select_mip

    table = fused_table(atlas)
    row = onehot_lookup(table, tex_t)            # (tiles, G, b, 128, 5+MIPS)
    base_w = row[..., 0].astype(jnp.int32)
    base_h = row[..., 1].astype(jnp.int32)

    # guaranteed fallback: a bilinear tap on the texture's one-page coarse
    # mip at the SAME uv (directional, unlike a flat average). Each group's
    # possible textures are statically known (fb_tids), so the fallback
    # pages are a STATIC per-group list and the per-pixel fallback slot is
    # a handful of compares — no cover extraction at all.
    _, fintra, ffx, ffy = _tap_addresses_clamp(
        row[..., 3].astype(jnp.int32), row[..., 4].astype(jnp.int32),
        row[..., 2].astype(jnp.int32), jnp.zeros_like(mip_t), u_t, v_t,
    )
    fb_slot = jnp.zeros_like(tex_t)
    for i, tids in enumerate(fb_tids):
        s_i = jnp.zeros(tex_t.shape[:1] + tex_t.shape[2:], jnp.int32)
        for j, tid in enumerate(tids):
            s_i = jnp.where(tex_t[:, i] == tid, j, s_i)
        fb_slot = fb_slot.at[:, i].set(s_i)
    fb_rec_t = fb_slot * 128 + fintra
    fb_fx_t, fb_fy_t = ffx, ffy
    # (tiles-invariant) fallback page rows per group, padded to CAP_FB
    fb_rows = [
        jnp.broadcast_to(
            atlas.fb_page[jnp.asarray(tids + (tids[0],) * (CAP_FB - len(tids)),
                                      jnp.int32)][None, :],
            (n_tiles, CAP_FB),
        )
        for tids in fb_tids
    ]

    page, intra, fx, fy = _tap_addresses_clamp(
        base_w, base_h, select_mip(row[..., 5:], mip_t), mip_t, u_t, v_t
    )
    if block_cap is None:
        assert len(set(caps)) == 1, "per-group caps need block_cap"
        cap_arg = caps[0]
    else:
        cap_arg = caps
    page_list, count, slot, found = _cover_and_match(
        page, act_t, cap_arg, block_cap=block_cap,
        kernel=block_cap is not None, interpret=interpret,
    )

    # ---- compact (demand-shaped) staging layout ---------------------------
    # Pack each group's [fb(CAP_FB)|cover(count)] block at a dynamic
    # SEG_CHUNK-aligned offset under the per-tile budget B. The sequential
    # clamp reserves SEG_CHUNK rows per remaining group so the CAP_FB
    # (= SEG_CHUNK) fallback pages ALWAYS fit — budget pressure degrades
    # taps to the directional coarse mip, never to garbage reads.
    def align8(x):
        return -(-x // SEG_CHUNK) * SEG_CHUNK

    caps_t = tuple(c + CAP_FB for c in caps)           # per-group max span
    full_budget = sum(caps_t)
    B = full_budget if stage_budget is None else min(stage_budget, full_budget)
    assert B % SEG_CHUNK == 0 and B >= SEG_CHUNK * g

    span_want = align8(CAP_FB + count)                 # (tiles, G)
    offs, spans = [], []
    off = jnp.zeros((n_tiles,), jnp.int32)
    for gi in range(g):
        reserve = SEG_CHUNK * (g - 1 - gi)
        s_eff = jnp.minimum(span_want[:, gi], B - off - reserve)
        offs.append(off)
        spans.append(s_eff)
        off = off + s_eff
    off_arr = jnp.stack(offs, axis=1)                  # (tiles, G)
    span_arr = jnp.stack(spans, axis=1)
    count_eff = jnp.minimum(count, span_arr - CAP_FB)

    # budget truncation joins the cover condition, BEFORE share-ANDing
    fit = found & (slot < count_eff[..., None, None])

    # shared covers: a trilinear tap is exact only if every half covered
    covered_t = fit
    for grp in share:
        if len(grp) > 1:
            both = functools.reduce(
                jnp.logical_and, [fit[:, i] for i in grp]
            )
            for i in grp:
                covered_t = covered_t.at[:, i].set(both)
    # every active tap resolves: covered exactly, or on its fallback page
    # (always staged, by construction)

    rec_t = jnp.where(covered_t, (CAP_FB + slot) * 128 + intra, fb_rec_t)
    fx_t = jnp.where(covered_t, fx, fb_fx_t)
    fy_t = jnp.where(covered_t, fy, fb_fy_t)

    # page table: per group [fallback (CAP_FB) | cover (caps[i])], padded to
    # the widest group, then scattered to its compact offset (truncated rows
    # land on the dump column B, sliced off)
    span_maxG = max(caps_t)
    ids_fullG = []
    for i in range(g):
        idg = jnp.concatenate([fb_rows[i], page_list[:, i, : caps[i]]], -1)
        pad = span_maxG - idg.shape[-1]
        if pad:
            idg = jnp.pad(idg, ((0, 0), (0, pad)))
        ids_fullG.append(idg)
    ids_fullG = jnp.stack(ids_fullG, axis=1)           # (tiles, G, span_maxG)
    j = jnp.arange(span_maxG, dtype=jnp.int32)
    dst = off_arr[..., None] + j
    dst = jnp.where(j[None, None, :] < span_arr[..., None], dst, B)
    ids = jnp.zeros((n_tiles, B + 1), jnp.int32).at[
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None, None], dst
    ].set(ids_fullG)[:, :B]
    cnts = CAP_FB + count_eff                          # (tiles, G)

    n_pages = atlas.data.shape[0] // PAGE_RECORDS
    pages_view = atlas.data.reshape(n_pages, PAGE_RECORDS, REC_I32)
    staged = jnp.take(pages_view, ids.reshape(-1), axis=0)
    staged = staged.reshape(n_tiles, B, PAGE_RECORDS, REC_I32)
    staged = staged.transpose(0, 1, 3, 2).reshape(
        n_tiles, B * REC_I32, PAGE_RECORDS
    )
    return off_arr, cnts, staged, rec_t, fx_t, fy_t, covered_t


@functools.partial(
    jax.jit,
    static_argnames=("fb_tids", "share", "tile_h", "tile_w", "cap",
                     "block_cap", "interpret", "stage_budget"),
)
def sample_env_tiled(
    atlas: FloatAtlas,
    tex,        # (H, W, G) int32
    mip,        # (H, W, G) int32 (pre-clamped by the caller)
    u,          # (H, W, G)
    v,          # (H, W, G)
    active,     # (H, W, G) bool
    fb_tids: tuple = (),  # per group: STATIC tuple of texture ids the group
                          # can touch (<= CAP_FB) — their one-page coarse
                          # fallback mips are always staged, so every tap
                          # resolves with zero fallback-cover work
    share: tuple = (),   # tuples of group indices sharing a covered mask
    tile_h: int = 24,
    tile_w: int = 128,
    cap: int | tuple = 28,   # per-group page budgets (int = uniform)
    block_cap: int | None = 8,
    interpret: bool = False,
    stage_budget: int | None = None,
):
    """Batched clamp-quad sampling of G tap groups through per-tile page
    covers. Returns (rgba (H, W, G, 4), covered (H, W, G), approx (H, W, G)).

    `covered` taps are exact (bit-equal to the XLA samplers); `approx` taps
    overflowed the page budget and resolved as a bilinear tap on the
    texture's one-page coarse fallback mip.
    Groups listed together in `share` (trilinear mip halves) AND their
    covered masks: a tap is never a blend of exact and fallback halves.

    Staging is demand-shaped (texcache's compact layout): each group's
    [fb(CAP_FB)|cover(count)] block packs at a dynamic SEG_CHUNK-aligned
    offset under the per-tile page budget `stage_budget` (None = worst case,
    sum of the group caps). Offsets ride scalar prefetch; a group whose span
    no longer fits is truncated — its over-slot taps degrade to the
    directional coarse-fallback page and count in `approx`, never garbage."""
    height, width, g = u.shape
    p = tile_h * tile_w
    blocks = -(-p // 128)
    blocks += (-blocks) % 8
    n_tiles = (height // tile_h) * (width // tile_w)
    caps = cap if isinstance(cap, tuple) else (cap,) * g

    def tile_g(x):  # (H, W, G) -> (tiles, G, blocks, 128)
        return _tile(jnp.moveaxis(x, -1, 0), tile_h, tile_w, blocks)

    act_t = tile_g(active)
    off_arr, cnts, staged, rec_t, fx_t, fy_t, covered_t = plan_env_tiled(
        atlas, tile_g(tex), tile_g(mip), tile_g(u), tile_g(v), act_t,
        fb_tids=fb_tids, share=share, caps=caps, block_cap=block_cap,
        stage_budget=stage_budget, interpret=interpret,
    )
    B = staged.shape[1] // REC_I32

    kernel = functools.partial(_kernel, blocks=blocks, n_groups=g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, B * REC_I32, 128), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, g, blocks, 128), lambda t, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, g, blocks, 128), lambda t, *_: (t, 0, 0, 0)),
            pl.BlockSpec((1, g, blocks, 128), lambda t, *_: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, g, 4, blocks, 128), lambda t, *_: (t, 0, 0, 0, 0)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, g, 4, blocks, 128), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(off_arr, cnts, staged, rec_t, fx_t, fy_t)

    rgba = jnp.moveaxis(_untile(out, height, width, tile_h, tile_w), (0, 1),
                        (2, 3))                        # (H, W, G, 4)
    covered = jnp.moveaxis(
        _untile(covered_t, height, width, tile_h, tile_w), 0, -1
    )
    return rgba, covered, active & ~covered


# ------------------------------------------------------------- census -----
def tap_census(atlas: FloatAtlas, tex, mip, u, v, active,
               tile_h: int = 24, tile_w: int = 128,
               caps: tuple = (32, 32, 32, 32, 16)):
    """Measure realized distinct-page demand per (tile, group) for the env
    cache's tap stream (the exact addressing `sample_env_tiled` uses), plus
    the per-tile TOTAL compact-staging span. Feed a few camera poses through
    this and size `DeferredRenderPipeline(env_budget=...)` with
    `recommend_budget` — cap-shaped staging moves sum(caps)+G*CAP_FB pages
    per tile every frame regardless of demand."""
    from .texcache import SENTINEL, select_mip

    height, width, g = u.shape
    p = tile_h * tile_w
    blocks = -(-p // 128)
    blocks += (-blocks) % 8

    table = fused_table(atlas)
    row = onehot_lookup(table, tex)
    base_w = row[..., 0].astype(jnp.int32)
    base_h = row[..., 1].astype(jnp.int32)
    page, _, _, _ = _tap_addresses_clamp(
        base_w, base_h, select_mip(row[..., 5:], mip), mip, u, v
    )

    def tile_g(x):
        return _tile(jnp.moveaxis(x, -1, 0), tile_h, tile_w, blocks)

    pg = jnp.where(tile_g(active), tile_g(page), SENTINEL)
    tiles_n = pg.shape[0]
    flat = jnp.sort(pg.reshape(tiles_n * g, blocks * 128), axis=-1)
    first = flat[:, :1] != SENTINEL
    rest = (flat[:, 1:] != flat[:, :-1]) & (flat[:, 1:] != SENTINEL)
    counts = np.asarray(first.sum(-1) + rest.sum(-1)).reshape(tiles_n, g)
    # staged spans are bounded by the group caps (over-cap taps resolve via
    # the counted LOD-cascade/coarse fallback), so the budget is sized from
    # CAPPED demand — uncapped tails would overshoot the full layout
    cap_arr = np.asarray(caps[:g], np.int64)
    capped = np.minimum(counts, cap_arr[None, :])
    span = -(-(CAP_FB + capped) // SEG_CHUNK) * SEG_CHUNK
    totals = span.sum(-1)
    return {
        "group": {
            "max": int(counts.max()),
            "p99": int(np.percentile(counts, 99)),
            "mean": float(counts.mean()),
        },
        "tile_total": {
            "max": int(totals.max()),
            "p99": int(np.percentile(totals, 99)),
            "mean": float(totals.mean()),
        },
    }


def recommend_budget(census_frames, headroom: float = 1.5) -> int:
    """SEG_CHUNK-aligned env `stage_budget` ≥ worst sampled tile total x
    headroom (same contract as texcache.recommend_budget)."""
    worst = max(c["tile_total"]["max"] for c in census_frames)
    b = -(-int(worst * headroom) // SEG_CHUNK) * SEG_CHUNK
    return max(b, 5 * SEG_CHUNK)
