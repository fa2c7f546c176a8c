"""Software texture cache: VMEM page staging + lane-gather sampling kernel.

This is the TPU re-design of the D3D12 sampler stack the reference leans on
(`DeferredRendering/Shader/gbuffer.hlsl:89-148` sampling through the static
LinearWrap sampler, `D3D12CommandList.cpp:295-302`): where a GPU texture unit
hides per-pixel random fetches behind a dedicated cache hierarchy, a TPU pays
~25 ns per incoherent HBM gather — texture taps were 64% of the round-1 frame
(docs/PERF.md), and the cost is per *issued* gather, independent of address
coherence (pinning addresses does not help — measured). The fix is to make
the cache explicit and issue (almost) no XLA gathers at all:

1. Every texture mip is stored page-major: 16x8-texel pages of 128 quad
   records (scene_pack.TextureAtlas) — one page = one 2 KB staging unit.
2. Per-pixel tap addresses (mip dims, page bases) come from ONE per-texture
   (T, 4+13) table read via a one-hot MXU matmul plus cheap 13-way mip
   selects — vs 402 ms as XLA small-table gathers at 1080p
   (docs/PERF.md round-3).
3. Per 24x128-px screen tile, the XLA side extracts the distinct pages per
   (material slot, trilinear half) — the tile's working set, bounded by the
   LOD-correct texel footprint — plus up to 4 guaranteed last-mip fallback
   pages per group, so EVERY active tap resolves in-kernel: exactly when its
   page made the cover (>99.4% of taps at cap 96), and as the texture's
   coarsest-mip average when it did not (counted in the returned stats).
4. One XLA gather stages all tiles' page lists (contiguous 2 KB rows,
   ~55 GB/s vs ~0.6 GB/s for per-texel rows).
5. A Pallas kernel resolves all taps against the VMEM-resident pages with
   `jnp.take_along_axis` (Mosaic `tpu.dynamic_gather`) sweeps batched 8
   segments x 4 channels x pixel-blocks per op, `fori`-bounded by each
   group's actual page count (median group needs ~10 pages, p99 ~81).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gbuffer

SENTINEL = 2**31 - 1  # plain int: usable inside Pallas kernels (no capture)
MAX_MIPS = 13
CAP_FB = 4       # guaranteed last-mip fallback pages per group
SEG_CHUNK = 8    # segments per take_along_axis sweep op


# --------------------------------------------------------------- tiling ----
def pick_tile(height: int, width: int, max_pixels: int = 4096):
    """Choose a (tile_h, tile_w) screen tiling for the texture cache.

    Prefers ~24x128 (3072 px: the LOD-correct texel footprint of a tile then
    fits the page budget). Requires tile_h*tile_w % 128 == 0 and divisibility;
    returns None when the frame admits no such tiling (caller falls back to
    the pure XLA sampler)."""
    tws = sorted((d for d in range(32, min(width, 512) + 1) if width % d == 0),
                 key=lambda d: abs(d - 128))
    for tw in tws:
        ths = sorted(
            (d for d in range(4, min(height, 64) + 1)
             if height % d == 0 and (d * tw) % 128 == 0
             and d * tw <= max_pixels),
            key=lambda d: abs(d - 3072 // tw),
        )
        if ths:
            return ths[0], tw
    return None


def _tile(img, tile_h, tile_w, blocks_pad):
    """(..., H, W) leading-batched image -> (tiles, ..., blocks_pad, 128)."""
    *lead, h, w = img.shape
    ty, tx = h // tile_h, w // tile_w
    p = tile_h * tile_w
    x = img.reshape(*lead, ty, tile_h, tx, tile_w)
    x = jnp.moveaxis(x, (-4, -2), (0, 1))          # (ty, tx, ..., th, tw)
    x = x.reshape(ty * tx, *lead, p // 128, 128)
    pad = blocks_pad - p // 128
    if pad:
        padding = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
        x = jnp.pad(x, padding)
    return x


def _untile(tiles, height, width, tile_h, tile_w):
    """(n_tiles, ..., blocks_pad, 128) -> (..., H, W)."""
    ty, tx = height // tile_h, width // tile_w
    p = tile_h * tile_w
    x = tiles.reshape(tiles.shape[0], *tiles.shape[1:-2], -1)[..., :p]
    lead = x.shape[1:-1]
    x = x.reshape(ty, tx, *lead, tile_h, tile_w)
    x = jnp.moveaxis(x, (0, 1), (-4, -2))
    return x.reshape(*lead, height, width)


# ------------------------------------------------ one-hot table lookups ----
def fused_tex_table(atlas: gbuffer.AtlasDevice) -> jnp.ndarray:
    """(T, 4+MAX_MIPS) f32 table keyed by tex:
    [n_mips, base_w, base_h, fallback_page, page_base[0..MAX_MIPS-1]].
    All values int-exact in f32. ONE row per texture (not per (tex, mip)):
    the per-pixel lookup is a T-wide one-hot matmul and the mip's page base
    is then a cheap MAX_MIPS-way select — ~40x fewer per-pixel compares
    than a (T*MAX_MIPS)-row table at frame scale.

    The fallback page is page_base[n_mips]: either the real 1x1 coarsest mip
    (clamped entry) or the synthetic average-color page scene_pack appends
    for textures whose chain stops above 1x1 — always 1x1-addressable."""
    last = jnp.take_along_axis(
        atlas.page_base, jnp.minimum(atlas.n_mips, MAX_MIPS - 1)[:, None],
        axis=1,
    )
    return jnp.concatenate(
        [
            atlas.n_mips[:, None],
            atlas.base_size,
            last,
            atlas.page_base[:, :MAX_MIPS],
        ],
        axis=-1,
    ).astype(jnp.float32)


def select_mip(pb, mip):
    """pb (..., MAX_MIPS) f32 page bases, mip (...,) int32 -> (...,) int32."""
    oh = mip[..., None] == jnp.arange(MAX_MIPS, dtype=jnp.int32)
    return jnp.where(oh, pb, 0.0).sum(-1).astype(jnp.int32)


def onehot_lookup(table, key):
    """table (n, k) f32 with int-exact values, key (...,) int32 -> (..., k).

    One MXU matmul instead of a per-element XLA gather: ~15x faster at
    (H, W, 5) scale (docs/PERF.md round-3). Exact: the one-hot rows have
    a single 1.0, so each output is one table value times 1.0."""
    n = table.shape[0]
    oh = (key[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(
        jnp.float32
    )
    out = jnp.dot(oh.reshape(-1, n), table,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return out.reshape(*key.shape, table.shape[-1])


# ----------------------------------------------------------------- plan ----
def _tap_addresses(base_w, base_h, page_base, mip, u, v):
    """Per-pixel page id + intra-page record index + bilinear fracs for one
    mip tap. Mirrors gbuffer._sample_mip_bilinear's addressing exactly."""
    w = jnp.maximum(base_w >> mip, 1)
    h = jnp.maximum(base_h >> mip, 1)
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.mod(x0f.astype(jnp.int32), w)
    y0 = jnp.mod(y0f.astype(jnp.int32), h)
    pages_x = (w + 15) >> 4
    page = page_base + (y0 >> 3) * pages_x + (x0 >> 4)
    intra = (y0 & 7) * 16 + (x0 & 15)
    return page, intra, fx, fy


def _mip_plan(atlas, tex, lod, trilinear):
    """Per-pixel texture-table lookup + mip selection shared by the sampling
    kernel and the tap census: (base_w, base_h, page-base rows, fallback page,
    [mip_lo(, mip_hi)], trilinear frac, n_mips)."""
    table = fused_tex_table(atlas)
    row0 = onehot_lookup(table, tex)            # (H, W, 5, 4+MAX_MIPS)
    n_mips_t = row0[..., 0].astype(jnp.int32)
    base_w = row0[..., 1].astype(jnp.int32)
    base_h = row0[..., 2].astype(jnp.int32)
    fb_page = row0[..., 3].astype(jnp.int32)
    pb = row0[..., 4:]
    lod = jnp.clip(lod, 0.0, (n_mips_t - 1).astype(jnp.float32))
    if trilinear:
        m_lo = jnp.floor(lod).astype(jnp.int32)
        tfrac = lod - m_lo
        mips = [m_lo, jnp.minimum(m_lo + 1, n_mips_t - 1)]
    else:
        m_lo = jnp.round(lod).astype(jnp.int32)
        tfrac = jnp.zeros_like(lod)
        mips = [m_lo]
    return base_w, base_h, pb, fb_page, mips, tfrac, n_mips_t


def _cover_and_match(pages, act, cap, block_cap: int | None = None,
                     kernel: bool = False, interpret: bool = False):
    """pages/act: (tiles, g, blocks, 128). Extract up to `cap` distinct page
    ids per (tile, group) and match every pixel against them.

    Returns (page_list (tiles, g, cap) int32 [0-padded],
             count (tiles, g) int32,
             rec slot index, found — both shaped like `pages`).

    With `block_cap` set, runs TWO-LEVEL: first up to block_cap distinct
    pages per 128-lane block (a screen row of the tile — coherent frames
    need ~8-12), then the tile-level scan over blocks*block_cap candidates
    instead of all pixels (~128/block_cap x less scan work — the cover scan
    is otherwise the texture cache's biggest planning cost). Pixels whose
    block exceeded block_cap distinct pages lose coverage (-> fallback,
    counted in `approx` by the caller) — real frames are row-coherent, so
    this bounds only adversarial content."""
    if block_cap is not None:
        return _cover_and_match_2level(pages, act, cap, block_cap,
                                       kernel=kernel, interpret=interpret)
    assert not isinstance(cap, tuple), "per-group caps need block_cap"
    shape = pages.shape
    pages = pages.reshape(shape[0], shape[1], -1)
    vals0 = jnp.where(act.reshape(pages.shape), pages, SENTINEL)

    def step(carry, k):
        vals, slot, found = carry
        m = vals.min(axis=-1)                          # (tiles, g)
        hit = pages == m[..., None]
        live = (m != SENTINEL)[..., None]
        slot = jnp.where(hit & live, k, slot)
        found = found | (hit & live)
        vals = jnp.where(hit, SENTINEL, vals)
        return (vals, slot, found), (
            jnp.where(m == SENTINEL, 0, m), m != SENTINEL
        )

    init = (
        vals0,
        jnp.zeros(pages.shape, jnp.int32),
        jnp.zeros(pages.shape, bool),
    )
    (vals, slot, found), scanned = jax.lax.scan(
        step, init, jnp.arange(cap, dtype=jnp.int32)
    )
    page_list, live = scanned
    page_list = jnp.moveaxis(page_list, 0, -1)
    count = jnp.moveaxis(live, 0, -1).sum(-1).astype(jnp.int32)
    return page_list, count, slot.reshape(shape), found.reshape(shape) & act


def _distinct_by_sort(cand, cap_max, cap_arr=None):
    """Exact distinct-value extraction per row of `cand` (..., L) int32
    (SENTINEL = absent), by sorting instead of a cap-step min-scan.

    cap_arr (optional) broadcasts against the leading dims for per-row
    budgets (<= cap_max). Returns
    (page_list (..., cap_max) ascending distinct values [0-padded],
     count (...,) int32 distinct count clamped to the row's cap,
     rank (..., L) each element's rank among the row's distinct values
     (== its slot in page_list; >= cap when not covered),
     found (..., L) rank < cap and not SENTINEL)."""
    L = cand.shape[-1]
    if cap_arr is None:
        cap_arr = jnp.full((1,) * (cand.ndim - 1), cap_max, jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, cand.shape, cand.ndim - 1)
    sv, sp = jax.lax.sort((cand, iota), dimension=-1, num_keys=1)
    first = jnp.concatenate(
        [jnp.ones((*cand.shape[:-1], 1), bool), sv[..., 1:] != sv[..., :-1]],
        axis=-1,
    ) & (sv != SENTINEL)
    rank_sorted = jnp.cumsum(first.astype(jnp.int32), axis=-1) - 1
    rank_sorted = jnp.where(sv != SENTINEL, rank_sorted, L)
    count = jnp.minimum(first.sum(-1).astype(jnp.int32), cap_arr)

    # compact the distinct values to the front (second sort, key = rank)
    key2 = jnp.where(first, rank_sorted, L)
    _, vv = jax.lax.sort((key2, sv), dimension=-1, num_keys=1)
    page_list = jnp.where(
        jnp.arange(cap_max, dtype=jnp.int32) < count[..., None],
        vv[..., :cap_max], 0,
    )

    # ranks back at original positions (third sort, key = original index)
    _, rank = jax.lax.sort((sp, rank_sorted), dimension=-1, num_keys=1)
    found = rank < cap_arr[..., None]
    return page_list, count, jnp.minimum(rank, cap_arr[..., None] - 1), found


def _block_cover_kernel(pages_ref, act_ref, cand_out, slot_out, *,
                        block_cap, g):
    """Per-tile block-level distinct-page scan, VMEM-resident.

    Replicates _cover_and_match_2level's stepA exactly (same candidate order,
    slot indices, and found semantics) but keeps the block_cap-step scan's
    carries on-chip: the XLA scan streams ~(16 steps x 3 carries x 80 MB)
    through HBM at 1080p — the texture cache's single biggest planning cost
    (docs/PERF.md round-3). slot == block_cap encodes "not found"."""
    for gi in range(g):
        pages = pages_ref[0, gi]                       # (blocks, 128) i32
        act = act_ref[0, gi] != 0
        v = jnp.where(act, pages, SENTINEL)
        slot = jnp.full(pages.shape, block_cap, jnp.int32)
        cands = []
        for k in range(block_cap):
            m = jnp.min(v, axis=1, keepdims=True)      # (blocks, 1)
            live = m != SENTINEL
            hit = (pages == m) & live
            slot = jnp.where(hit, k, slot)
            v = jnp.where(pages == m, SENTINEL, v)
            cands.append(m)
        cand_out[0, gi] = jnp.concatenate(cands, axis=1)
        slot_out[0, gi] = slot


def _block_cover_pallas(pages, act, block_cap, interpret=False):
    """(candA (tiles, g, blocks, B), slotA (tiles, g, blocks, 128) with
    block_cap = not-found) — kernel version of stepA."""
    tiles, g, blocks, _ = pages.shape
    kernel = functools.partial(_block_cover_kernel, block_cap=block_cap, g=g)
    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, g, blocks, block_cap), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, g, blocks, block_cap), jnp.int32),
            jax.ShapeDtypeStruct((tiles, g, blocks, 128), jnp.int32),
        ],
        interpret=interpret,
    )(pages, act.astype(jnp.int32))


def _pix_match_kernel(slotA_ref, slotB_ref, foundB_ref, slot_out, cov_out, *,
                      block_cap, g):
    """pix_slot = slotB[slotA], pix_cov = foundB[slotA] — the per-pixel
    block->tile rank indirection as a VMEM B-way select (the XLA version
    streams ~4 GB through HBM at 1080p)."""
    for gi in range(g):
        slotA = slotA_ref[0, gi]                       # (blocks, 128)
        slotB = slotB_ref[0, gi]                       # (blocks, B)
        foundB = foundB_ref[0, gi] != 0
        pix_slot = jnp.zeros(slotA.shape, jnp.int32)
        pix_cov = jnp.zeros(slotA.shape, bool)
        for b in range(block_cap):
            m = slotA == b
            pix_slot = jnp.where(m, slotB[:, b : b + 1], pix_slot)
            pix_cov = pix_cov | (m & foundB[:, b : b + 1])
        slot_out[0, gi] = pix_slot
        cov_out[0, gi] = pix_cov.astype(jnp.int32)


def _pix_match_pallas(slotA, slotB, foundB, block_cap, interpret=False):
    tiles, g, blocks, _ = slotA.shape
    kernel = functools.partial(_pix_match_kernel, block_cap=block_cap, g=g)
    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, g, blocks, block_cap), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, g, blocks, block_cap), lambda t: (t, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
        ],
    )
    slot, cov = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, g, blocks, 128), jnp.int32),
            jax.ShapeDtypeStruct((tiles, g, blocks, 128), jnp.int32),
        ],
        interpret=interpret,
    )(slotA, slotB, foundB.astype(jnp.int32))
    return slot, cov != 0


def _fused_cover_kernel(pages_ref, act_ref, list_out, cnt_out, slot_out,
                        cov_out, *, block_cap, cap_max, caps, g):
    """Whole plan in ONE kernel: block-level distinct scan + tile-level
    distinct merge + per-pixel match, all VMEM-resident.

    Replaces the XLA pipeline (block kernel -> HBM -> 3 sorts -> HBM ->
    pix-match kernel): the sorts + candidate round trips were ~13 ms/frame
    at 1080p (xprof round-3). Bit-identical to the sort path: the merge is
    an ascending min-extract over the block candidates, which is exactly
    the rank order _distinct_by_sort produces."""
    for gi in range(g):
        cap_g = caps[gi]
        pages = pages_ref[0, gi]                       # (blocks, 128) i32
        act = act_ref[0, gi] != 0
        blocks = pages.shape[0]

        # empty-group gate: tiles fully in sky and material slots unused in
        # a tile have zero active taps — skip the whole scan + merge for
        # them (the zero outputs below are exactly what the full body
        # produces on an all-inactive group, so this is bit-identical)
        list_out[0, gi] = jnp.zeros((128,), jnp.int32)
        cnt_out[0, gi] = jnp.zeros((128,), jnp.int32)
        slot_out[0, gi] = jnp.zeros(pages.shape, jnp.int32)
        cov_out[0, gi] = jnp.zeros(pages.shape, jnp.int32)

        @pl.when(jnp.any(act))
        def _group_body(gi=gi, cap_g=cap_g, pages=pages, act=act):
            _fused_cover_group(pages_ref, act_ref, list_out, cnt_out,
                               slot_out, cov_out, gi, cap_g, pages, act,
                               block_cap=block_cap, cap_max=cap_max, g=g)


def _fused_cover_group(pages_ref, act_ref, list_out, cnt_out, slot_out,
                       cov_out, gi, cap_g, pages, act, *,
                       block_cap, cap_max, g):
    """One (tile, group) cover plan — the body of _fused_cover_kernel,
    split out so the empty-group pl.when gate can wrap it."""
    def row_of(col, n_pad):
        chunks = []
        for c in range(n_pad // 128):
            blk = jnp.broadcast_to(col[c * 128:(c + 1) * 128], (128, 128))
            chunks.append(jnp.transpose(blk)[0:1, :])
        return jnp.concatenate(chunks, axis=1) if len(chunks) > 1 else chunks[0]

    v = jnp.where(act, pages, SENTINEL)

    # block level: up to block_cap distinct per 128-px row (ascending).
    # Candidates stack along axis 0 (k-major): index = k*blocks + row.
    blocks = pages.shape[0]
    slotA = jnp.full(pages.shape, block_cap, jnp.int32)
    cands = []
    for k in range(block_cap):
        m = jnp.min(v, axis=1, keepdims=True)      # (blocks, 1)
        live = m != SENTINEL
        hit = (pages == m) & live
        slotA = jnp.where(hit, k, slotA)
        v = jnp.where(pages == m, SENTINEL, v)
        cands.append(m)
    cj = jnp.concatenate(cands, axis=0)            # (n0, 1) column
    n0 = blocks * block_cap
    n_pad = -(-n0 // 128) * 128
    if n_pad != n0:
        pad = jnp.full((n_pad - n0, 1), SENTINEL, jnp.int32)
        ck = row_of(jnp.concatenate([cj, pad], axis=0), n_pad)
    else:
        ck = row_of(cj, n_pad)                     # (1, n_pad)

    # tile level: dense rank-matrix merge — rank[j] = number of distinct
    # candidate values below cand[j], via (n0, n_pad) vector compares
    # (a serial min-extract loop stalls the VPU ~20 ms/frame; this is
    # ~150k dense VPU ops per (tile, group))
    valid_j = cj != SENTINEL
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n0, n_pad), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (n0, n_pad), 1)
    dup = ((cj == ck) & (col_i < row_i)).sum(axis=1, keepdims=True) > 0
    first = valid_j & ~dup                          # (n0, 1)
    first_i = first.astype(jnp.int32)
    if n_pad != n0:
        fpad = jnp.zeros((n_pad - n0, 1), jnp.int32)
        first_k = row_of(jnp.concatenate([first_i, fpad], axis=0), n_pad)
    else:
        first_k = row_of(first_i, n_pad)            # (1, n_pad)
    rank = ((ck < cj) & (first_k != 0)).sum(axis=1, keepdims=True)
    rank_col = jnp.where(valid_j, rank, cap_max)    # (n0, 1)
    cnt = first_i.sum()
    lane = jax.lax.broadcasted_iota(jnp.int32, (n0, 128), 1)
    sel = first & (rank == lane)                    # (n0, 128) one-hot
    list_vec = jnp.where(sel, cj, 0).sum(axis=0, keepdims=True)
    # match the sort path exactly: entries past min(count, cap_g) are 0
    cnt_g = jnp.minimum(cnt, cap_g)
    list_vec = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < cnt_g,
        list_vec, 0,
    )

    # per-pixel: slot/coverage via the block-candidate indirection
    pix_slot = jnp.zeros(pages.shape, jnp.int32)
    pix_cov = jnp.zeros(pages.shape, bool)
    for b in range(block_cap):
        m = slotA == b
        rank_b = rank_col[b * blocks:(b + 1) * blocks]   # (blocks, 1)
        pix_slot = jnp.where(m, jnp.minimum(rank_b, cap_g - 1), pix_slot)
        pix_cov = pix_cov | (m & (rank_b < cap_g))
    list_out[0, gi] = list_vec[0]
    cnt_out[0, gi] = jnp.broadcast_to(cnt_g[None], (128,))
    slot_out[0, gi] = pix_slot
    cov_out[0, gi] = (pix_cov & act).astype(jnp.int32)


def _fused_cover_kernel_batched(pages_ref, act_ref, list_out, cnt_out,
                                slot_out, cov_out, *, block_cap, cap_max,
                                caps, g):
    """_fused_cover_kernel with ALL g groups batched through one wide
    instruction stream.

    The per-group kernel issues ~g x block_cap serial (blocks, 128) vector
    ops plus 6 broadcast-transposes per group — instruction-issue-bound on
    the VPU (~12 ms per call at 1080p shapes, measured round-3). Stacking
    the groups along sublanes turns the same work into a handful of dense
    (g*n0, n_pad) ops: one min-extract loop over a (g*blocks, 128) view and
    ONE rank-matrix merge for all groups. Bit-identical outputs (the
    per-group compares never cross group rows: each row of the rank matrix
    compares against its OWN group's candidate lane-row)."""
    blocks = pages_ref.shape[2]

    # whole-tile gate: pure-sky tiles have zero active taps in every group —
    # skip the dense batched body for them (its zero outputs equal the full
    # body's result on an all-inactive tile, so this is bit-identical)
    list_out[0] = jnp.zeros((g, 128), jnp.int32)
    cnt_out[0] = jnp.zeros((g, 128), jnp.int32)
    slot_out[0] = jnp.zeros((g, blocks, 128), jnp.int32)
    cov_out[0] = jnp.zeros((g, blocks, 128), jnp.int32)

    @pl.when(jnp.any(act_ref[0] != 0))
    def _tile_body():
        _fused_cover_batched_body(
            pages_ref, act_ref, list_out, cnt_out, slot_out, cov_out,
            block_cap=block_cap, cap_max=cap_max, caps=caps, g=g,
        )


def _fused_cover_batched_body(pages_ref, act_ref, list_out, cnt_out,
                              slot_out, cov_out, *, block_cap, cap_max,
                              caps, g):
    blocks = pages_ref.shape[2]
    n0 = blocks * block_cap
    n_pad = -(-n0 // 128) * 128                        # per-group row stride
    gb = g * blocks
    rows = g * n_pad

    # Mosaic supports only leading-dim reshapes (lane width must not
    # change), so every lane<->sublane move below is either a leading-dim
    # reshape, a sublane slice/concat, or the 128x128 broadcast-transpose
    # trick (row_of) — never a shape cast.
    pages = pages_ref[0].reshape(gb, 128)              # leading merge: free
    act = act_ref[0].reshape(gb, 128) != 0

    # block level, all groups at once: up to block_cap distinct per
    # 128-px row, ascending
    v = jnp.where(act, pages, SENTINEL)
    slotA = jnp.full((gb, 128), block_cap, jnp.int32)
    mins = []
    for k in range(block_cap):
        m = jnp.min(v, axis=1, keepdims=True)          # (gb, 1)
        live = m != SENTINEL
        hit = (pages == m) & live
        slotA = jnp.where(hit, k, slotA)
        v = jnp.where(pages == m, SENTINEL, v)
        mins.append(m)

    # candidate column, k-major within each 384-aligned group segment:
    # group gi's rows [gi*n_pad, gi*n_pad + n0) hold its candidates at
    # j = k*blocks + r; the tail pads with SENTINEL
    pieces = []
    pad = (jnp.full((n_pad - n0, 1), SENTINEL, jnp.int32)
           if n_pad != n0 else None)
    for gi in range(g):
        for k in range(block_cap):
            pieces.append(mins[k][gi * blocks:(gi + 1) * blocks])
        if pad is not None:
            pieces.append(pad)
    cj_col = jnp.concatenate(pieces, axis=0)           # (rows, 1)

    def lane_rows(col):
        """(rows, 1) column -> (g, n_pad) lane rows via broadcast-transpose
        (group segments are 128-aligned, so chunks never straddle groups)."""
        chunks = []
        for c in range(rows // 128):
            blk = jnp.broadcast_to(col[c * 128:(c + 1) * 128], (128, 128))
            chunks.append(jnp.transpose(blk)[0:1, :])
        full = (jnp.concatenate(chunks, axis=1) if len(chunks) > 1
                else chunks[0])                        # (1, rows)
        per_g = [full[:, gi * n_pad:(gi + 1) * n_pad] for gi in range(g)]
        return jnp.concatenate(per_g, axis=0) if g > 1 else per_g[0]

    ck_g = lane_rows(cj_col)                           # (g, n_pad)
    ck_b = jnp.broadcast_to(ck_g[:, None, :], (g, n_pad, n_pad)).reshape(
        rows, n_pad
    )
    valid = cj_col != SENTINEL
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % n_pad
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)

    # ONE dense merge for every group: dup/first/rank via row-vs-lane
    # compares against the row's own group candidates
    dup = ((cj_col == ck_b) & (lane_i < j_idx)).sum(
        axis=1, keepdims=True) > 0
    first = valid & ~dup                               # (rows, 1)
    first_g = lane_rows(first.astype(jnp.int32))       # (g, n_pad)
    first_b = jnp.broadcast_to(
        first_g[:, None, :], (g, n_pad, n_pad)
    ).reshape(rows, n_pad)
    rank = ((ck_b < cj_col) & (first_b != 0)).sum(axis=1, keepdims=True)
    rank = jnp.where(valid, rank, cap_max)             # (rows, 1)

    # per-group cap column from scalar literals (a captured jnp constant
    # is rejected by pallas_call)
    g_row = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    cap_vec = jnp.zeros((g, 1), jnp.int32)
    for gi, cap_g in enumerate(caps):
        cap_vec = jnp.where(g_row == gi, cap_g, cap_vec)
    cnt_g = jnp.minimum(first_g.sum(axis=1, keepdims=True), cap_vec)

    # ascending distinct list per group (entries past min(cnt, cap) are 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    sel = first & (rank == lane128)
    list_g = jnp.where(sel, cj_col, 0).reshape(g, n_pad, 128).sum(axis=1)
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (g, 128), 1)
    list_g = jnp.where(lane_g < cnt_g, list_g, 0)

    # per-pixel slot/coverage via the block-candidate indirection
    cap_pix = jnp.broadcast_to(cap_vec[:, None, :], (g, blocks, 1)).reshape(
        gb, 1
    )
    pix_slot = jnp.zeros((gb, 128), jnp.int32)
    pix_cov = jnp.zeros((gb, 128), bool)
    for k in range(block_cap):
        rank_k = jnp.concatenate(
            [rank[gi * n_pad + k * blocks:gi * n_pad + (k + 1) * blocks]
             for gi in range(g)], axis=0,
        ) if g > 1 else rank[k * blocks:(k + 1) * blocks]  # (gb, 1)
        m = slotA == k
        pix_slot = jnp.where(m, jnp.minimum(rank_k, cap_pix - 1), pix_slot)
        pix_cov = pix_cov | (m & (rank_k < cap_pix))

    list_out[0] = list_g
    cnt_out[0] = jnp.broadcast_to(cnt_g, (g, 128))
    slot_out[0] = pix_slot.reshape(g, blocks, 128)
    cov_out[0] = (pix_cov & act).astype(jnp.int32).reshape(g, blocks, 128)


def _fused_cover_kernel_dyn(pages_ref, act_ref, list_out, cnt_out, slot_out,
                            cov_out, cand_col, cand_row, first_col, first_row,
                            rank_col, *, block_cap, cap_max, caps, g):
    """_fused_cover_kernel with every merge loop bounded by the REALIZED
    candidate count instead of the worst case.

    The static kernel pays (blocks*block_cap)^2 rank-matrix work on every
    (tile, group); the measured census (reference scene, 1536x864) shows
    mean ~1.5 distinct pages per 128-px block against the block_cap=16
    budget, so typical groups process 1 candidate chunk instead of
    ceil(blocks*block_cap/128). K* = max distinct over the group's blocks
    bounds the k-major candidate index space to K**blocks flat entries;
    first/rank/list/pixel passes all fori over ceil(K**blocks/128) chunks
    through VMEM scratch. Bit-identical to the static kernel and the sort
    path (tests/test_texcache.py)."""
    blocks = pages_ref.shape[2]
    n0 = blocks * block_cap
    n_pad = -(-n0 // 128) * 128
    n_chunks_max = n_pad // 128

    def col_of(row):
        """(1, 128) row -> (128, 1) column via lane-broadcast + transpose."""
        return jnp.transpose(jnp.broadcast_to(row, (128, 128)))[:, 0:1]

    def row_of(col, n):
        chunks = []
        for c in range(n // 128):
            blk = jnp.broadcast_to(col[c * 128:(c + 1) * 128], (128, 128))
            chunks.append(jnp.transpose(blk)[0:1, :])
        return jnp.concatenate(chunks, axis=1) if len(chunks) > 1 else chunks[0]

    for gi in range(g):
        cap_g = caps[gi]
        pages = pages_ref[0, gi]                       # (blocks, 128) i32
        act = act_ref[0, gi] != 0
        v = jnp.where(act, pages, SENTINEL)

        # block level: up to block_cap distinct per 128-px row (ascending),
        # k-major flat index = k*blocks + row
        slotA = jnp.full(pages.shape, block_cap, jnp.int32)
        cands = []
        live_cnt = jnp.zeros((blocks, 1), jnp.int32)
        for k in range(block_cap):
            m = jnp.min(v, axis=1, keepdims=True)      # (blocks, 1)
            live = m != SENTINEL
            hit = (pages == m) & live
            slotA = jnp.where(hit, k, slotA)
            v = jnp.where(pages == m, SENTINEL, v)
            live_cnt = live_cnt + live.astype(jnp.int32)
            cands.append(m)
        cj = jnp.concatenate(cands, axis=0)            # (n0, 1) column
        if n_pad != n0:
            cj = jnp.concatenate(
                [cj, jnp.full((n_pad - n0, 1), SENTINEL, jnp.int32)], axis=0)
        ck = row_of(cj, n_pad)                         # (1, n_pad)
        cand_col[:, :] = cj
        for c in range(n_chunks_max):
            cand_row[c, :] = ck[0, c * 128:(c + 1) * 128]

        # realized bound: every valid candidate's flat index < K* * blocks
        k_star = jnp.max(live_cnt)
        n_chunks = (k_star * blocks + 127) // 128      # dynamic

        lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

        # pass 1: first-occurrence flags (dup count over columns < row)
        def first_body(rc, cnt_acc):
            cjc = cand_col[pl.ds(rc * 128, 128), :]    # (128, 1)

            def dup_body(cc, acc):
                ckc = cand_row[pl.ds(cc, 1), :]        # (1, 128)
                colmask = (cc * 128 + lane[0:1, :]) < (rc * 128 + sub)
                return acc + ((cjc == ckc) & colmask).sum(
                    axis=1, keepdims=True).astype(jnp.int32)

            dup = jax.lax.fori_loop(
                0, rc + 1, dup_body, jnp.zeros((128, 1), jnp.int32))
            first_c = ((cjc != SENTINEL) & (dup == 0)).astype(jnp.int32)
            first_col[pl.ds(rc * 128, 128), :] = first_c
            first_row[pl.ds(rc, 1), :] = row_of(first_c, 128)
            return cnt_acc + first_c.sum()

        cnt = jax.lax.fori_loop(0, n_chunks, first_body,
                                jnp.zeros((), jnp.int32))

        # pass 2: rank = number of distinct-first candidates strictly below
        def rank_body(rc, _):
            cjc = cand_col[pl.ds(rc * 128, 128), :]

            def acc_body(cc, acc):
                ckc = cand_row[pl.ds(cc, 1), :]
                fkc = first_row[pl.ds(cc, 1), :] != 0
                return acc + ((ckc < cjc) & fkc).sum(
                    axis=1, keepdims=True).astype(jnp.int32)

            rank = jax.lax.fori_loop(
                0, n_chunks, acc_body, jnp.zeros((128, 1), jnp.int32))
            rank_col[pl.ds(rc * 128, 128), :] = jnp.where(
                cjc != SENTINEL, rank, cap_max)
            return 0

        jax.lax.fori_loop(0, n_chunks, rank_body, 0)

        # pass 3: ascending distinct list (one-hot rank scatter per chunk)
        def list_body(rc, acc):
            cjc = cand_col[pl.ds(rc * 128, 128), :]
            first_c = first_col[pl.ds(rc * 128, 128), :] != 0
            rank_c = rank_col[pl.ds(rc * 128, 128), :]
            sel = first_c & (rank_c == lane)           # (128, 128)
            return acc + jnp.where(sel, cjc, 0).sum(axis=0, keepdims=True)

        list_vec = jax.lax.fori_loop(
            0, n_chunks, list_body, jnp.zeros((1, 128), jnp.int32))
        cnt_g = jnp.minimum(cnt, cap_g)
        list_vec = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < cnt_g,
            list_vec, 0,
        )

        # pass 4: per-pixel slot/coverage via the block-candidate indirection
        def pix_body(b, carry):
            pix_slot, pix_cov = carry
            m = slotA == b
            rank_b = rank_col[pl.ds(b * blocks, blocks), :]  # (blocks, 1)
            pix_slot = jnp.where(m, jnp.minimum(rank_b, cap_g - 1), pix_slot)
            pix_cov = pix_cov | (m & (rank_b < cap_g))
            return pix_slot, pix_cov

        pix_slot, pix_cov = jax.lax.fori_loop(
            0, jnp.minimum(k_star, block_cap), pix_body,
            (jnp.zeros(pages.shape, jnp.int32), jnp.zeros(pages.shape, bool)),
        )
        list_out[0, gi] = list_vec[0]
        cnt_out[0, gi] = jnp.broadcast_to(cnt_g[None], (128,))
        slot_out[0, gi] = pix_slot
        cov_out[0, gi] = (pix_cov & act).astype(jnp.int32)


# dynamic kernel: bit-identical in interpret mode (tests); stays off until
# its Mosaic compile + win are confirmed on hardware (the tunnel was down
# when it landed) — flip after a TPU run shows it compiles and is faster
FUSED_COVER_DYNAMIC = False
# batch all g groups through one wide instruction stream (bit-identical;
# ~3x on the instruction-issue-bound per-group kernel — docs/PERF.md round-3)
FUSED_COVER_BATCHED = True


def _fused_cover_pallas(pages, act, caps, block_cap, cap_max,
                        interpret=False, dynamic=None, batched=None):
    tiles, g, blocks, _ = pages.shape
    if dynamic is None:
        dynamic = FUSED_COVER_DYNAMIC
    if batched is None:  # mirror of `dynamic`: A/Bs need no global mutation
        batched = FUSED_COVER_BATCHED
    n_pad = -(-(blocks * block_cap) // 128) * 128
    if dynamic:
        kernel = functools.partial(
            _fused_cover_kernel_dyn, block_cap=block_cap, cap_max=cap_max,
            caps=caps, g=g,
        )
        scratch = [
            pltpu.VMEM((n_pad, 1), jnp.int32),      # cand_col
            pltpu.VMEM((n_pad // 128, 128), jnp.int32),  # cand_row
            pltpu.VMEM((n_pad, 1), jnp.int32),      # first_col
            pltpu.VMEM((n_pad // 128, 128), jnp.int32),  # first_row
            pltpu.VMEM((n_pad, 1), jnp.int32),      # rank_col
        ]
    else:
        kernel = functools.partial(
            _fused_cover_kernel_batched if batched else _fused_cover_kernel,
            block_cap=block_cap, cap_max=cap_max, caps=caps, g=g,
        )
        scratch = []
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, g, 128), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, g, 128), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
            pl.BlockSpec((1, g, blocks, 128), lambda t: (t, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, g, 128), jnp.int32),
            jax.ShapeDtypeStruct((tiles, g, 128), jnp.int32),
            jax.ShapeDtypeStruct((tiles, g, blocks, 128), jnp.int32),
            jax.ShapeDtypeStruct((tiles, g, blocks, 128), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(pages, act.astype(jnp.int32))


def _cover_and_match_2level(pages, act, cap, block_cap, kernel=False,
                            interpret=False):
    """Two-level distinct-page extraction (see _cover_and_match).

    kernel=True runs the WHOLE plan (block scan + tile merge + pixel match)
    as one Pallas kernel (VMEM-resident; bit-identical outputs —
    tests/test_texcache.py)."""
    tiles, g, blocks, _ = pages.shape
    if kernel:
        caps_t = cap if isinstance(cap, tuple) else (cap,) * g
        cap_max = max(caps_t)
        if cap_max <= 128:
            page_list128, cnt128, pix_slot, cov = _fused_cover_pallas(
                pages, act, caps_t, block_cap, cap_max, interpret
            )
            return (page_list128[..., :cap_max], cnt128[..., 0],
                    pix_slot, cov != 0)
    if kernel:
        candA, slotA_k = _block_cover_pallas(pages, act, block_cap, interpret)
        candA = candA.reshape(tiles, g, blocks, block_cap)
        slotA = slotA_k
        foundA = slotA_k < block_cap
    else:
        valsA = jnp.where(act, pages, SENTINEL)

        def stepA(carry, k):
            vals, slot, found = carry
            m = vals.min(axis=-1)                      # (tiles, g, blocks)
            hit = pages == m[..., None]
            live = (m != SENTINEL)[..., None]
            slot = jnp.where(hit & live, k, slot)
            found = found | (hit & live)
            vals = jnp.where(hit, SENTINEL, vals)
            return (vals, slot, found), m

        initA = (valsA, jnp.zeros(pages.shape, jnp.int32),
                 jnp.zeros(pages.shape, bool))
        (_, slotA, foundA), candA = jax.lax.scan(
            stepA, initA, jnp.arange(block_cap, dtype=jnp.int32)
        )
        candA = jnp.moveaxis(candA, 0, -1)             # (tiles, g, blocks, B)

    # tile level: sort-based distinct extraction over the block candidates
    # (blocks*B elements — 3 short sorts beat a cap-step min-scan ~2x).
    # `cap` may be per-group (tuple of g ints): ranks are cap-independent,
    # so per-group budgets just change the rank cutoffs.
    cand = candA.reshape(tiles, g, blocks * block_cap)
    if isinstance(cap, tuple):
        cap_arr = jnp.asarray(cap, jnp.int32)[None, :]
        cap_max = max(cap)
    else:
        cap_arr = jnp.full((1, g), cap, jnp.int32)
        cap_max = cap
    page_list, count, slotB, foundB = _distinct_by_sort(
        cand, cap_max, cap_arr
    )
    slotB = slotB.reshape(tiles, g, blocks, block_cap)
    foundB = foundB.reshape(tiles, g, blocks, block_cap)

    # per-pixel result: select its block candidate's tile slot/coverage
    # (B-way select, no large intermediates)
    if kernel:
        pix_slot, pix_cov = _pix_match_pallas(
            slotA, slotB, foundB, block_cap, interpret
        )
    else:
        pix_slot = jnp.zeros(pages.shape, jnp.int32)
        pix_cov = jnp.zeros(pages.shape, bool)
        for b in range(block_cap):
            m = slotA == b
            pix_slot = jnp.where(m, slotB[..., b, None], pix_slot)
            pix_cov = pix_cov | (m & foundB[..., b, None])
    return page_list, count, pix_slot, pix_cov & foundA & act


# --------------------------------------------------------------- kernel ----
def _resolve_group(off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref, fy_ref,
                   t, g, *, blocks):
    """Resolve one (group)'s bilinear tap against its staged-page span:
    (4, blocks, 128) storage-space rgba."""
    base = off_ref[t, g]
    rec = rec_ref[0, g]                        # (blocks, 128)
    seg = rec >> 7
    lane = rec & 127
    lane4 = jnp.broadcast_to(
        lane[None], (SEG_CHUNK * 4, blocks, 128)
    ).reshape(SEG_CHUNK * 4 * blocks, 128)

    def chunk_body(c, quad, base=base, seg=seg, lane4=lane4):
        rows = tbl_ref[
            0, pl.ds(pl.multiple_of(base * 4 + c * (SEG_CHUNK * 4),
                                    SEG_CHUNK * 4), SEG_CHUNK * 4)
        ]                                      # (CHUNK*4, 128)
        x = jnp.broadcast_to(
            rows[:, None, :], (SEG_CHUNK * 4, blocks, 128)
        ).reshape(SEG_CHUNK * 4 * blocks, 128)
        gat = jnp.take_along_axis(x, lane4, axis=1)
        gat = gat.reshape(SEG_CHUNK, 4, blocks, 128)
        sel = jnp.zeros((4, blocks, 128), jnp.int32)
        local = seg - c * SEG_CHUNK
        for sg in range(SEG_CHUNK):
            sel = jnp.where((local == sg)[None], gat[sg], sel)
        hit = (local >= 0) & (local < SEG_CHUNK)
        return jnp.where(hit[None], sel, quad)

    n_chunks = (cnt_ref[t, g] + SEG_CHUNK - 1) // SEG_CHUNK
    quad = jax.lax.fori_loop(
        0, n_chunks, chunk_body,
        jnp.zeros((4, blocks, 128), jnp.int32),
    )
    fx = fx_ref[0, g]
    fy = fy_ref[0, g]
    comps = []
    for c in range(4):
        tc = [
            ((quad[k] >> (8 * c)) & 0xFF).astype(jnp.float32)
            * (1.0 / 255.0)
            for k in range(4)
        ]
        # same association order as gbuffer._sample_mip_bilinear
        comps.append(
            tc[0] * (1 - fx) * (1 - fy)
            + tc[1] * fx * (1 - fy)
            + tc[2] * (1 - fx) * fy
            + tc[3] * fx * fy
        )
    return jnp.stack(comps, 0)                 # (4, blocks, 128)


def _resolve_slot(off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref, fy_ref, tl_ref,
                  t, s, *, blocks, trilinear):
    """Resolve one material slot's tap(s) against the staged pages: the
    trilinear-blended (4, blocks, 128) storage-space rgba. Shared by the
    rgba-output kernel (_kernel) and the fused resolve+shade kernel."""
    n_halves = 2 if trilinear else 1
    acc = None
    for hi in range(n_halves):
        rgba = _resolve_group(off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref,
                              fy_ref, t, hi * 5 + s, blocks=blocks)
        if not trilinear:
            acc = rgba
        else:
            frac = tl_ref[0, s][None]
            acc = rgba * (1 - frac) if hi == 0 else acc + rgba * frac
    return acc


def _fill_cascade(casc, off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref, fy_ref,
                  t, blocks):
    """Resolve the 5 LOD-clamp cascade groups (the mip+3 re-taps that
    replace avg-color fallbacks for uncovered taps) into VMEM scratch —
    gated per tile on the prefetched any-cascade flag, so clean tiles pay
    nothing. casc = (sel_ref, casc_ref, n_groups); cascade groups live at
    indices n_groups-5..n_groups-1, and cnt column n_groups is the flag."""
    sel_ref, casc_ref, n_groups = casc
    casc_ref[...] = jnp.zeros(casc_ref.shape, jnp.float32)

    @pl.when(cnt_ref[t, n_groups] != 0)
    def _():
        for s in range(5):
            casc_ref[s] = _resolve_group(
                off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref, fy_ref,
                t, n_groups - 5 + s, blocks=blocks,
            )


def _kernel(off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref, fy_ref, tl_ref,
            *rest, blocks, trilinear, cascade):
    """Per tile: resolve all (5 slots x halves) taps against staged pages.

    off: (tiles, G[+1]) group start rows in the compact staged block (scalar
         prefetch; SEG_CHUNK-aligned — demand-shaped layout, not cap-shaped)
    cnt: (tiles, G[+1]) page counts (scalar prefetch; with cascade, column G
         is the per-tile any-cascade flag)
    tbl: (1, B*4, 128) i32 — page p channel c at row p*4+c
    rec/fx/fy: (1, G, blocks, 128); tl: (1, 5, blocks, 128)
    out: (1, 5, 4, blocks, 128) f32 storage-space rgba
    cascade adds: sel (1, 5, blocks, 128) input + (5, 4, blocks, 128) VMEM
    scratch; taps with sel read the mip+3 cascade resolve instead.
    """
    t = pl.program_id(0)
    if cascade:
        sel_ref, out_ref, casc_ref = rest
        casc = (sel_ref, casc_ref, rec_ref.shape[1])
        _fill_cascade(casc, off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref,
                      fy_ref, t, blocks)
    else:
        (out_ref,) = rest
    for s in range(5):
        acc = _resolve_slot(
            off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref, fy_ref, tl_ref,
            t, s, blocks=blocks, trilinear=trilinear,
        )
        if cascade:
            acc = jnp.where(sel_ref[0, s][None] != 0, casc_ref[s], acc)
        out_ref[0, s] = acc


def _resolve_shade_kernel(off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref, fy_ref,
                          tl_ref, attr_ref, flag_ref, *rest,
                          blocks, trilinear, cascade):
    """Resolve all texture taps AND evaluate the full G-buffer pixel shade
    (gbuffer.hlsl ps_main :89-148) in one kernel — the round-4 fusion that
    removes the rgba untile, the XLA shade chain, and the sRGB pass from the
    frame (docs/PERF.md round-4).

    attr: (1, 17, blocks, 128) f32 — planes channels 2..18 of the raster
          kernel's output: [nrm(3), tan(3), mat_albedo(3), emission,
          roughness, metallic, use(5)]
    flag: (1, 6, blocks, 128) i32 — [srgb per slot (5), coverage mask]
    gb_out: (1, 9, blocks, 128) f32 — [albedo(3), emission, oct(2),
            roughness, metallic, ao], RGBA8-quantized and mask-zeroed —
            exactly gbuffer._shade_from_interp's GBufferA/B/C channels.
    cascade adds: sel (1, 5, blocks, 128) input + (5, 4, blocks, 128) VMEM
    scratch (see _fill_cascade).
    """
    t = pl.program_id(0)
    if cascade:
        sel_ref, gb_out, casc_ref = rest
        casc = (sel_ref, casc_ref, rec_ref.shape[1])
        _fill_cascade(casc, off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref,
                      fy_ref, t, blocks)
    else:
        (gb_out,) = rest

    def eotf(c):
        # common.srgb_eotf, channel-at-a-time
        c = jnp.clip(c, 0.0, 1.0)
        return jnp.where(c <= 0.04045, c / 12.92,
                         jnp.power((c + 0.055) / 1.055, 2.4))

    def gamma(c):
        return jnp.power(jnp.maximum(c, 0.0), 2.2)

    samples = []
    for s in range(5):
        rgba = _resolve_slot(
            off_ref, cnt_ref, tbl_ref, rec_ref, fx_ref, fy_ref, tl_ref,
            t, s, blocks=blocks, trilinear=trilinear,
        )                                          # (4, blocks, 128)
        if cascade:
            rgba = jnp.where(sel_ref[0, s][None] != 0, casc_ref[s], rgba)
        srgb_s = flag_ref[0, s] != 0
        rgb = [jnp.where(srgb_s, eotf(rgba[c]), rgba[c]) for c in range(3)]
        samples.append(rgb + [rgba[3]])

    mask = flag_ref[0, 5] != 0

    def norm3(x, y, z):
        n = jnp.sqrt((x * x + y * y) + z * z)
        inv = 1.0 / jnp.maximum(n, 1e-20)
        return x * inv, y * inv, z * inv

    a = attr_ref[0]                                # (17, blocks, 128)
    nx, ny, nz = norm3(a[0], a[1], a[2])
    tx, ty, tz = norm3(a[3], a[4], a[5])

    albedo_tex = samples[0][:3]
    normal_tex = samples[1][:3]
    metallic_tex = samples[2][0]
    roughness_tex = samples[3][0]
    ao_tex = samples[4][0]

    use = [a[12 + i] > 0.5 for i in range(5)]

    # normal mapping: TBN with bitangent = cross(N, T) (gbuffer.hlsl:63-69)
    bx = ny * tz - nz * ty
    by = nz * tx - nx * tz
    bz = nx * ty - ny * tx
    sx_, sy_, sz_ = (normal_tex[0] * 2.0 - 1.0, normal_tex[1] * 2.0 - 1.0,
                     normal_tex[2] * 2.0 - 1.0)
    mx = tx * sx_ + bx * sy_ + nx * sz_
    my = ty * sx_ + by * sy_ + ny * sz_
    mz = tz * sx_ + bz * sy_ + nz * sz_
    mx, my, mz = norm3(mx, my, mz)
    wx = jnp.where(use[1], mx, nx)
    wy = jnp.where(use[1], my, ny)
    wz = jnp.where(use[1], mz, nz)

    albedo = [jnp.where(use[0], gamma(albedo_tex[c]), gamma(a[6 + c]))
              for c in range(3)]
    roughness = jnp.where(use[3], roughness_tex, a[10])
    metallic = jnp.where(use[2], metallic_tex, a[11])
    # AO defaults to 0 when unmapped (gbuffer.hlsl:135-138) — reference quirk
    ao = jnp.where(use[4], ao_tex, 0.0)
    emission = a[9]

    # common.encode_octahedron, channel form
    ssum = jnp.abs(wx) + jnp.abs(wy) + jnp.abs(wz)
    dx, dy, dz = wx / ssum, wy / ssum, wz / ssum

    def nz_sign(x):
        return jnp.where(x < 0, -1.0, 1.0)

    fx0 = nz_sign(dx) * (1.0 - jnp.abs(dy))
    fy0 = nz_sign(dy) * (1.0 - jnp.abs(dx))
    ox = jnp.where(dz < 0, fx0, dx) * 0.5 + 0.5
    oy = jnp.where(dz < 0, fy0, dy) * 0.5 + 0.5

    def q8(x):
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) * (1.0 / 255.0)

    chans = [albedo[0], albedo[1], albedo[2], emission, ox, oy,
             roughness, metallic, ao]
    out = jnp.stack([jnp.where(mask, q8(c), 0.0) for c in chans], 0)
    gb_out[0] = out


# ----------------------------------------------------------------- api -----
@functools.partial(
    jax.jit,
    static_argnames=("filter", "tile_h", "tile_w", "cap_lo", "cap_hi",
                     "block_cap", "interpret", "stage_budget", "cascade",
                     "cascade_caps"),
)
def sample_atlas_tiled(
    atlas: gbuffer.AtlasDevice,
    tex,        # (H, W, 5) int32 >= 0
    u,          # (H, W)
    v,          # (H, W)
    lod,        # (H, W, 5) f32
    active,     # (H, W, 5) bool — taps that must be resolved
    filter: str = "trilinear",
    tile_h: int = 24,
    tile_w: int = 128,
    cap_lo: int = 92,
    cap_hi: int = 44,
    block_cap: int | tuple | None = 16,
    interpret: bool = False,
    stage_budget: int | None = None,
    cascade: bool = False,
    cascade_caps: tuple = (20, 8, 3),
):
    """Kernel-path sampling. Returns (rgba (H, W, 5, 4) storage-space,
    covered (H, W, 5) bool, approx (H, W, 5) bool).

    `covered` taps are exact (bit-equal to the XLA sampler); `approx` taps
    overflowed the tile's page budget — they resolve at the texture's
    coarsest mip (its average color), or, with `cascade`, at a mip_lo+3
    re-tap (a mild blur — see _plan_and_stage), the graceful-degradation
    modes of a real texture cache. A tap can additionally overflow the
    CAP_FB fallback budget (5+ distinct textures in one (tile, slot) group —
    adversarial content); those taps read the group's first staged fallback
    page instead. All kinds are counted in `approx` so the honesty counter
    never under-reports."""
    height, width = u.shape
    trilinear = filter != "bilinear"
    p = tile_h * tile_w
    blocks = -(-p // 128)
    blocks += (-blocks) % 8

    u5 = jnp.broadcast_to(u[..., None], tex.shape)
    v5 = jnp.broadcast_to(v[..., None], tex.shape)

    def tile_g(x):  # (H, W, 5) -> (tiles, 5, blocks, 128)
        return _tile(jnp.moveaxis(x, -1, 0), tile_h, tile_w, blocks)

    (off_arr, cnts, staged, rec_t, fx_t, fy_t, tl_t, covered_t,
     sel_t) = _plan_and_stage(
        atlas, tile_g(tex), tile_g(u5), tile_g(v5), tile_g(lod),
        tile_g(active), trilinear=trilinear, cap_lo=cap_lo, cap_hi=cap_hi,
        block_cap=block_cap, stage_budget=stage_budget, interpret=interpret,
        cascade=cascade, cap_casc=cascade_caps[0],
        block_cap_casc=cascade_caps[1],
        casc_mip=cascade_caps[2] if len(cascade_caps) > 2 else 3,
    )

    g = rec_t.shape[1]
    B = staged.shape[1] // 4
    n_tiles = rec_t.shape[0]
    kernel = functools.partial(
        _kernel, blocks=blocks, trilinear=trilinear, cascade=cascade,
    )
    spec_g = pl.BlockSpec((1, g, blocks, 128), lambda t, *_: (t, 0, 0, 0))
    spec_5 = pl.BlockSpec((1, 5, blocks, 128), lambda t, *_: (t, 0, 0, 0))
    in_specs = [
        pl.BlockSpec((1, B * 4, 128), lambda t, *_: (t, 0, 0)),
        spec_g, spec_g, spec_g, spec_5,
    ]
    args = [off_arr, cnts, staged, rec_t, fx_t, fy_t, tl_t]
    scratch = []
    if cascade:
        in_specs.append(spec_5)
        args.append(sel_t)
        scratch = [pltpu.VMEM((5, 4, blocks, 128), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 5, 4, blocks, 128), lambda t, *_: (t, 0, 0, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, 5, 4, blocks, 128), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

    rgba = jnp.moveaxis(_untile(out, height, width, tile_h, tile_w), (0, 1),
                        (2, 3))                        # (H, W, 5, 4)
    covered = jnp.moveaxis(
        _untile(covered_t, height, width, tile_h, tile_w), 0, -1
    )
    # approx also counts fb-budget overflows (see docstring)
    return rgba, covered, active & ~covered


def _plan_and_stage(atlas, tex_t, u_t, v_t, lod_t, act_t, *, trilinear,
                    cap_lo, cap_hi, block_cap, stage_budget, interpret,
                    cascade=False, cap_casc=12, block_cap_casc=4,
                    casc_mip=3):
    """The texture cache's per-frame PLAN in tiled layout: mip selection,
    tap addressing, page covers, and the compact staged-page block.

    All per-pixel inputs are (tiles, 5, blocks, 128) — either `_tile`d from
    (H, W, 5) images (sample_atlas_tiled) or reshaped for free from the
    raster kernel's (tiles, p, 24) plane blocks (the fused G-buffer path,
    which never materializes an (H, W) layout between raster and shade).

    With `cascade`, 5 extra groups plan a LOD-clamp re-tap at mip_lo+3 for
    the taps whose primary cover overflowed (what a HW texture cache does
    when a mip isn't resident): 64x fewer pages per footprint, so the
    overflow regions resolve at a mild blur instead of the coarsest-mip
    average. The cascade only covers pre-budget-uncovered taps, so clean
    tiles plan empty cascade groups (skipped by the cover kernel's
    empty-group gate and the resolve kernel's per-tile flag).

    Returns (off_arr (tiles, G), cnts (tiles, G[+1]; with cascade the last
    column is the per-tile any-cascade flag), staged (tiles, B*4, 128) i32
    page block, rec/fx/fy (tiles, G, blocks, 128) tap records,
    tl (tiles, 5, blocks, 128) trilinear fracs,
    covered (tiles, 5, blocks, 128) bool exact-tap mask,
    sel (tiles, 5, blocks, 128) i32 cascade-resolve mask or None)."""
    n_tiles, _, blocks, _ = tex_t.shape
    # group caps must be SEG_CHUNK-aligned so chunked sweeps stay in-bounds
    assert (cap_lo + CAP_FB) % SEG_CHUNK == 0
    assert (cap_hi + CAP_FB) % SEG_CHUNK == 0
    assert (cap_casc + CAP_FB) % SEG_CHUNK == 0

    base_w, base_h, pb, fb_page0, mips, tfrac_t, n_mips_t = _mip_plan(
        atlas, tex_t, lod_t, trilinear
    )

    # guaranteed fallback tap: the coarsest mip (1x1 — the texture's average
    # color). Addressing at w == h == 1 needs no further table data.
    fb_fx_t = (u_t - 0.5) - jnp.floor(u_t - 0.5)
    fb_fy_t = (v_t - 0.5) - jnp.floor(v_t - 0.5)
    fb_list, _, fb_slot_t, fb_found = _cover_and_match(
        fb_page0, act_t, CAP_FB, block_cap=CAP_FB,
        kernel=True, interpret=interpret,
    )

    # per-group page table layout: [fallback pages (CAP_FB) | cover (cap)],
    # so the chunked sweep bound is simply CAP_FB + count.
    # block_cap may be per-half (lo, hi): the measured row overflow lives in
    # the LO half (its texel footprints are 4x the hi half's), so spending
    # block capacity asymmetrically buys lo-half coverage at a fraction of
    # the uniform-raise merge cost (the rank-matrix merge is O(block_cap^2)
    # per half, and each half runs its own cover kernel).
    bc_halves = (block_cap if isinstance(block_cap, tuple)
                 else (block_cap, block_cap))
    halves = []
    for i, (m, cap) in enumerate(zip(mips, (cap_lo, cap_hi))):
        page, intra, fx, fy = _tap_addresses(
            base_w, base_h, select_mip(pb, m), m, u_t, v_t
        )
        page_list, count, slot, found = _cover_and_match(
            page, act_t, cap, block_cap=bc_halves[i],
            kernel=True, interpret=interpret,
        )
        halves.append((page_list, count, slot, intra, fx, fy, found))

    groups = list(halves)
    caps_list = list((cap_lo, cap_hi)[: len(halves)])
    if cascade:
        foundall = halves[0][6]
        for h in halves[1:]:
            foundall = foundall & h[6]
        # casc_mip trades blur for page footprint: +1 halves each dim (~4x
        # fewer pages; near-trilinear fidelity — the exact tap's hi half),
        # +3 is 64x fewer pages at a mild blur
        mip_c = jnp.minimum(mips[0] + casc_mip, n_mips_t - 1)
        page_c, intra_c, fx_c, fy_c = _tap_addresses(
            base_w, base_h, select_mip(pb, mip_c), mip_c, u_t, v_t
        )
        act_c = act_t & ~foundall
        pl_c, cnt_c, slot_c, found_c = _cover_and_match(
            page_c, act_c, cap_casc, block_cap=block_cap_casc,
            kernel=True, interpret=interpret,
        )
        groups.append((pl_c, cnt_c, slot_c, intra_c, fx_c, fy_c, found_c))
        caps_list.append(cap_casc)

    # a tap is exact only if EVERY mip half made its cover (and fits the
    # staged budget, below); otherwise the WHOLE tap resolves via the
    # fallback page (never a half-blend), so `approx` taps are exactly the
    # coarsest-mip average color — or, with `cascade`, the mip_lo+3 re-tap
    # where THAT cover held
    # ---- compact (demand-shaped) staging layout --------------------------
    # Realized demand is heavy-tailed (reference scene @1080p: mean ~5
    # pages/group vs the 92-page cap — tools/tap_census.py), so the staged
    # block packs each group's [fb(4)|cover(count)] at a dynamic
    # SEG_CHUNK-aligned offset under a per-tile budget B instead of staging
    # cap-shaped spans: the 2 KB-row staging gather shrinks ~4-7x at the
    # census-recommended budget and the kernel's VMEM block with it. Offsets
    # ride the scalar-prefetch path; a group whose span no longer fits is
    # truncated (its over-slot taps fall back, counted in `approx`), and the
    # sequential clamp below reserves SEG_CHUNK rows per group so the 4
    # fallback pages ALWAYS fit — budget pressure can degrade taps to the
    # coarsest-mip average but never to garbage reads.
    n_halves = len(halves)
    G = len(groups) * 5

    def align8(x):
        return -(-x // SEG_CHUNK) * SEG_CHUNK

    span_max_h = [align8(CAP_FB + c) for c in caps_list]
    full_budget = 5 * sum(span_max_h)
    B = full_budget if stage_budget is None else min(stage_budget, full_budget)
    assert B % SEG_CHUNK == 0 and B >= SEG_CHUNK * G

    counts_all = jnp.concatenate([h[1] for h in groups], axis=1)  # (tiles, G)
    span_want = align8(CAP_FB + counts_all)
    offs, spans = [], []
    off = jnp.zeros((n_tiles,), jnp.int32)
    for gi in range(G):
        reserve = SEG_CHUNK * (G - 1 - gi)
        s_eff = jnp.minimum(span_want[:, gi], B - off - reserve)
        offs.append(off)
        spans.append(s_eff)
        off = off + s_eff
    off_arr = jnp.stack(offs, axis=1)                  # (tiles, G)
    span_arr = jnp.stack(spans, axis=1)
    count_eff = jnp.minimum(counts_all, span_arr - CAP_FB)

    # budget truncation joins the cover condition: a tap is exact only if its
    # page made the cover AND the cover slot still fits the staged span
    covered_t = None
    for hi, h in enumerate(halves):
        ce = count_eff[:, hi * 5:(hi + 1) * 5][..., None, None]
        f = h[6] & (h[2] < ce)
        covered_t = f if covered_t is None else covered_t & f

    cnts, recs, fxs, fys, ids_fullG = [], [], [], [], []
    span_maxG = max(span_max_h)
    sel_t = None
    for hi, (page_list, count, slot, intra_t, fx_t1, fy_t1, found) in \
            enumerate(groups):
        if hi < n_halves:
            ok = covered_t
        else:
            # cascade group: resolve where its own cover held (budget-fit)
            ce_c = count_eff[:, hi * 5:(hi + 1) * 5][..., None, None]
            ok = found & (slot < ce_c)
            sel_t = (ok & act_t & ~covered_t).astype(jnp.int32)
        recs.append(jnp.where(ok, (CAP_FB + slot) * 128 + intra_t,
                              fb_slot_t * 128))
        fxs.append(jnp.where(ok, fx_t1, fb_fx_t))
        fys.append(jnp.where(ok, fy_t1, fb_fy_t))
        idg = jnp.concatenate([fb_list, page_list], axis=-1)
        pad = span_maxG - idg.shape[-1]
        if pad:
            idg = jnp.pad(idg, ((0, 0), (0, 0), (0, pad)))
        ids_fullG.append(idg)
        cnts.append(CAP_FB + count_eff[:, hi * 5:(hi + 1) * 5])
    rec_t = jnp.concatenate(recs, axis=1)
    fx_t = jnp.concatenate(fxs, axis=1)
    fy_t = jnp.concatenate(fys, axis=1)
    cnts = jnp.concatenate(cnts, axis=1)               # (tiles, G)
    if cascade:
        # per-tile any-cascade flag rides the scalar-prefetch counts so the
        # resolve kernel skips the 5 cascade sweeps on clean tiles
        casc_any = sel_t.reshape(n_tiles, -1).any(axis=1).astype(jnp.int32)
        cnts = jnp.concatenate([cnts, casc_any[:, None]], axis=1)
    ids_fullG = jnp.concatenate(ids_fullG, axis=1)     # (tiles, G, span_maxG)

    # pack: scatter each group's rows to its offset (unique destinations by
    # construction; truncated rows land on the dump column B, sliced off)
    j = jnp.arange(span_maxG, dtype=jnp.int32)
    dst = off_arr[..., None] + j
    dst = jnp.where(j[None, None, :] < span_arr[..., None], dst, B)
    ids = jnp.zeros((n_tiles, B + 1), jnp.int32).at[
        jnp.arange(n_tiles, dtype=jnp.int32)[:, None, None], dst
    ].set(ids_fullG)[:, :B]

    # stage: one gather of 2 KB page rows, then channel-major for the kernel
    n_pages = atlas.data.shape[0] // 128
    pages_view = atlas.data.reshape(n_pages, 128, 4)
    staged = jnp.take(pages_view, ids.reshape(-1), axis=0)
    staged = staged.reshape(n_tiles, B, 128, 4).transpose(0, 1, 3, 2)
    staged = jax.lax.bitcast_convert_type(
        staged.reshape(n_tiles, B * 4, 128), jnp.int32
    )

    return (off_arr, cnts, staged, rec_t, fx_t, fy_t, tfrac_t, covered_t,
            sel_t)


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "tile_h", "tile_w", "filter",
                     "cap_lo", "cap_hi", "block_cap", "interpret",
                     "stage_budget", "cascade", "cascade_caps",
                     "return_tiled"),
)
def shade_planes_fused(
    atlas: gbuffer.AtlasDevice,
    pl_tiles,       # (tiles, p, 24) raster-kernel plane blocks (pre-untile)
    id_tiles,       # (tiles, p, 1) winning triangle ids (-1 = background)
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    filter: str = "trilinear",
    cap_lo: int = 92,
    cap_hi: int = 44,
    block_cap: int | tuple | None = 16,
    interpret: bool = False,
    stage_budget: int | None = None,
    cascade: bool = False,
    cascade_caps: tuple = (20, 8, 3),
    return_tiled: bool = False,
):
    """The fused G-buffer back half: raster plane blocks -> final quantized
    G-buffer planes, never materializing an (H, W) layout in between.

    Replaces gbuffer_shade_planar's chain [untile planes -> XLA tap
    math/LOD -> re-tile for the cache -> resolve kernel -> untile rgba ->
    XLA shade] with [free reshapes + ONE channel transpose -> plan (tiled)
    -> resolve+shade kernel -> ONE 9-channel untile]. Tap addressing, cover
    semantics, and shade math are the same formulas in the same order as
    the planar path (tests pin equivalence), so covered taps remain
    bit-equal to the XLA sampler.

    Returns (gb9 (9, H, W) f32 [albedo(3), emission, oct(2), roughness,
    metallic, ao], approx_count () int32); with return_tiled=True, returns
    (gb_tiles (tiles, 9, blocks, 128), approx_count) — the raw kernel tile
    blocks, which the fused deferred-shading path (ops/shade_pallas.py)
    consumes without untiling."""
    trilinear = filter != "bilinear"
    n_tiles, p, _ = pl_tiles.shape
    blocks0 = p // 128
    wb = tile_w // 128  # lane-blocks per screen row of the tile
    assert p % 128 == 0 and tile_w % 128 == 0 and tile_h % 2 == 0, (
        tile_h, tile_w)
    blocks = blocks0 + (-blocks0) % 8

    # (tiles, p, 24) -> (tiles, 24, blocks, 128): one real transpose; the
    # reshape is free (p is row-major y*tile_w + x, tile_w a multiple of 128,
    # so 128 consecutive pixels ARE a lane row)
    planes_t = pl_tiles.reshape(n_tiles, blocks0, 128, 24).transpose(
        0, 3, 1, 2
    )
    mask_t = id_tiles.reshape(n_tiles, 1, blocks0, 128) >= 0

    uv_t = jnp.where(mask_t, planes_t[:, 0:2], 0.0)    # (tiles, 2, b0, 128)
    use_t = planes_t[:, 14:19] > 0.5
    tex_t = jnp.maximum(planes_t[:, 19:24].astype(jnp.int32), 0)
    act_t = use_t & mask_t

    # quad-derivative LOD (gbuffer.tap_lod), computed in tiled layout: tile
    # origins are even in both axes, so 2x2 quads never straddle tiles and
    # the pairs match the full-frame _quad_derivatives exactly
    ddx = uv_t.reshape(n_tiles, 2, blocks0 * 64, 2)
    ddx = jnp.broadcast_to(
        (ddx[..., 1:2] - ddx[..., 0:1]), ddx.shape
    ).reshape(uv_t.shape)
    # y-pairs are screen rows 2k/2k+1 = blocks b and b+wb in the row-major
    # (tile_h, wb) block grid
    ddy = uv_t.reshape(n_tiles, 2, tile_h // 2, 2, wb * 128)
    ddy = jnp.broadcast_to(
        (ddy[..., 1:2, :] - ddy[..., 0:1, :]), ddy.shape
    ).reshape(uv_t.shape)
    size5 = onehot_lookup(atlas.base_size.astype(jnp.float32), tex_t)
    gx_u = ddx[:, 0][:, None] * size5[..., 0]
    gx_v = ddx[:, 1][:, None] * size5[..., 1]
    gy_u = ddy[:, 0][:, None] * size5[..., 0]
    gy_v = ddy[:, 1][:, None] * size5[..., 1]
    rx2 = gx_u * gx_u + gx_v * gx_v
    ry2 = gy_u * gy_u + gy_v * gy_v
    rho2 = jnp.maximum(rx2, ry2)                       # (tiles, 5, b0, 128)
    lod_t = 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))
    lod_t = jnp.where(mask_t, lod_t, 99.0)

    def pad_b(x, fill=0):
        if blocks == blocks0:
            return x
        cfg = [(0, 0)] * (x.ndim - 2) + [(0, blocks - blocks0), (0, 0)]
        return jnp.pad(x, cfg, constant_values=fill)

    u5_t = jnp.broadcast_to(uv_t[:, 0][:, None], tex_t.shape)
    v5_t = jnp.broadcast_to(uv_t[:, 1][:, None], tex_t.shape)
    (off_arr, cnts, staged, rec_t, fx_t, fy_t, tl_t, covered_t,
     sel_t) = _plan_and_stage(
        atlas, pad_b(tex_t), pad_b(u5_t), pad_b(v5_t), pad_b(lod_t),
        pad_b(act_t), trilinear=trilinear, cap_lo=cap_lo, cap_hi=cap_hi,
        block_cap=block_cap, stage_budget=stage_budget, interpret=interpret,
        cascade=cascade, cap_casc=cascade_caps[0],
        block_cap_casc=cascade_caps[1],
        casc_mip=cascade_caps[2] if len(cascade_caps) > 2 else 3,
    )

    srgb5 = onehot_lookup(atlas.srgb.astype(jnp.float32)[:, None], tex_t)
    flags = jnp.concatenate(
        [(srgb5[..., 0] > 0.5).astype(jnp.int32),
         mask_t.astype(jnp.int32)], axis=1,
    )                                                  # (tiles, 6, b0, 128)
    attrs = planes_t[:, 2:19]                          # (tiles, 17, b0, 128)

    g = rec_t.shape[1]
    B = staged.shape[1] // 4
    kernel = functools.partial(
        _resolve_shade_kernel, blocks=blocks, trilinear=trilinear,
        cascade=cascade,
    )
    spec_g = pl.BlockSpec((1, g, blocks, 128), lambda t, *_: (t, 0, 0, 0))
    spec_5 = pl.BlockSpec((1, 5, blocks, 128), lambda t, *_: (t, 0, 0, 0))
    in_specs = [
        pl.BlockSpec((1, B * 4, 128), lambda t, *_: (t, 0, 0)),
        spec_g, spec_g, spec_g, spec_5,
        pl.BlockSpec((1, 17, blocks, 128), lambda t, *_: (t, 0, 0, 0)),
        pl.BlockSpec((1, 6, blocks, 128), lambda t, *_: (t, 0, 0, 0)),
    ]
    args = [off_arr, cnts, staged, pad_b(rec_t), pad_b(fx_t), pad_b(fy_t),
            pad_b(tl_t), pad_b(attrs), pad_b(flags)]
    scratch = []
    if cascade:
        in_specs.append(spec_5)
        args.append(sel_t)
        scratch = [pltpu.VMEM((5, 4, blocks, 128), jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 9, blocks, 128), lambda t, *_: (t, 0, 0, 0)
        ),
        scratch_shapes=scratch,
    )
    gb_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, 9, blocks, 128), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

    approx_count = (
        pad_b(act_t) & ~covered_t
    ).sum(dtype=jnp.int32)
    if return_tiled:
        return gb_tiles[:, :, :blocks0], approx_count
    gb9 = _untile(gb_tiles, height, width, tile_h, tile_w)  # (9, H, W)
    return gb9, approx_count


def sample_atlas_textured(
    atlas: gbuffer.AtlasDevice,
    tex, u, v, lod, active,
    filter: str = "trilinear",
    block_cap: int | tuple | None = 16,
    interpret: bool = False,
    cap_lo: int = 92,
    cap_hi: int = 44,
    stage_budget: int | None = None,
    cascade: bool = False,
    cascade_caps: tuple = (20, 8, 3),
):
    """Drop-in replacement for gbuffer.sample_atlas_trilinear: exact for
    covered taps (>99.4% at 1080p, typically 100% at test sizes), coarsest-mip
    average for page-budget overflows. Returns ((H, W, 5, 4) rgba with sRGB
    applied, approx (H, W, 5) overflow-tap mask for stats)."""
    height, width = u.shape
    tile = pick_tile(height, width)
    if tile is None:
        rgba = gbuffer.sample_atlas_trilinear(
            atlas, tex, u[..., None], v[..., None], lod, filter=filter
        )
        return rgba, jnp.zeros(tex.shape, bool)
    rgba, covered, approx = sample_atlas_tiled(
        atlas, tex, u, v, lod, active,
        filter=filter, tile_h=tile[0], tile_w=tile[1], block_cap=block_cap,
        interpret=interpret, cap_lo=cap_lo, cap_hi=cap_hi,
        stage_budget=stage_budget, cascade=cascade,
        cascade_caps=cascade_caps,
    )
    # sRGB flag via a tiny one-hot matmul (no per-pixel gather)
    srgb = onehot_lookup(atlas.srgb.astype(jnp.float32)[:, None], tex)
    srgb = srgb[..., 0] > 0.5
    from . import common

    lin = common.srgb_eotf(rgba[..., :3])
    rgb = jnp.where(srgb[..., None], lin, rgba[..., :3])
    return jnp.concatenate([rgb, rgba[..., 3:]], -1), approx


# ------------------------------------------------------------- census -----
def tap_census(
    atlas: gbuffer.AtlasDevice,
    tex, u, v, lod, active,
    filter: str = "trilinear",
    tile_h: int | None = None,
    tile_w: int | None = None,
    cap_lo: int = 92,
    cap_hi: int = 44,
):
    """Measure realized distinct-page demand per (tile, slot, mip-half).

    The cache's page budgets (`cap_lo`/`cap_hi`) shape BOTH the per-frame
    staging gather (budget x 2 KB x tiles) and the cover kernel's merge cost,
    so over-provisioned caps are pure waste: the defaults (92/44) are sized
    for worst-case content while the reference scene realizes ~1/3 of that.
    This host-side probe runs the exact kernel addressing (`_mip_plan` +
    `_tap_addresses`) over a frame's tap stream and reports, for each
    trilinear half, the max / p99 distinct pages over all (tile, slot)
    groups plus a SEG_CHUNK-aligned recommended cap. Feed the result into
    `RenderConfig.tex_cap_lo/hi` (tools/tap_census.py drives it end to end).

    Under-provisioned caps degrade gracefully (coarsest-mip average color,
    counted by the `tex_approx` honesty stat) — recommendations add the
    caller-visible headroom so camera motion within a scene stays covered.
    """
    import numpy as np

    height, width = u.shape
    if tile_h is None or tile_w is None:
        t = pick_tile(height, width)
        if t is None:
            raise ValueError(f"no cache tiling for {width}x{height}")
        tile_h, tile_w = t
    trilinear = filter != "bilinear"
    p = tile_h * tile_w
    blocks = -(-p // 128)
    blocks += (-blocks) % 8

    u5 = jnp.broadcast_to(u[..., None], tex.shape)
    v5 = jnp.broadcast_to(v[..., None], tex.shape)
    base_w, base_h, pb, _fb, mips, _tf, _nm = _mip_plan(atlas, tex, lod,
                                                       trilinear)

    def tile_g(x):  # (H, W, 5) -> (tiles, 5, blocks, 128)
        return _tile(jnp.moveaxis(x, -1, 0), tile_h, tile_w, blocks)

    act_t = tile_g(active)
    out = {}
    tile_spans = None
    for name, m in zip(("lo", "hi"), mips):
        page, _, _, _ = _tap_addresses(base_w, base_h, select_mip(pb, m), m,
                                       u5, v5)
        pg = jnp.where(act_t, tile_g(page), SENTINEL)
        tiles_n, g = pg.shape[:2]
        flat = jnp.sort(pg.reshape(tiles_n * g, blocks * 128), axis=-1)
        first = flat[:, :1] != SENTINEL
        rest = (flat[:, 1:] != flat[:, :-1]) & (flat[:, 1:] != SENTINEL)
        counts = np.asarray(first.sum(-1) + rest.sum(-1))  # (tiles*g,)
        # per-128px-row distinct pages: what the two-level cover's
        # `block_cap` must hold (rows beyond it lose coverage -> fallback).
        # The cover kernel's rank-matrix merge is O((blocks*block_cap)^2),
        # so a measured block_cap is a direct VPU-cost lever.
        rows = jnp.sort(pg.reshape(tiles_n * g * blocks, 128), axis=-1)
        rfirst = rows[:, :1] != SENTINEL
        rrest = (rows[:, 1:] != rows[:, :-1]) & (rows[:, 1:] != SENTINEL)
        rcounts = np.asarray(rfirst.sum(-1) + rrest.sum(-1))
        out[name] = {
            "max": int(counts.max()),
            "p99": int(np.percentile(counts, 99)),
            "mean": float(counts.mean()),
            "row_max": int(rcounts.max()),
            "row_p999": int(np.percentile(rcounts, 99.9)),
        }
        # per-group staged span in the compact layout: [fb|cover] rounded to
        # the SEG_CHUNK sweep granularity. Demand is CAPPED at the group cap
        # first — the staged span never exceeds cap+CAP_FB regardless of raw
        # demand (over-cap taps already resolve via the counted fallback),
        # so budgets sized from uncapped tails would overshoot the full
        # cap-shaped layout and the knob would be a no-op.
        cap_g = cap_lo if name == "lo" else cap_hi
        capped = np.minimum(counts.reshape(tiles_n, g), cap_g)
        span = -(-(CAP_FB + capped) // SEG_CHUNK) * SEG_CHUNK
        tile_spans = span if tile_spans is None else tile_spans + span
        if not trilinear:
            out["hi"] = {"max": 0, "p99": 0, "mean": 0.0}
    totals = tile_spans.sum(-1)                        # (tiles,)
    out["tile_total"] = {
        "max": int(totals.max()),
        "p99": int(np.percentile(totals, 99)),
        "mean": float(totals.mean()),
    }
    return out


def recommend_caps(census_frames, headroom: float = 1.5):
    """Fold per-frame `tap_census` results into (cap_lo, cap_hi).

    Takes the max demand over all sampled frames, multiplies by `headroom`
    (camera poses between samples), and aligns so (cap + CAP_FB) is a
    SEG_CHUNK multiple as `sample_atlas_tiled` requires. Never exceeds the
    built-in defaults (92/44) — beyond those the defaults are already the
    measured worst-case-content sizing."""
    def align(demand, default):
        want = -(-(int(demand * headroom) + CAP_FB) // SEG_CHUNK) * SEG_CHUNK
        return max(SEG_CHUNK - CAP_FB, min(want - CAP_FB, default))

    max_lo = max(c["lo"]["max"] for c in census_frames)
    max_hi = max(c["hi"]["max"] for c in census_frames)
    return align(max_lo, 92), align(max_hi, 44)


def recommend_block_caps(census_frames, headroom: int = 2,
                         lo_max: int = 40, hi_max: int = 24):
    """Fold per-frame `tap_census` results into a per-half (block_cap_lo,
    block_cap_hi) for the two-level cover.

    Sizes from the measured p99.9 per-128px-row distinct-page demand plus
    `headroom` rows (the max is usually a handful of outlier rows that the
    LOD-clamp cascade resolves at near-trilinear quality, so chasing it
    buys O(block_cap^2) merge cost for ~nothing). Clamped to the measured
    practical ranges — the lo half's footprints are 4x the hi half's."""
    def size(key, cap):
        want = max(c[key]["row_p999"] for c in census_frames) + headroom
        return int(max(8, min(-(-want // 4) * 4, cap)))

    return size("lo", lo_max), size("hi", hi_max)


def recommend_budget(census_frames, headroom: float = 1.5) -> int:
    """Compact-staging per-tile page budget from `tap_census` results.

    Demand is heavy-tailed (reference scene @1080p: mean ~5 pages/group vs
    the 92-page worst-case cap), so staging shaped by the realized per-tile
    TOTAL span is ~4-7x smaller than cap-shaped staging. Returns a
    SEG_CHUNK-aligned budget ≥ the worst sampled tile total x headroom."""
    worst = max(c["tile_total"]["max"] for c in census_frames)
    b = -(-int(worst * headroom) // SEG_CHUNK) * SEG_CHUNK
    return max(b, 16 * SEG_CHUNK)
