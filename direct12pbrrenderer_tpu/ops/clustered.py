"""Clustered light culling.

Re-expresses `clustered_compute.hlsl` + `clustered_culling.hlsl` as dense
vectorized ops: view-space cluster AABBs in closed form (exponential z
slicing), then a sphere-vs-AABB test over the full (clusters, lights) grid
with the per-cluster light list built by masked cumsum (no atomics — the
InterlockedAdd compaction becomes a prefix sum, same order: light index
ascending, exactly like the reference's sequential i loop).

Cluster grid: 24 x 16 x 8, z-major-contiguous index (clustered.hlsli:39-43),
<= 32 lights per cluster, <= 1024 scene lights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    CLUSTER_X,
    CLUSTER_Y,
    CLUSTER_Z,
    CULLING_RADIUS_COEFFICIENT,
    MAX_LIGHTS_PER_CLUSTER,
)

NUM_CLUSTERS = CLUSTER_X * CLUSTER_Y * CLUSTER_Z


def cluster_bounds(fov: float, ratio: float, near: float, far: float) -> np.ndarray:
    """(NUM_CLUSTERS, 2, 3) view-space AABBs (clustered_compute.hlsl:21-42).

    Static per camera config — computed host-side once (the reference
    re-dispatches the same computation every frame).
    """
    xs = np.arange(CLUSTER_X)
    ys = np.arange(CLUSTER_Y)
    zs = np.arange(CLUSTER_Z)
    tan_half = np.tan(fov / 2)

    def zplane_intersection(ndc_x, ndc_y, view_z):
        ray = np.stack(
            [
                ndc_x * ratio * tan_half * near,
                ndc_y * tan_half * near,
                np.broadcast_to(near, ndc_x.shape),
            ],
            -1,
        )
        t = view_z / ray[..., 2]
        return ray * t[..., None]

    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")  # (X, Y, Z)
    znear = near * (far / near) ** (gz / CLUSTER_Z)
    zfar = near * (far / near) ** ((gz + 1) / CLUSTER_Z)
    min_ndc_x = 2 * gx / CLUSTER_X - 1
    min_ndc_y = 2 * gy / CLUSTER_Y - 1
    max_ndc_x = 2 * (gx + 1) / CLUSTER_X - 1
    max_ndc_y = 2 * (gy + 1) / CLUSTER_Y - 1

    p = [
        zplane_intersection(min_ndc_x, min_ndc_y, znear),
        zplane_intersection(min_ndc_x, min_ndc_y, zfar),
        zplane_intersection(max_ndc_x, max_ndc_y, znear),
        zplane_intersection(max_ndc_x, max_ndc_y, zfar),
    ]
    mn = np.minimum(np.minimum(p[0], p[1]), np.minimum(p[2], p[3]))
    mx = np.maximum(np.maximum(p[0], p[1]), np.maximum(p[2], p[3]))
    # cluster index = z + x*Z + y*X*Z (clustered.hlsli:39-43)
    bounds = np.zeros((NUM_CLUSTERS, 2, 3), np.float32)
    idx = gz + gx * CLUSTER_Z + gy * CLUSTER_X * CLUSTER_Z
    bounds[idx.ravel(), 0] = mn.reshape(-1, 3)
    bounds[idx.ravel(), 1] = mx.reshape(-1, 3)
    return bounds


@jax.jit
def cull_lights_to_clusters(
    bounds,          # (C, 2, 3) view-space cluster AABBs
    view,            # (4, 4)
    light_pos,       # (L, 3) world
    light_radius,    # (L,) attenuation radius
    light_intensity, # (L,)
    light_valid,     # (L,) bool
):
    """-> (cluster_lights (C, 32) int32 [-1 pad], counts (C,)).

    clustered_culling.hlsl:19-39: culling radius = 1.814 * r * sqrt(I),
    sphere-vs-AABB in view space, per-cluster list capped at 32 in light
    index order.
    """
    ph = jnp.concatenate([light_pos, jnp.ones_like(light_pos[:, :1])], -1)
    pos_view = jnp.dot(ph, view.T, precision=jax.lax.Precision.HIGHEST)[:, :3]
    cull_r = light_radius * CULLING_RADIUS_COEFFICIENT * jnp.sqrt(light_intensity)

    mn = bounds[:, 0][:, None, :]  # (C, 1, 3)
    mx = bounds[:, 1][:, None, :]
    closest = jnp.clip(pos_view[None, :, :], mn, mx)  # (C, L, 3)
    d = pos_view[None, :, :] - closest
    hit = (d * d).sum(-1) < (cull_r * cull_r)[None, :]
    hit = hit & light_valid[None, :]

    pos = jnp.cumsum(hit, axis=1) - hit.astype(jnp.int32)  # exclusive prefix
    counts = jnp.minimum(hit.sum(axis=1), MAX_LIGHTS_PER_CLUSTER).astype(jnp.int32)
    write = hit & (pos < MAX_LIGHTS_PER_CLUSTER)
    slot = jnp.where(write, pos, MAX_LIGHTS_PER_CLUSTER)
    c = bounds.shape[0]
    l = light_pos.shape[0]
    lists = jnp.full((c, MAX_LIGHTS_PER_CLUSTER + 1), -1, jnp.int32)
    light_ids = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32)[None, :], (c, l))
    lists = lists.at[jnp.arange(c)[:, None], slot].set(
        jnp.where(write, light_ids, -1), mode="drop"
    )
    return lists[:, :MAX_LIGHTS_PER_CLUSTER], counts


def build_cluster_light_params(
    cluster_lists,   # (C, 32) int32 from cull_lights_to_clusters
    light_pos, light_color, light_intensity, light_attenuation,
):
    """(C, 32, 12) per-cluster light parameter rows:
    [pos(3), color(3), intensity, kc, kl, kq, valid, pad].

    Pre-gathers light data at cluster rate (C*32 fetches) so the shading pass
    fetches ONE contiguous 1.5KB row per pixel instead of ~10 scattered
    gathers per light — the TPU analog of the reference's StructuredBuffer
    locality (Cluster.LightIndex -> PointLights[] indirections)."""
    lvalid = cluster_lists >= 0
    lidx = jnp.maximum(cluster_lists, 0)
    params = jnp.concatenate(
        [
            light_pos[lidx],
            light_color[lidx],
            light_intensity[lidx][..., None],
            light_attenuation[lidx][..., 1:4],
            lvalid[..., None].astype(jnp.float32),
            jnp.zeros(lidx.shape + (1,), jnp.float32),
        ],
        axis=-1,
    )
    return params


def build_active_lights(
    light_pos, light_color, light_intensity, light_attenuation, light_valid,
    view, max_active: int,
):
    """Compact the visible lights into (max_active, 14) rows for the shading
    loop: [pos_w(3), color(3), intensity, kc, kl, kq, pos_view(3), cull_r].
    Index order preserved (cap-truncation semantics follow light order, like
    the reference's sequential culling loop). Padding rows have cull_r = 0.
    """
    l = light_pos.shape[0]
    ph = jnp.concatenate([light_pos, jnp.ones_like(light_pos[:, :1])], -1)
    pos_view = jnp.dot(ph, view.T, precision=jax.lax.Precision.HIGHEST)[:, :3]
    cull_r = (
        light_attenuation[:, 0] * CULLING_RADIUS_COEFFICIENT
        * jnp.sqrt(jnp.maximum(light_intensity, 0.0))
    )
    rows = jnp.concatenate(
        [
            light_pos, light_color, light_intensity[:, None],
            light_attenuation[:, 1:4], pos_view,
            jnp.where(light_valid, cull_r, 0.0)[:, None],
        ],
        axis=1,
    )  # (L, 14)
    score = jnp.where(light_valid, l - jnp.arange(l, dtype=jnp.int32), 0)
    if l < max_active:
        score = jnp.pad(score, (0, max_active - l))
    top, _ = jax.lax.top_k(score, max_active)
    ids = jnp.where(top > 0, l - top, 0)
    out = rows[jnp.minimum(ids, l - 1)]
    return jnp.where((top > 0)[:, None], out, 0.0)


def cluster_index_image(uv_x, uv_y, z_view, near: float, far: float):
    """Per-pixel cluster index (clustered.hlsli:45-59). uv origin top-left."""
    sx = jnp.clip(jnp.floor(uv_x * CLUSTER_X), 0, CLUSTER_X - 1).astype(jnp.int32)
    sy = jnp.clip(jnp.floor((1.0 - uv_y) * CLUSTER_Y), 0, CLUSTER_Y - 1).astype(jnp.int32)
    zc = jnp.clip(z_view, near, far)
    sz = jnp.clip(
        (CLUSTER_Z * jnp.log(zc / near) / np.log(far / near)).astype(jnp.int32),
        0,
        CLUSTER_Z - 1,
    )
    return sz + sx * CLUSTER_Z + sy * CLUSTER_X * CLUSTER_Z
