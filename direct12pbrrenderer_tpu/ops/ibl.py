"""Image-based-lighting precompute: split-sum BRDF LUT + GGX-prefiltered
environment mip chain.

jax.numpy re-expression of `Shader/precompute_brdf.hlsl` and
`Shader/env_map_gen.hlsl`: identical Hammersley sequence, GGX importance
sampling, PDF-driven source-mip selection and NdotL weighting, but evaluated
as dense batched tensor ops (every output texel in parallel, samples streamed
through `lax.scan` so the working set stays resident) instead of one GPU
thread per texel. These run once per skybox (the reference latches them with
an `mReady` flag, DeferredPipeline.cpp:77-136) and are cached as device arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BRDF_LUT_SIZE, IBL_SAMPLE_COUNT, PREFILTER_ENVMAP_MIP_LEVELS
from . import common
from .common import PI, cubemap_face_dirs, geometry_smith, ggx_importance_sample, hammersley


@functools.partial(jax.jit, static_argnames=("size", "samples"))
def brdf_lut(size: int = BRDF_LUT_SIZE, samples: int = IBL_SAMPLE_COUNT) -> jnp.ndarray:
    """(size, size, 2) split-sum LUT; [y, x] = (NdotV row, roughness column).

    precompute_brdf.hlsl:23-61: roughness = x/(size-1); NdotV = (y+1)/size
    (zero excluded); k = roughness^2/2; A/B accumulated over `samples` GGX
    importance samples and averaged.
    """
    xi = jnp.asarray(hammersley(samples))  # (S, 2)
    roughness = (jnp.arange(size, dtype=jnp.float32) / (size - 1))[None, :]  # (1, size)
    n_dot_v = ((jnp.arange(size, dtype=jnp.float32) + 1.0) / size)[:, None]  # (size, 1)
    roughness = jnp.broadcast_to(roughness, (size, size))
    n_dot_v = jnp.broadcast_to(n_dot_v, (size, size))

    v = jnp.stack(
        [jnp.sqrt(1.0 - n_dot_v * n_dot_v), jnp.zeros_like(n_dot_v), n_dot_v], -1
    )  # (size, size, 3)
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), v.shape)

    def body(carry, xi_i):
        a_acc, b_acc = carry
        h = ggx_importance_sample(roughness, normal, xi_i)  # (size, size, 3)
        v_dot_h = jnp.maximum((v * h).sum(-1), 0.0)
        l = 2.0 * (v * h).sum(-1, keepdims=True) * h - v
        l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-20)
        n_dot_l = jnp.maximum(l[..., 2], 0.0)
        n_dot_h = jnp.maximum(h[..., 2], 0.0)

        fc = jnp.power(1.0 - v_dot_h, 5.0)
        k = roughness * roughness / 2.0
        g = geometry_smith(n_dot_l, n_dot_v, k)
        g_vis = g * v_dot_h / jnp.maximum(n_dot_h * n_dot_v, 1e-4)
        valid = n_dot_l > 0.0
        a_acc = a_acc + jnp.where(valid, (1.0 - fc) * g_vis, 0.0)
        b_acc = b_acc + jnp.where(valid, fc * g_vis, 0.0)
        return (a_acc, b_acc), None

    zero = jnp.zeros((size, size), jnp.float32)
    (a, b), _ = jax.lax.scan(body, (zero, zero), xi)
    return jnp.stack([a, b], -1) / samples


def build_cubemap_mips(faces: jnp.ndarray, mips: int) -> list[jnp.ndarray]:
    """Box-filtered mip chain of a (6, s, s, c) cubemap (per-face 2x2 mean)."""
    chain = [faces]
    for _ in range(mips - 1):
        f = chain[-1]
        s = f.shape[1] // 2
        f = f.reshape(6, s, 2, s, 2, f.shape[-1]).mean(axis=(2, 4))
        chain.append(f)
    return chain


@functools.partial(
    jax.jit, static_argnames=("out_size", "out_mips", "samples", "sample_chunk")
)
def prefilter_env_map(
    skybox_mips_stackable: tuple,
    out_size: int = 512,
    out_mips: int = PREFILTER_ENVMAP_MIP_LEVELS,
    samples: int = IBL_SAMPLE_COUNT,
    sample_chunk: int = 32,
) -> list[jnp.ndarray]:
    """GGX prefilter (env_map_gen.hlsl:50-104).

    skybox_mips_stackable: tuple of (6, s_m, s_m, 3) source mips (for the
    PDF-driven trilinear source lookup). Returns `out_mips` arrays of shape
    (6, out_size>>m, out_size>>m, 3).

    Mip 0 (roughness 0) is an exact identity: the GGX CDF collapses to H = N,
    L = R and source mip 0, so the shader's 1024 identical samples reduce to
    one bilinear fetch at the texel center == the texel itself.
    """
    src_mips = [jnp.asarray(m) for m in skybox_mips_stackable]
    xi_all = hammersley(samples)
    out = []
    for mip in range(out_mips):
        size = out_size >> mip
        roughness = mip / (out_mips - 1)
        dirs = jnp.asarray(cubemap_face_dirs(size))  # (6, s, s, 3)
        if mip == 0:
            out.append(common.sample_cubemap_bilinear(src_mips[0], dirs))
            continue
        n = dirs  # N = V = R
        texel_sa = 4.0 * PI / (6 * out_size * out_size)

        def body(carry, xi_chunk, n=n, roughness=roughness, texel_sa=texel_sa):
            color_acc, weight_acc = carry
            # xi_chunk: (C, 2) -> broadcast against texels (6, s, s)
            h = ggx_importance_sample(
                roughness, n[..., None, :], xi_chunk[None, None, None, :, :]
            )  # (6, s, s, C, 3)
            v = n[..., None, :]
            v_dot_h = (v * h).sum(-1, keepdims=True)
            l = 2.0 * v_dot_h * h - v
            l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-20)
            n_dot_l = jnp.maximum((n[..., None, :] * l).sum(-1), 0.0)  # (6,s,s,C)
            n_dot_h = jnp.maximum((n[..., None, :] * h).sum(-1), 0.0)
            h_dot_v = jnp.maximum(v_dot_h[..., 0], 0.0)

            d = common.distribution_ggx(n_dot_h, roughness)
            pdf = d * n_dot_h / (4.0 * h_dot_v + 1e-4)
            sample_sa = 1.0 / (samples * pdf + 1e-4)
            mip_level = 0.5 * jnp.log2(sample_sa / texel_sa)

            color = common.sample_cubemap_trilinear(src_mips, l, mip_level)  # (6,s,s,C,3)
            w = n_dot_l
            color_acc = color_acc + (color * w[..., None]).sum(-2)
            weight_acc = weight_acc + w.sum(-1)
            return (color_acc, weight_acc), None

        zero_c = jnp.zeros((6, size, size, 3), jnp.float32)
        zero_w = jnp.zeros((6, size, size), jnp.float32)
        xi_chunks = jnp.asarray(xi_all.reshape(samples // sample_chunk, sample_chunk, 2))
        (color, weight), _ = jax.lax.scan(body, (zero_c, zero_w), xi_chunks)
        out.append(color / jnp.maximum(weight[..., None], 1e-8))
    return out


def prefilter_env_map_from_texture(cubemap, out_size: int = 512, **kw) -> list[np.ndarray]:
    """Convenience: CubeMapTextureData -> prefiltered mips (numpy).

    Source mips come from the stored texture's own chain when present,
    otherwise a box-filtered chain is built (the reference samples the
    skybox's full hardware mip chain)."""
    base = jnp.asarray(
        np.stack([f.mip_array_rgba(0)[..., :3] for f in cubemap.faces]).astype(np.float32)
    )
    n_src_mips = int(np.log2(base.shape[1])) + 1
    src = build_cubemap_mips(base, n_src_mips)
    return [np.asarray(m) for m in prefilter_env_map(tuple(src), out_size=out_size, **kw)]
