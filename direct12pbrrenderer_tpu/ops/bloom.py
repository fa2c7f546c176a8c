"""Bloom: threshold prefilter + separable-Gaussian mip pyramid + merge.

Reproduces the reference's exact pass sequence (BloomPass::Execute,
DeferredPipeline.cpp:400-570, shaders bloom_prefilter / blur_horizontal /
blur_vertical / bloom_upsample_add / bloom_merge):

  A[1] = Prefilter(S)                       (half res, threshold+knee+firefly)
  for i in 0..2: B[i+2] = DownH(A[i+1]); A[i+2] = DownV(B[i+2])
  for i in 2..0: B[i+1] = UpH(A[i+1]) + UpH(A[i+2]^); A[i+1] = UpV(B[i+1])
  B[0] = UpH(A[1]^); A[0] = UpV(B[0]); out = S + A[0]

Every resampling in the reference is a LinearClamp bilinear fetch at a fixed
half-integer phase, so the whole chain lowers to pad+slice arithmetic — zero
gathers, fully fusible by XLA (the groupshared-cache blur kernels become
shifted adds). The 9-tap weights are blur.hlsli:17.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import BLOOM_KNEE, BLOOM_STEPS, BLOOM_THRESHOLD, GAUSS_WEIGHTS
from . import common

_W = jnp.asarray(GAUSS_WEIGHTS, jnp.float32)
_R = 4


def _shift(img, dy, dx):
    """Clamp-to-edge shifted view (the LinearClamp sampling analog)."""
    h, w = img.shape[0], img.shape[1]
    pad = max(abs(dy), abs(dx))
    p = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    return p[pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def blur_h(img):
    """9-tap horizontal Gaussian, same resolution, clamp addressing."""
    return sum(_W[i + _R] * _shift(img, 0, i) for i in range(-_R, _R + 1))


def blur_v(img):
    return sum(_W[i + _R] * _shift(img, i, 0) for i in range(-_R, _R + 1))


def _rows_halfavg(img):
    """0.5*(img[2y+1] + img[2y+2]) with edge clamp -> (h/2, w, c)."""
    h = img.shape[0]
    p = jnp.pad(img, ((0, 1), (0, 0), (0, 0)), mode="edge")
    return 0.5 * (p[1::2][: h // 2] + p[2::2][: h // 2])


def _cols_halfavg(img):
    w = img.shape[1]
    p = jnp.pad(img, ((0, 0), (0, 1), (0, 0)), mode="edge")
    return 0.5 * (p[:, 1::2][:, : w // 2] + p[:, 2::2][:, : w // 2])


def downsample_blur_h(img):
    """blur_horizontal sampling a 2x-larger input at the half-res uv grid
    (BloomPass downsample step): vertical 2-row average, then taps at even
    column offsets with a half-texel phase."""
    rows = _rows_halfavg(img)  # (h/2, w, c)
    w_out = img.shape[1] // 2
    h2 = rows.shape[0]
    p = jnp.pad(rows, ((0, 0), (2 * _R + 1, 2 * _R + 1), (0, 0)), mode="edge")

    def tap(i):
        # input columns (2x+1+2i, 2x+2+2i), offset by pad
        base = 2 * _R + 1 + 1 + 2 * i
        cols = p[:, base : base + 2 * w_out]
        return 0.5 * (cols[:, 0::2] + cols[:, 1::2])

    return sum(_W[i + _R] * tap(i) for i in range(-_R, _R + 1))


def _upsample2x_h(img, out_w):
    """Bilinear 2x horizontal upsample at the D3D half-phase:
    out[2k] = 0.25*in[k-1] + 0.75*in[k]; out[2k+1] = 0.75*in[k] + 0.25*in[k+1]."""
    p = jnp.pad(img, ((0, 0), (1, 1), (0, 0)), mode="edge")
    w_in = img.shape[1]
    even = 0.25 * p[:, 0:w_in] + 0.75 * p[:, 1 : w_in + 1]
    odd = 0.75 * p[:, 1 : w_in + 1] + 0.25 * p[:, 2 : w_in + 2]
    out = jnp.stack([even, odd], axis=2).reshape(img.shape[0], 2 * w_in, -1)
    return out[:, :out_w]


def _upsample2x_v(img, out_h):
    p = jnp.pad(img, ((1, 1), (0, 0), (0, 0)), mode="edge")
    h_in = img.shape[0]
    even = 0.25 * p[0:h_in] + 0.75 * p[1 : h_in + 1]
    odd = 0.75 * p[1 : h_in + 1] + 0.25 * p[2 : h_in + 2]
    out = jnp.stack([even, odd], axis=1).reshape(2 * h_in, img.shape[1], -1)
    return out[:out_h]


def upsample2x(img, out_h, out_w):
    return _upsample2x_v(_upsample2x_h(img, out_w), out_h)


def bloom_threshold(color, threshold=BLOOM_THRESHOLD, knee=BLOOM_KNEE):
    """Soft-knee bright-pass (bloom_prefilter.hlsl:16-26)."""
    brightness = color.max(axis=-1, keepdims=True)
    soft = jnp.clip(brightness - threshold + threshold * knee, 0.0, 2 * threshold * knee)
    soft = soft * soft / (4 * threshold * knee + 1e-5)
    contribution = jnp.maximum(soft, brightness - threshold) / jnp.maximum(
        brightness, 1e-5
    )
    return color * contribution


def prefilter(img):
    """bloom_prefilter at half resolution: 5-tap cross of 2x2 corner averages,
    luma-weighted to suppress fireflies (bloom_prefilter.hlsl:30-53).

    Sample positions: uv = xy * texel (no half offset) -> each tap is the
    bilinear blend of full-res texels (2x-1..2x, 2y-1..2y); diagonal offsets
    are ±1 half-res texel = ±2 full-res texels = ±1 in corner-average space.
    """
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    p = jnp.pad(img, ((1, 0), (1, 0), (0, 0)), mode="edge")[: img.shape[0] + 1, : img.shape[1] + 1]
    corners = 0.25 * (
        p[0:-1:2, 0:-1:2] + p[0:-1:2, 1::2] + p[1::2, 0:-1:2] + p[1::2, 1::2]
    )[:h2, :w2]

    offsets = [(0, 0), (-1, -1), (-1, 1), (1, -1), (1, 1)]
    total = jnp.zeros_like(corners)
    weight = jnp.zeros(corners.shape[:2] + (1,), corners.dtype)
    for dy, dx in offsets:
        c = bloom_threshold(_shift(corners, dy, dx))
        wgt = 1.0 / (common.luminance(c)[..., None] + 1.0)
        total = total + c * wgt
        weight = weight + wgt
    return total / jnp.maximum(weight, 1e-20)


def bloom(hdr):
    """Full bloom chain; hdr (H, W, 3) -> (H, W, 3) with bloom added."""
    h, w = hdr.shape[0], hdr.shape[1]
    # downsample: a[m] is the blurred pyramid level at (h>>m, w>>m)
    a = {1: prefilter(hdr)}
    for i in range(BLOOM_STEPS):
        m = i + 1
        a[m + 1] = blur_v(downsample_blur_h(a[m]))
    # upsample-add
    for i in range(BLOOM_STEPS - 1, -1, -1):
        m = i + 1
        hh, ww = h >> m, w >> m
        up = blur_h(a[m]) + blur_h(upsample2x(a[m + 1], hh, ww))
        a[m] = blur_v(up)
    # merge at full res
    full = blur_v(blur_h(upsample2x(a[1], h, w)))
    return hdr + full
