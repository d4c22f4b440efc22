"""Bloom: soft-knee bright pass + blurred mip chain + upsample-add.

Conv-shaped rebuild of the reference's bloom kernels
(``scene_kernels.cuh:281-386`` and pipeline ``scene.cuh:1138-1183``):
bright pass with soft knee (threshold 1.5, knee 0.5), per-mip separable
5-tap Gaussian (weights 0.227027/0.316216/0.070270) with horizontal blur at
full rate and vertical blur fused into the 2x downsample, then bilinear
upsample-add back up the chain and onto the image.  On TPU each tap pattern
is a tiny convolution XLA fuses; no intermediate HBM round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3, lerp

BLOOM_MIP_LEVELS = 6  # scene.cuh:159
_W = (0.227027, 0.316216, 0.070270)


def bright_pass(c: Vec3, threshold: float = 1.5, knee: float = 0.5) -> Vec3:
    """``bloom_bright_pass_kernel`` (``scene_kernels.cuh:283-299``)."""
    brightness = c.max_component()
    soft_t = brightness - threshold + knee
    bloom = jnp.clip(soft_t / (2.0 * knee) + 0.5, 0.0, 1.0)
    return c * bloom


def _blur_h(img: Vec3) -> Vec3:
    """5-tap horizontal Gaussian with edge clamp
    (``bloom_blur_h_kernel``)."""

    def chan(a):
        out = a * _W[0]
        for i in (1, 2):
            left = jnp.concatenate(
                [jnp.repeat(a[:, :1], i, axis=1), a[:, :-i]], axis=1)
            right = jnp.concatenate(
                [a[:, i:], jnp.repeat(a[:, -1:], i, axis=1)], axis=1)
            out = out + (left + right) * _W[i]
        return out

    return img.map(chan)


def _downsample_v(img: Vec3) -> Vec3:
    """Vertical 5-tap blur fused with 2x decimation
    (``bloom_downsample_v_kernel``)."""
    h = img.x.shape[0]

    def chan(a):
        out = None
        ys = jnp.arange(h // 2) * 2
        for j in range(-2, 3):
            tap = jnp.clip(ys + j, 0, h - 1)
            term = a[tap, :] * _W[abs(j)]
            out = term if out is None else out + term
        # horizontal decimation: take every other column
        return out[:, ::2]

    return img.map(chan)


def _upsample_bilinear(img: Vec3, out_h: int, out_w: int) -> Vec3:
    """Bilinear 2x upsample matching ``bloom_upsample_add_kernel`` footprint."""
    in_h, in_w = img.x.shape

    u = (jnp.arange(out_w) + 0.5) / out_w * in_w - 0.5
    v = (jnp.arange(out_h) + 0.5) / out_h * in_h - 0.5
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    uf = u - x0
    vf = v - y0
    x1 = jnp.clip(x0 + 1, 0, in_w - 1)
    y1 = jnp.clip(y0 + 1, 0, in_h - 1)
    x0 = jnp.clip(x0, 0, in_w - 1)
    y0 = jnp.clip(y0, 0, in_h - 1)

    def chan(a):
        a00 = a[y0][:, x0]
        a10 = a[y0][:, x1]
        a01 = a[y1][:, x0]
        a11 = a[y1][:, x1]
        top = a00 + (a10 - a00) * uf[None, :]
        bot = a01 + (a11 - a01) * uf[None, :]
        return top + (bot - top) * vf[:, None]

    return img.map(chan)


def apply_bloom(hdr: Vec3, threshold: float = 1.5, knee: float = 0.5) -> Vec3:
    """Full bloom pipeline (``scene.cuh:1138-1183``)."""
    h, w = hdr.x.shape
    bright = bright_pass(hdr, threshold, knee)

    mips = []
    cur = bright
    ch, cw = h, w
    for _ in range(BLOOM_MIP_LEVELS):
        nh, nw = ch // 2, cw // 2
        if nh == 0 or nw == 0:
            break
        cur = _downsample_v(_blur_h(cur))
        mips.append(cur)
        ch, cw = nh, nw

    if not mips:
        return hdr

    # upsample-add up the chain (coarse -> fine)
    for i in range(len(mips) - 2, -1, -1):
        th, tw = mips[i].x.shape
        mips[i] = mips[i] + _upsample_bilinear(mips[i + 1], th, tw)

    return hdr + _upsample_bilinear(mips[0], h, w)
