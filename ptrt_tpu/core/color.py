"""Tonemapping and color-space conversion.

Matches ``pathtracer/rendering/render_utils.cuh:73-173`` term for term (the
fitted-matrix ACES, Reinhard, Uncharted2, and the sRGB approximations) so
golden-image comparisons against reference renders hold.
"""

from __future__ import annotations

import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3, clamp01

# ACES input/output matrices, row-major (``render_utils.cuh:78-84``).
_ACES_IN = (
    (0.59719, 0.35458, 0.04823),
    (0.07600, 0.90834, 0.01566),
    (0.02840, 0.13383, 0.83777),
)
_ACES_OUT = (
    (1.60475, -0.53108, -0.07367),
    (-0.10208, 1.10813, -0.00605),
    (-0.00327, -0.07276, 1.07602),
)


def _mul3(m, v: Vec3) -> Vec3:
    return Vec3(
        m[0][0] * v.x + m[0][1] * v.y + m[0][2] * v.z,
        m[1][0] * v.x + m[1][1] * v.y + m[1][2] * v.z,
        m[2][0] * v.x + m[2][1] * v.y + m[2][2] * v.z,
    )


def reinhard_tonemap(c: Vec3) -> Vec3:
    """color / (color + 1) (``render_utils.cuh:73-75``)."""
    return c / (c + 1.0)


def aces_tonemap(c: Vec3) -> Vec3:
    """Fitted ACES (``render_utils.cuh:77-95``)."""
    ac = _mul3(_ACES_IN, c)
    a = ac * (ac + 0.0245786) - 0.000090537
    b = ac * (ac * 0.983729 + 0.4329510) + 0.238081
    ac = clamp01(a / b)
    return clamp01(_mul3(_ACES_OUT, ac))


def _uncharted2_partial(x: Vec3) -> Vec3:
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return (x * (x * A + C * B) + D * E) / (x * (x * A + B) + D * F) - E / F


def uncharted2_tonemap(c: Vec3, exposure: float = 2.0) -> Vec3:
    """Uncharted2 filmic curve (``render_utils.cuh:97-113``)."""
    W = 11.2
    curr = _uncharted2_partial(c * exposure)
    white = _uncharted2_partial(Vec3.full(W))
    return curr * (Vec3.full(1.0) / white)


def linear_to_srgb(c: Vec3) -> Vec3:
    """pow(1/2.2) approximation (``render_utils.cuh:160-163``)."""
    g = 1.0 / 2.2
    m = c.map(lambda v: jnp.maximum(v, 0.0))
    return Vec3(m.x**g, m.y**g, m.z**g)


def srgb_to_linear(c: Vec3) -> Vec3:
    return Vec3(c.x**2.2, c.y**2.2, c.z**2.2)


def linear_to_srgb_fast(c: Vec3) -> Vec3:
    """sqrt approximation (``render_utils.cuh:169-173``)."""
    return Vec3(
        jnp.sqrt(jnp.maximum(0.0, c.x)),
        jnp.sqrt(jnp.maximum(0.0, c.y)),
        jnp.sqrt(jnp.maximum(0.0, c.z)),
    )


def srgb_oetf(c: Vec3) -> Vec3:
    """Exact sRGB transfer function used by the reference's tonemap kernel
    (``scene.cuh:2029-2039``): 12.92x below 0.0031308, else
    1.055 x^(1/2.4) - 0.055."""

    def chan(v):
        v = jnp.maximum(v, 0.0)
        return jnp.where(
            v <= 0.0031308, 12.92 * v,
            1.055 * jnp.power(v, 1.0 / 2.4) - 0.055)

    return Vec3(chan(c.x), chan(c.y), chan(c.z))


def to_rgb8(c: Vec3) -> jnp.ndarray:
    """Quantize a tonemapped [0,1] Vec3 image to HxWx3 uint8."""
    arr = jnp.stack(
        [jnp.asarray(c.x), jnp.asarray(c.y), jnp.asarray(c.z)], axis=-1
    )
    return jnp.clip(arr * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
