"""Microfacet / Fresnel / thin-film shading primitives.

Vectorized equivalents of ``pathtracer/rendering/pbr_utils.cuh`` (and the
transmission-Smith helper of ``path_logic.cuh:33-42``), term for term, so the
integrator's radiometry matches the reference within PSNR tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp

from ptrt_tpu.core.vec import PI, TWO_PI, Vec3, clamp01

def fresnel_schlick(cos_theta, f0: Vec3) -> Vec3:
    """``pbr_utils.cuh:16-22``."""
    c = clamp01(cos_theta)
    f = 1.0 - c
    f5 = (f * f) * (f * f) * f
    return f0 + (Vec3.full(1.0) - f0) * f5


def fresnel_schlick_roughness(cos_theta, f0: Vec3, roughness) -> Vec3:
    """``pbr_utils.cuh:24-35``."""
    c = clamp01(cos_theta)
    f = 1.0 - c
    f5 = (f * f) * (f * f) * f
    mr = 1.0 - roughness
    max_refl = Vec3(jnp.maximum(mr, f0.x), jnp.maximum(mr, f0.y),
                    jnp.maximum(mr, f0.z))
    return f0 + (max_refl - f0) * f5


def distribution_ggx(n: Vec3, h: Vec3, roughness) -> jnp.ndarray:
    """``pbr_utils.cuh:37-48``."""
    a = roughness * roughness
    a2 = a * a
    ndoth = jnp.maximum(n.dot(h), 0.0)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    denom = PI * denom * denom
    return a2 / jnp.maximum(denom, 1e-6)


def distribution_ggx_fast(ndoth, a2) -> jnp.ndarray:
    """``pbr_utils.cuh:50-54``."""
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom + 1e-6)


def geometry_schlick_ggx(ndotv, roughness) -> jnp.ndarray:
    """``pbr_utils.cuh:56-62``."""
    r = roughness + 1.0
    k = (r * r) * 0.125
    return ndotv / (ndotv * (1.0 - k) + k + 1e-6)


def geometry_smith(n: Vec3, v: Vec3, l: Vec3, roughness) -> jnp.ndarray:
    """``pbr_utils.cuh:64-72``."""
    ndotv = jnp.maximum(n.dot(v), 0.0)
    ndotl = jnp.maximum(n.dot(l), 0.0)
    return geometry_schlick_ggx(ndotl, roughness) * geometry_schlick_ggx(
        ndotv, roughness)


def geometry_smith_transmission(n: Vec3, v: Vec3, l: Vec3,
                                roughness) -> jnp.ndarray:
    """abs-NdotL Smith for BTDF lobes (``path_logic.cuh:33-42``)."""
    ndotv = jnp.maximum(n.dot(v), 0.0)
    ndotl = jnp.abs(n.dot(l))
    return geometry_schlick_ggx(ndotl, roughness) * geometry_schlick_ggx(
        ndotv, roughness)


def calculate_iridescence(thickness, cos_theta, film_ior=1.3,
                          base_ior=1.5) -> Vec3:
    """Thin-film interference at 650/550/450 nm
    (``pbr_utils.cuh:85-125``)."""
    c = clamp01(cos_theta)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - c * c))
    sin_film = sin_theta / film_ior
    tir = sin_film * sin_film > 1.0
    cos_film = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_film * sin_film))
    opd = 2.0 * film_ior * thickness * cos_film

    r_af = ((1.0 - film_ior) / (1.0 + film_ior)) ** 2
    r_fb = ((film_ior - base_ior) / (film_ior + base_ior)) ** 2
    sqrt_r1r2 = jnp.sqrt(r_af * r_fb)
    r_max = (jnp.sqrt(r_af) + jnp.sqrt(r_fb)) ** 2
    inv_r_max = 1.0 / (r_max + 1e-6)

    out = []
    for wavelength in (650.0, 550.0, 450.0):
        delta = TWO_PI * opd / wavelength
        r_total = r_af + r_fb + 2.0 * sqrt_r1r2 * jnp.cos(delta)
        out.append(jnp.clip(r_total * inv_r_max, 0.0, 1.0))
    res = Vec3(*out)
    ones = Vec3.full(jnp.ones_like(c))
    return Vec3(jnp.where(tir, ones.x, res.x), jnp.where(tir, ones.y, res.y),
                jnp.where(tir, ones.z, res.z))


def schlick_dielectric(cos_theta, ior_i, ior_t) -> jnp.ndarray:
    """``pbr_utils.cuh:127-138``."""
    c = clamp01(cos_theta)
    r0 = (ior_i - ior_t) / (ior_i + ior_t)
    r0 = r0 * r0
    f = 1.0 - c
    f5 = (f * f) * (f * f) * f
    return r0 + (1.0 - r0) * f5


def schlick_dielectric_one_ior(cos_theta, ior) -> jnp.ndarray:
    """``pbr_utils.cuh:146-149``."""
    return schlick_dielectric(cos_theta, 1.0, ior)


def beer_lambert(absorption: Vec3, dist) -> Vec3:
    """exp(-sigma * t) (``pbr_utils.cuh:155-162``)."""
    c = Vec3(jnp.maximum(absorption.x, 0.0), jnp.maximum(absorption.y, 0.0),
             jnp.maximum(absorption.z, 0.0))
    return (-c * dist).exp()


def log_safe(v: Vec3) -> Vec3:
    """``pbr_utils.cuh:140-144``."""
    eps = 1e-12
    return Vec3(jnp.log(jnp.maximum(v.x, eps)), jnp.log(jnp.maximum(v.y, eps)),
                jnp.log(jnp.maximum(v.z, eps)))
