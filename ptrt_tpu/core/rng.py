"""Vectorized counter-based RNG + importance-sampling routines.

Replaces the reference's per-pixel ``curandState`` array and ``FastRNG`` PCG
(``pathtracer/math/sampling.cuh:45-70``).  State is a plain ``uint32`` array
(one lane per ray/pixel) threaded functionally: every draw returns
``(new_state, sample)``.  The generator is the identical PCG output function
the reference uses, so sample quality matches; there is no curand on TPU and
none is needed.

All sampling routines operate on Vec3 SoA batches
(``sampling.cuh:105-227`` equivalents).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import TWO_PI, Vec3, cross, where


# -- PCG core ---------------------------------------------------------------


def seed(x: jnp.ndarray, y: jnp.ndarray, frame) -> jnp.ndarray:
    """Hash pixel coords + frame into an initial state
    (``sampling.cuh:52-56``), then advance twice to decorrelate."""
    x = jnp.asarray(x, jnp.uint32)
    y = jnp.asarray(y, jnp.uint32)
    f = jnp.asarray(frame, jnp.uint32)
    state = (
        (x * jnp.uint32(1973))
        ^ (y * jnp.uint32(9277))
        ^ (f * jnp.uint32(26699))
        ^ jnp.uint32(0x9E3779B9)
    )
    state, _ = uniform(state)
    state, _ = uniform(state)
    return state


def fold(state: jnp.ndarray, salt) -> jnp.ndarray:
    """Derive a decorrelated sub-stream: golden-ratio salt mix + one PCG
    advance.  Used to give each spp sample its own stream when a frame's
    samples are traced as ONE wavefront instead of a sequential spp loop."""
    s = jnp.asarray(state, jnp.uint32) ^ (
        jnp.asarray(salt, jnp.uint32) * jnp.uint32(0x9E3779B9))
    s, _ = uniform(s)
    return s


def uniform(state: jnp.ndarray):
    """One PCG step -> float32 in [0, 1) (``sampling.cuh:59-64``)."""
    state = state * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * jnp.uint32(
        277803737
    )
    word = (word >> jnp.uint32(22)) ^ word
    return state, word.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


def uniform2(state: jnp.ndarray):
    state, u1 = uniform(state)
    state, u2 = uniform(state)
    return state, u1, u2


# -- orthonormal basis ------------------------------------------------------


def ortho_normal_basis(n: Vec3):
    """Frisvad-style tangent frame (``sampling.cuh:73-91``).

    Branchless vector version: degenerate normals fall back to the canonical
    frame via a select rather than an early-out.
    """
    len2 = n.dot(n)
    inv = jax.lax.rsqrt(jnp.maximum(len2, 1e-30))
    nn = n * inv
    s = jnp.where(nn.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + nn.z)
    b = nn.x * nn.y * a
    t = Vec3(1.0 + s * nn.x * nn.x * a, s * b, -s * nn.x)
    bt = cross(nn, t)
    degenerate = len2 < 1e-20
    t = where(degenerate, Vec3(1.0, 0.0, 0.0), t)
    bt = where(degenerate, Vec3(0.0, 1.0, 0.0), bt)
    return t, bt


def hemisphere_to_world(sample: Vec3, n: Vec3) -> Vec3:
    """Local-hemisphere direction into the frame of N
    (``sampling.cuh:159-164``)."""
    t, b = ortho_normal_basis(n)
    return t * sample.x + b * sample.y + n * sample.z


# -- direction sampling -----------------------------------------------------


def sample_cosine_hemisphere(state):
    """Cosine-weighted local hemisphere sample (``sampling.cuh:141-147``)."""
    state, u1, u2 = uniform2(state)
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    return state, Vec3(
        r * jnp.cos(phi), r * jnp.sin(phi), jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    )


def sample_unit_sphere(state):
    """Uniform sphere direction (``sampling.cuh:167-174``)."""
    state, u1, u2 = uniform2(state)
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return state, Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def sample_cone_direction(state, cone_dir: Vec3, cos_theta_max):
    """Uniform direction in a cone around ``cone_dir``
    (``sampling.cuh:105-120``) — soft-shadow sampling of spherical lights."""
    state, u1, u2 = uniform2(state)
    cos_theta = 1.0 - u1 * (1.0 - cos_theta_max)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = TWO_PI * u2
    local = Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    t, b = ortho_normal_basis(cone_dir)
    return state, t * local.x + b * local.y + cone_dir * local.z


def importance_sample_ggx(state, n: Vec3, roughness):
    """GGX half-vector importance sample (``sampling.cuh:187-208``)."""
    a = roughness * roughness
    a2 = a * a
    state, u1, u2 = uniform2(state)
    u2 = jnp.minimum(u2, 0.9999999)
    phi = TWO_PI * u1
    cos_theta = jnp.sqrt((1.0 - u2) / (1.0 + (a2 - 1.0) * u2))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    h = Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    return state, hemisphere_to_world(h, n)


# -- explicit-uniform variants ----------------------------------------------
# The branchless scatter kernel draws one (u1, u2) pair and feeds it to the
# per-lane-selected lobe sampler; these take the uniforms directly so RNG
# consumption stays uniform across lanes.


def cosine_hemisphere_from(u1, u2) -> Vec3:
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi),
                jnp.sqrt(jnp.maximum(0.0, 1.0 - u1)))


def ggx_half_vector_from(u1, u2, n: Vec3, roughness) -> Vec3:
    a = roughness * roughness
    a2 = a * a
    u2c = jnp.minimum(u2, 0.9999999)
    phi = TWO_PI * u1
    cos_theta = jnp.sqrt((1.0 - u2c) / (1.0 + (a2 - 1.0) * u2c))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    h = Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    return hemisphere_to_world(h, n)


def cone_direction_from(u1, u2, cone_dir: Vec3, cos_theta_max) -> Vec3:
    cos_theta = 1.0 - u1 * (1.0 - cos_theta_max)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = TWO_PI * u2
    local = Vec3(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    t, b = ortho_normal_basis(cone_dir)
    return t * local.x + b * local.y + cone_dir * local.z


def sample_unit_disk(state):
    """Polar-mapped unit-disk sample for depth of field.

    The reference rejection-samples (``camera.cuh:23-30``); the polar map has
    the identical distribution and is branch-free — the vector-native choice.
    """
    state, u1, u2 = uniform2(state)
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    return state, Vec3(r * jnp.cos(phi), r * jnp.sin(phi), jnp.zeros_like(r))
