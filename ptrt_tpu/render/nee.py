"""Next-event estimation: direct-light sampling with shadow rays.

Vectorized ``sample_direct_lighting_with_mat`` / ``_split``
(``path_logic.cuh:305-488``): uniform light pick, cone sampling of spherical
(radius > 0) lights for soft shadows, range attenuation
``(range/(range+d))^2`` (``render_utils.cuh:21-24``), smooth spot cones, and
the transmissive-aware shadow any-hit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ptrt_tpu.core import rng as prng
from ptrt_tpu.core.vec import TWO_PI, Vec3, clamp_vector_soft, where
from ptrt_tpu.render.bsdf import evaluate_bsdf, evaluate_bsdf_split
from ptrt_tpu.scene.lights import LightTable, LightType

MAX_NEE_CONTRIBUTION = 500.0  # path_logic.cuh:28


def _take3(v: Vec3, idx):
    return Vec3(jnp.take(v.x, idx, axis=0), jnp.take(v.y, idx, axis=0),
                jnp.take(v.z, idx, axis=0))


def sample_light(state, lights: LightTable, n_lights: int, point: Vec3):
    """Pick one light uniformly and sample a direction to it.

    Returns (state, L, pdf_sample, radiance, attenuation, light_dist, li)
    where ``li`` is the per-lane sampled light index — the integrator routes
    coherent multi-light shadow packets by it (one masked packet pass per
    light keeps each packet's direction intervals aimed at a single target;
    see integrator.py NEE routing and TODO.md round-4 session 3).
    """
    state, r = prng.uniform(state)
    r = jnp.minimum(r, 0.99999994)
    li = (r * n_lights).astype(jnp.int32)

    # one packed row gather for all light fields
    row = jnp.take(lights.packed, li, axis=0)
    ltype = row[..., 0].astype(jnp.int32)
    lpos = Vec3(row[..., 1], row[..., 2], row[..., 3])
    ldir = Vec3(row[..., 4], row[..., 5], row[..., 6])
    lcol = Vec3(row[..., 7], row[..., 8], row[..., 9])
    lint = row[..., 10]
    lrange = row[..., 11]
    linner = row[..., 12]
    louter = row[..., 13]
    lradius = row[..., 14]
    lwidth = row[..., 15]
    lheight = row[..., 16]

    pdf_pick = 1.0 / float(n_lights)
    radiance = lcol * lint

    to_light = lpos - point
    dist_sq = jnp.maximum(to_light.length_squared(), 1e-12)
    dist = jnp.sqrt(dist_sq)
    l_point = to_light * (1.0 / dist)

    # soft-shadow cone sample for radius > 0 (path_logic.cuh:341-356)
    sin2 = jnp.minimum(lradius * lradius / dist_sq, 0.9999)
    cos_max = jnp.sqrt(1.0 - sin2)
    state, l_cone = prng.sample_cone_direction(state, l_point, cos_max)
    solid_angle = TWO_PI * (1.0 - cos_max)
    pdf_cone = jnp.where(solid_angle > 1e-6, pdf_pick / solid_angle, pdf_pick)

    soft = lradius > 0.0
    l_local = where(soft, l_cone, l_point)
    pdf_local = jnp.where(soft, pdf_cone, pdf_pick)

    # -- rect AREA lights: real quad sampling (IMPROVEMENT over the
    # reference's Area->Point degradation, PTRTtransfer.cuh:1833).
    # Uniform point on the rect, solid-angle pdf dist^2/(A cos), single-
    # sided emission along ldir; radiance convention matches the radius
    # lights above (intensity acts as radiance, MIS-consistent pdfs).
    state, ua, va = prng.uniform2(state)
    tb_u, tb_v = prng.ortho_normal_basis(ldir)
    q = (lpos + tb_u * (lwidth * (ua - 0.5))
         + tb_v * (lheight * (va - 0.5)))
    to_q = q - point
    dist_q_sq = jnp.maximum(to_q.length_squared(), 1e-12)
    dist_q = jnp.sqrt(dist_q_sq)
    l_area = to_q * (1.0 / dist_q)
    # ldir is the EMISSION direction: the surface sees the light iff the
    # sample-to-point direction agrees with ldir (single-sided)
    cos_emit = (-l_area).dot(ldir)
    area = jnp.maximum(lwidth * lheight, 1e-12)
    pdf_area_sa = pdf_pick * dist_q_sq / (area * jnp.maximum(cos_emit, 1e-6))
    is_area = ltype == int(LightType.AREA)
    emits = cos_emit > 1e-6
    l_local = where(is_area, l_area, l_local)
    pdf_local = jnp.where(is_area,
                          jnp.where(emits, pdf_area_sa, 0.0), pdf_local)
    dist = jnp.where(is_area, dist_q, dist)

    att = lrange / (lrange + dist)
    att = att * att

    # spot falloff (path_logic.cuh:360-371)
    theta = l_local.dot(-ldir)
    eps_cone = linner - louter
    spot_smooth = jnp.clip((theta - louter) / jnp.where(
        jnp.abs(eps_cone) < 1e-12, 1.0, eps_cone), 0.0, 1.0)
    spot_hard = jnp.where(theta >= louter, 1.0, 0.0)
    spot = jnp.where(eps_cone <= 1e-6, spot_hard, spot_smooth)
    att = att * jnp.where(ltype == int(LightType.SPOT), spot, 1.0)

    is_dir = ltype == int(LightType.DIRECTIONAL)
    l_out = where(is_dir, -ldir, l_local)
    pdf_out = jnp.where(is_dir, pdf_pick, pdf_local)
    att_out = jnp.where(is_dir, 1.0, att)
    dist_out = jnp.where(is_dir, 1e30, dist)
    return state, l_out, pdf_out, radiance, att_out, dist_out, li


def sample_direct_lighting(state, point: Vec3, normal: Vec3, front_face, mat,
                           ray_dir: Vec3, lights: LightTable, n_lights: int,
                           any_hit_fn, split: bool = False, active=None):
    """One-sample NEE estimate (``path_logic.cuh:305-393`` / ``:395-488``).

    ``any_hit_fn(origin, direction, t_max, light_index) -> bool`` is the
    shadow traversal (``light_index`` lets coherent walks regroup packets
    per light; ignore it for per-ray walks).
    ``active`` masks lanes that actually need NEE: inactive lanes get a
    negative t_max so their shadow rays exit traversal in one iteration —
    without this, dead lanes carry garbage hit points (o + d*1e30) whose
    shadow rays walk the ENTIRE tree (every AABB passes, no triangle can
    numerically hit), serializing the whole wavefront.
    Returns (state, L, pdf, contribution) with contribution a Vec3 (or a
    (diffuse, specular) pair when ``split``).
    """
    v = -ray_dir
    state, l, pdf_sample, radiance, att, dist, li = sample_light(
        state, lights, n_lights, point)

    offset = where(normal.dot(l) > 0.0, normal * 1e-4, normal * -1e-4)
    shadow_o = point + offset
    shadow_t = dist - 1e-3
    if active is not None:
        shadow_t = jnp.where(active, shadow_t, -1.0)
    # the sampled light index rides along so coherent bounce-0 walks can
    # regroup shadow packets PER LIGHT (see integrator make_any): an 8x8
    # shadow packet mixing targets has sign-mixed direction intervals and
    # degenerates to a near-full-tree sweep
    in_shadow = any_hit_fn(shadow_o, l, shadow_t, li)

    lit = jnp.logical_not(in_shadow) & (pdf_sample > 0.0)
    scale = att / jnp.maximum(pdf_sample, 1e-12)

    if split:
        bd, bs = evaluate_bsdf_split(normal, front_face, mat, l, v)
        out_d = clamp_vector_soft(bd * radiance * scale, MAX_NEE_CONTRIBUTION)
        out_s = clamp_vector_soft(bs * radiance * scale, MAX_NEE_CONTRIBUTION)
        zero = Vec3.full(0.0)
        return state, l, pdf_sample, (where(lit, out_d, zero),
                                      where(lit, out_s, zero))
    bsdf = evaluate_bsdf(normal, front_face, mat, l, v)
    out = clamp_vector_soft(bsdf * radiance * scale, MAX_NEE_CONTRIBUTION)
    return state, l, pdf_sample, where(lit, out, Vec3.full(0.0))


def sample_env_lighting(state, point: Vec3, normal: Vec3, front_face, mat,
                        ray_dir: Vec3, sky, any_hit_fn, split: bool = False,
                        active=None):
    """One-sample env-map NEE via the alias sampler (render/sky.py).

    Improvement over the reference (env map never importance-sampled,
    SURVEY.md §7 defects): draws a direction proportional to env
    luminance×sinθ, shadow-tests it, and returns the bsdf-weighted env
    radiance over the sampling pdf.  MIS weighting against the BSDF pdf is
    done by the caller (same contract as ``sample_direct_lighting``).

    Returns (state, l, pdf_sa, contribution[, (diffuse, specular) if split]).
    """
    from ptrt_tpu.render.sky import sample_env

    v = -ray_dir
    state, l, pdf_sa, radiance = sample_env(state, sky)

    offset = where(normal.dot(l) > 0.0, normal * 1e-4, normal * -1e-4)
    shadow_t = jnp.full(jnp.shape(pdf_sa), 1e28)
    if active is not None:
        shadow_t = jnp.where(active, shadow_t, -1.0)
    in_shadow = any_hit_fn(point + offset, l, shadow_t)

    lit = jnp.logical_not(in_shadow) & (pdf_sa > 1e-12)
    scale = 1.0 / jnp.maximum(pdf_sa, 1e-12)

    if split:
        bd, bs = evaluate_bsdf_split(normal, front_face, mat, l, v)
        out_d = clamp_vector_soft(bd * radiance * scale, MAX_NEE_CONTRIBUTION)
        out_s = clamp_vector_soft(bs * radiance * scale, MAX_NEE_CONTRIBUTION)
        zero = Vec3.full(0.0)
        return state, l, pdf_sa, (where(lit, out_d, zero),
                                  where(lit, out_s, zero))
    bsdf = evaluate_bsdf(normal, front_face, mat, l, v)
    out = clamp_vector_soft(bsdf * radiance * scale, MAX_NEE_CONTRIBUTION)
    return state, l, pdf_sa, where(lit, out, Vec3.full(0.0))
