"""RT backend shading: one-bounce real-time PBR lighting.

Vectorized rebuild of the reference ray tracer's shading core
(``raytracer/RTscene.cuh:532-761``): ambient + per-light GGX (with
anisotropic GGX, iridescence Fresnel tint, sheen, subsurface wrap term,
clearcoat modulation) + analytic shadows, and the glass branch that recurses
exactly ONE level (reflection via ``shadeOneBounce``, refraction via a second
trace + Beer–Lambert using pow(albedo, dist) — ``RTscene.cuh:672-733``).

The CUDA recursion depth is a compile-time constant 2, so here it is simply
unrolled: ``shade`` = primary shade with the glass branch; secondary shades
run with ``allow_spec_transmission=False`` like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import (INV_PI, PI, Vec3, clamp, clamp01, cross,
                               face_forward, lerp, normalize, reflect, where)
from ptrt_tpu.render import traverse
from ptrt_tpu.render.pbr import (calculate_iridescence, distribution_ggx,
                                 fresnel_schlick, fresnel_schlick_roughness,
                                 geometry_smith)
from ptrt_tpu.scene.lights import LightType


def build_tangent_frame(n: Vec3):
    """``buildTangentFrame`` (``RTscene.cuh:180-188``)."""
    use_z = jnp.abs(n.z) < 0.9999
    ref = where(use_z, Vec3(0.0, 0.0, 1.0), Vec3(1.0, 0.0, 0.0))
    t = normalize(cross(ref, n), 1e-20)
    b = cross(n, t)
    return t, b


def anisotropy_to_alpha(roughness, anisotropy):
    """``anisotropyToAlpha`` (``RTscene.cuh:232-245``)."""
    r2 = roughness * roughness
    aspect = jnp.sqrt(1.0 - 0.9 * jnp.abs(anisotropy))
    ax_pos = r2 / aspect
    ay_pos = r2 * aspect
    ax = jnp.where(anisotropy >= 0.0, ax_pos, ay_pos)
    ay = jnp.where(anisotropy >= 0.0, ay_pos, ax_pos)
    return jnp.maximum(ax, 0.001), jnp.maximum(ay, 0.001)


def distribution_ggx_aniso(n: Vec3, h: Vec3, t: Vec3, b: Vec3, ax, ay):
    """``distributionGGXAnisotropic`` (``RTscene.cuh:190-207``)."""
    ndoth = n.dot(h)
    tdoth = t.dot(h)
    bdoth = b.dot(h)
    denom = (tdoth * tdoth / (ax * ax)) + (bdoth * bdoth / (ay * ay)) + (
        ndoth * ndoth)
    denom = PI * ax * ay * denom * denom
    d = 1.0 / jnp.maximum(denom, 0.001)
    return jnp.where(ndoth > 0.0, d, 0.0)


def _g1_aniso(ndotv, tdotv, bdotv, ax, ay):
    lam = jnp.sqrt(ax * ax * tdotv * tdotv + ay * ay * bdotv * bdotv
                   + ndotv * ndotv)
    return 2.0 * ndotv / (ndotv + lam + 0.001)


def geometry_smith_aniso(n: Vec3, v: Vec3, l: Vec3, t: Vec3, b: Vec3, ax, ay):
    """``geometrySmithAnisotropic`` (``RTscene.cuh:219-230``)."""
    ndotv = jnp.maximum(n.dot(v), 0.0)
    ndotl = jnp.maximum(n.dot(l), 0.0)
    return (_g1_aniso(ndotv, t.dot(v), b.dot(v), ax, ay)
            * _g1_aniso(ndotl, t.dot(l), b.dot(l), ax, ay))


def perturb_direction_ggx(dir: Vec3, n: Vec3, roughness, seed):
    """GGX cone perturbation with inline LCG (``RTscene.cuh:247-277``)."""
    seed = seed * jnp.uint32(747796405) + jnp.uint32(2891336453)
    u1 = seed.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
    seed = seed * jnp.uint32(747796405) + jnp.uint32(2891336453)
    u2 = seed.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)

    a = roughness * roughness
    phi = 2.0 * PI * u1
    cos_t = jnp.sqrt((1.0 - u2) / (1.0 + (a * a - 1.0) * u2))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    t, b = build_tangent_frame(dir)
    out = normalize(t * (jnp.cos(phi) * sin_t) + b * (jnp.sin(phi) * sin_t)
                    + dir * cos_t, 1e-20)
    return where(roughness < 0.01, dir, out), seed


def beer_lambert_rt(trans_rgb: Vec3, dist) -> Vec3:
    """pow(t, dist) form (``RTscene.cuh:322-331``)."""
    t = clamp(trans_rgb, 0.0, 1.0)
    return Vec3(jnp.power(t.x, dist), jnp.power(t.y, dist),
                jnp.power(t.z, dist))


def sample_sky_rt(dir: Vec3, top: Vec3, bottom: Vec3, use_sky) -> Vec3:
    t = 0.5 * (dir.y + 1.0)
    return lerp(bottom, top, t) * use_sky


def _hash_seed(p: Vec3) -> jnp.ndarray:
    """float-as-uint hash of the hit point (``RTscene.cuh:692-695``)."""
    f = p.x * 12.9898 + p.y * 78.233 + p.z * 45.164
    seed = jax.lax.bitcast_convert_type(f.astype(jnp.float32), jnp.uint32)
    return seed * jnp.uint32(747796405) + jnp.uint32(2891336453)


def shade_core(hit, ray_dir: Vec3, mat, lights, n_lights: int, ambient: Vec3,
               sky_top: Vec3, sky_bottom: Vec3, use_sky, geom,
               any_hit_fn) -> Vec3:
    """``calculatePBRLightingCore`` without the glass branch
    (``RTscene.cuh:541-673``, ``allowSpecTransmission=false`` behavior is the
    caller's choice via ``shade_one_bounce`` / ``shade_primary``)."""
    v = -ray_dir
    ng = hit.normal
    rough = jnp.clip(mat.roughness, 0.02, 1.0)
    metal = jnp.clip(mat.metallic, 0.0, 1.0)
    is_glass = (mat.transmission > 0.0) & (metal < 0.1)
    f0 = lerp(mat.specular, mat.albedo, metal)

    color = mat.emission

    ndotv = jnp.maximum(ng.dot(v), 0.0)
    f_amb = fresnel_schlick_roughness(ndotv, f0, rough)
    kd_amb = (Vec3.full(1.0) - f_amb) * (1.0 - metal)
    kd_amb = where(is_glass, Vec3.full(0.0), kd_amb)
    color = color + kd_amb * mat.albedo * ambient

    t_frame, b_frame = build_tangent_frame(ng)
    ax, ay = anisotropy_to_alpha(rough, mat.anisotropy)

    for i in range(n_lights):
        ltype = lights.type[i]
        lpos = Vec3(lights.position.x[i], lights.position.y[i],
                    lights.position.z[i])
        ldir = Vec3(lights.direction.x[i], lights.direction.y[i],
                    lights.direction.z[i])
        lcol = Vec3(lights.color.x[i], lights.color.y[i], lights.color.z[i])
        lint = lights.intensity[i]
        lrange = lights.range[i]
        linner = lights.inner_cone[i]
        louter = lights.outer_cone[i]

        is_dir = ltype == int(LightType.DIRECTIONAL)
        to_light = lpos - hit.point
        dist = jnp.maximum(to_light.length(), 1e-6)
        l_pt = to_light * (1.0 / dist)
        l = where(is_dir, -ldir, l_pt)

        att = lrange / (lrange + dist)
        att = att * att
        theta = l.dot(-ldir)
        eps_cone = linner - louter
        spot = jnp.clip((theta - louter) / jnp.where(
            jnp.abs(eps_cone) < 1e-12, 1e-12, eps_cone), 0.0, 1.0)
        att = att * jnp.where(ltype == int(LightType.SPOT), spot, 1.0)
        attenuation = jnp.where(is_dir, 1.0, att)

        # shadow ray (RTscene.cuh:586-600); transmissive meshes skipped by
        # the any-hit mask built at assembly time
        eps = 1e-3 * jnp.maximum(1.0, hit.t)
        light_dist = jnp.where(is_dir, 1e30, dist)
        in_shadow = any_hit_fn(hit.point + ng * eps, l, light_dist)

        h = normalize(l + v, 1e-20)
        ndotl = jnp.maximum(ng.dot(l), 0.0)
        vdoth = jnp.maximum(v.dot(h), 0.0)

        use_aniso = jnp.abs(mat.anisotropy) > 0.01
        d_iso = distribution_ggx(ng, h, rough)
        g_iso = geometry_smith(ng, v, l, rough)
        d_an = distribution_ggx_aniso(ng, h, t_frame, b_frame, ax, ay)
        g_an = geometry_smith_aniso(ng, v, l, t_frame, b_frame, ax, ay)
        d = jnp.where(use_aniso, d_an, d_iso)
        g = jnp.where(use_aniso, g_an, g_iso)

        f = fresnel_schlick(vdoth, f0)
        irid = calculate_iridescence(mat.iridescence_thickness, vdoth)
        f = where(mat.iridescence > 0.0,
                  lerp(f, f * irid, mat.iridescence), f)

        spec = f * (d * g / (4.0 * ndotv * ndotl + 0.001))

        ks = f
        kd = (Vec3.full(1.0) - ks) * (1.0 - metal)
        diffuse = mat.albedo * INV_PI

        # sheen adds to kD (RTscene.cuh:637-643)
        x = 1.0 - vdoth
        fh = (x * x) * (x * x) * x
        sheen_color = lerp(Vec3.full(1.0), mat.sheen_tint, fh)
        kd = kd + where(mat.sheen > 0.0,
                        sheen_color * (mat.sheen * (1.0 - metal)),
                        Vec3.full(0.0))

        # subsurface wrap (RTscene.cuh:645-649)
        sss = jnp.maximum(v.dot(-l), 0.0)
        sss = sss * sss * mat.subsurface_radius
        diffuse = where(mat.subsurface_radius > 0.0,
                        lerp(diffuse, mat.subsurface_color * INV_PI, sss),
                        diffuse)

        # thin transmission for glass in secondary shades
        # (RTscene.cuh:651-655); primary glass gets the full branch instead
        thin = (Vec3.full(1.0) - f) * mat.transmission
        kd = where(is_glass, Vec3.full(0.0), kd)
        thin = where(is_glass, thin, Vec3.full(0.0))

        radiance = lcol * (lint * 20.0 * ndotl * attenuation)
        lo = (kd * diffuse + spec + thin) * radiance

        # clearcoat (RTscene.cuh:659-668)
        cc_d = distribution_ggx(ng, h, mat.clearcoat_roughness)
        cc_g = geometry_smith(ng, v, l, mat.clearcoat_roughness)
        cc_f = fresnel_schlick(vdoth, Vec3.full(0.04))
        cc_brdf = cc_f * (cc_d * cc_g / (4.0 * ndotv * ndotl + 0.001))
        lo_cc = (lo * (Vec3.full(1.0) - cc_f * mat.clearcoat)
                 + cc_brdf * radiance * mat.clearcoat)
        lo = where(mat.clearcoat > 0.0, lo_cc, lo)

        lit = jnp.logical_not(in_shadow)
        color = color + where(lit, lo, Vec3.full(0.0))

    return color


def shade_one_bounce(geom, materials, lights, n_lights, ambient, sky_top,
                     sky_bottom, use_sky, o: Vec3, d: Vec3, closest_fn,
                     any_hit_fn) -> Vec3:
    """``shadeOneBounce`` (``RTscene.cuh:748-761``) — trace + non-recursive
    shade; misses return sky."""
    h = closest_fn(o, d)
    mat = materials.gather(jnp.maximum(h.mesh_index, 0))
    shaded = shade_core(h, d, mat, lights, n_lights, ambient, sky_top,
                        sky_bottom, use_sky, geom, any_hit_fn)
    sky = sample_sky_rt(d, sky_top, sky_bottom, use_sky)
    return where(h.hit, shaded, sky)


def shade_primary(geom, materials, lights, n_lights: int, ambient: Vec3,
                  sky_top: Vec3, sky_bottom: Vec3, use_sky, hit, ray_dir: Vec3,
                  closest_fn, any_hit_fn, scene_has_glass: bool) -> Vec3:
    """``calculatePBRLighting`` with the glass branch
    (``RTscene.cuh:675-746``)."""
    mat = materials.gather(jnp.maximum(hit.mesh_index, 0))
    color = shade_core(hit, ray_dir, mat, lights, n_lights, ambient, sky_top,
                       sky_bottom, use_sky, geom, any_hit_fn)

    if not scene_has_glass:
        return color

    metal = jnp.clip(mat.metallic, 0.0, 1.0)
    is_glass = (mat.transmission > 0.0) & (metal < 0.1)

    i = ray_dir
    ng = hit.normal  # already face-forwarded by traversal
    nf = ng
    entering = hit.front_face
    n1 = jnp.where(entering, 1.0, mat.ior)
    n2 = jnp.where(entering, mat.ior, 1.0)
    eta = n1 / n2

    f0s = ((n2 - n1) / (n2 + n1)) ** 2
    cos_theta = jnp.maximum((-i).dot(nf), 0.0)
    fr = fresnel_schlick(cos_theta, Vec3.full(f0s))

    eps = 1e-3 * jnp.maximum(1.0, hit.t)
    seed = _hash_seed(hit.point)

    # reflection bounce (RTscene.cuh:697-706)
    r_dir = normalize(reflect(i, nf), 1e-20)
    refl_rough = jnp.maximum(mat.roughness, mat.transmission_roughness)
    r_pert, seed = perturb_direction_ggx(r_dir, nf, refl_rough, seed)
    r_dir = where(refl_rough > 0.02, r_pert, r_dir)
    r_col = shade_one_bounce(geom, materials, lights, n_lights, ambient,
                             sky_top, sky_bottom, use_sky,
                             hit.point + nf * eps, r_dir, closest_fn,
                             any_hit_fn)

    # refraction bounce (RTscene.cuh:708-733)
    ndoti = nf.dot(i)
    k = 1.0 - eta * eta * (1.0 - ndoti * ndoti)
    refr_ok = k >= 0.0
    t_dir = normalize(
        i * eta - nf * (eta * ndoti + jnp.sqrt(jnp.maximum(k, 0.0))), 1e-20)
    t_pert, seed = perturb_direction_ggx(t_dir, -nf, mat.transmission_roughness,
                                         seed)
    t_dir = where(mat.transmission_roughness > 0.02, t_pert, t_dir)

    h2 = closest_fn(hit.point - nf * eps, t_dir)
    thickness = jnp.where(h2.hit, h2.t, 1.0)
    mat2 = materials.gather(jnp.maximum(h2.mesh_index, 0))
    behind_hit = shade_core(h2, t_dir, mat2, lights, n_lights, ambient,
                            sky_top, sky_bottom, use_sky, geom, any_hit_fn)
    behind = where(h2.hit, behind_hit,
                   sample_sky_rt(t_dir, sky_top, sky_bottom, use_sky))
    absorb = beer_lambert_rt(clamp(mat.albedo, 0.0, 1.0), thickness)
    t_col = where(refr_ok, absorb * behind, Vec3.full(0.0))
    fr = where(refr_ok, fr, Vec3.full(1.0))

    glass_add = fr * r_col + (Vec3.full(1.0) - fr) * mat.transmission * t_col
    return color + where(is_glass, glass_add, Vec3.full(0.0))
