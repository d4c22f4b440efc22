"""BSDF evaluation, sampling and pdfs — the multi-lobe PBR material model.

Vectorized, branchless rebuild of the reference's shading core:

* ``evaluate_bsdf``        <- ``evaluateBSDF``        (``path_logic.cuh:157-250``)
* ``evaluate_bsdf_split``  <- ``evaluateBSDF_split``  (``path_logic.cuh:252-303``)
* ``material_pdf``         <- ``material_pdf``        (``pdf.cuh:127-220``)
* ``material_scatter``     <- ``material_scatter``    (``path_logic.cuh:490-780``)
* ``mis_weight``           <- power-2 MIS             (``pdf.cuh:26-30``)

Lobes: clearcoat GGX, base GGX reflection, GGX refraction with TIR,
cosine diffuse + sheen, iridescent F0 modulation.  Every CUDA branch becomes
a lane select; all lobes are evaluated for all lanes (wavefront style) and
masked — on TPU the VPU does this at full width, which is the whole point.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ptrt_tpu.core import rng as prng
from ptrt_tpu.core.vec import PI, Vec3, clamp01, lerp, normalize, reflect, where
from ptrt_tpu.render.pbr import (
    calculate_iridescence,
    distribution_ggx,
    fresnel_schlick,
    geometry_smith,
    geometry_smith_transmission,
    schlick_dielectric,
    schlick_dielectric_one_ior,
)

MIN_ROUGH = 0.02  # reference clamps roughness (path_logic.cuh:167)


def mis_weight(pdf1, pdf2):
    """Power-2 heuristic (``pdf.cuh:26-30``)."""
    p1 = pdf1 * pdf1
    p2 = pdf2 * pdf2
    return p1 / (p1 + p2 + 1e-10)


def _f0_base(mat, ndotv) -> Vec3:
    """Base F0 with metallic lerp + iridescence modulation
    (``path_logic.cuh:505-514``)."""
    metal = clamp01(mat.metallic)
    f0 = lerp(mat.specular, mat.albedo, metal)
    irid = clamp01(mat.iridescence)
    irid_color = calculate_iridescence(mat.iridescence_thickness, ndotv, 1.3,
                                       mat.ior)
    mix = where(irid > 0.0, lerp(f0, irid_color, irid), f0)
    return mix


def evaluate_bsdf(n: Vec3, front_face, mat, l: Vec3, v: Vec3) -> Vec3:
    """Full BSDF eval for NEE (``evaluateBSDF``, ``path_logic.cuh:157-250``).

    Returns f * |NdotL| (the reference folds the cosine in).
    """
    ndotv = jnp.maximum(n.dot(v), 0.0)
    metal = clamp01(mat.metallic)
    rough = jnp.maximum(mat.roughness, MIN_ROUGH)
    trans = clamp01(mat.transmission)
    albedo = mat.albedo
    f0_base = _f0_base(mat, ndotv)

    ndotl_s = n.dot(l)  # signed

    # --- transmissive branch (trans > 0 && metal < 0.1) --------------------
    is_trans = (trans > 0.0) & (metal < 0.1)
    trans_rough = jnp.maximum(mat.transmission_roughness, rough)
    eta = jnp.where(front_face, 1.0 / mat.ior, mat.ior)

    # reflection side of transmissive (NdotL > 0)
    h_r = normalize(l + v, 1e-20)
    ndoth_r = jnp.maximum(n.dot(h_r), 0.0)
    vdoth_r = jnp.maximum(v.dot(h_r), 0.0)
    d_r = distribution_ggx(n, h_r, rough)
    g_r = geometry_smith(n, v, l, rough)
    f_r = fresnel_schlick(vdoth_r, f0_base)
    spec_refl = f_r * (d_r * g_r / (4.0 * ndotv * jnp.maximum(ndotl_s, 0.0) + 1e-6))
    trans_refl = spec_refl * jnp.maximum(ndotl_s, 0.0)

    # refraction side (NdotL < 0)
    h_t = normalize(-(v * eta + l), 1e-20)
    h_t = where(n.dot(h_t) < 0.0, -h_t, h_t)
    vdoth_t = jnp.maximum(v.dot(h_t), 0.0)
    ldoth_t = jnp.abs(l.dot(h_t))
    ndotl_abs = jnp.abs(ndotl_s)
    k = 1.0 - eta * eta * (1.0 - vdoth_t * vdoth_t)
    d_t = distribution_ggx(n, h_t, trans_rough)
    g_t = geometry_smith_transmission(n, v, l, trans_rough)
    f_fres = fresnel_schlick(vdoth_t, f0_base)
    f_t = Vec3.full(1.0) - f_fres
    numer = eta * eta * (1.0 - metal) * g_t * d_t * vdoth_t * ldoth_t
    denom = ndotv * ndotl_abs * (eta * vdoth_t + ldoth_t) ** 2
    btdf = albedo * f_t * (numer / (denom + 1e-6))
    trans_refr = where(k >= 0.0, btdf * ndotl_abs, Vec3.full(0.0))

    trans_result = where(ndotl_s > 0.0, trans_refl, trans_refr)

    # --- opaque branch -----------------------------------------------------
    ndotl = jnp.maximum(ndotl_s, 0.0)
    spec = f_r * (d_r * g_r / (4.0 * ndotv * ndotl + 0.001))
    kd = (Vec3.full(1.0) - f_r) * (1.0 - metal)
    diffuse = kd * albedo * (1.0 / PI)
    opaque_result = (diffuse + spec) * ndotl

    result = where(is_trans, trans_result, opaque_result)
    # NdotV <= 0 -> zero (path_logic.cuh:163); opaque with NdotL<=0 -> zero
    zero_mask = (ndotv <= 0.0) | (jnp.logical_not(is_trans) & (ndotl_s <= 0.0))
    return where(zero_mask, Vec3.full(0.0), result)


def evaluate_bsdf_split(n: Vec3, front_face, mat, l: Vec3, v: Vec3):
    """Diffuse/specular channel split for the denoiser
    (``evaluateBSDF_split``, ``path_logic.cuh:252-303``).

    Transmissive lanes route everything to specular.
    """
    full = evaluate_bsdf(n, front_face, mat, l, v)

    ndotv = jnp.maximum(n.dot(v), 0.0)
    metal = clamp01(mat.metallic)
    rough = jnp.maximum(mat.roughness, MIN_ROUGH)
    trans = clamp01(mat.transmission)
    f0_base = _f0_base(mat, ndotv)
    is_trans = (trans > 0.0) & (metal < 0.1)

    ndotl = jnp.maximum(n.dot(l), 0.0)
    h = normalize(l + v, 1e-20)
    vdoth = jnp.maximum(v.dot(h), 0.0)
    d = distribution_ggx(n, h, rough)
    g = geometry_smith(n, v, l, rough)
    f = fresnel_schlick(vdoth, f0_base)
    out_spec = f * (d * g / (4.0 * ndotv * ndotl + 0.001)) * ndotl
    kd = (Vec3.full(1.0) - f) * (1.0 - metal)
    out_diff = kd * mat.albedo * (1.0 / PI) * ndotl

    zero = (ndotv <= 0.0) | (ndotl <= 0.0)
    out_spec = where(zero, Vec3.full(0.0), out_spec)
    out_diff = where(zero, Vec3.full(0.0), out_diff)

    # transmissive: all in specular channel, via the full evaluator
    out_spec = where(is_trans & (ndotv > 0.0), full, out_spec)
    out_diff = where(is_trans, Vec3.full(0.0), out_diff)
    return out_diff, out_spec


def material_pdf(n: Vec3, front_face, mat, v: Vec3, l: Vec3):
    """Overall scatter pdf for MIS (``pdf.cuh:127-220``)."""
    ndotv = jnp.maximum(n.dot(v), 0.0)
    ndotl_s = n.dot(l)
    ndotl = jnp.maximum(ndotl_s, 0.0)

    metal = clamp01(mat.metallic)
    rough = jnp.maximum(mat.roughness, MIN_ROUGH)
    trans = clamp01(mat.transmission)
    f0_base = _f0_base(mat, ndotv)
    f_base = fresnel_schlick(ndotv, f0_base)

    total = jnp.zeros_like(ndotv)
    prob_base = jnp.ones_like(ndotv)

    # clearcoat lobe (pdf.cuh:160-174)
    clearcoat = clamp01(mat.clearcoat)
    cc_rough = jnp.maximum(mat.clearcoat_roughness, 0.001)
    f_coat = fresnel_schlick(ndotv, Vec3.full(0.04))
    f_coat_avg = (f_coat.x + f_coat.y + f_coat.z) * (1.0 / 3.0)
    p_coat = clamp01(f_coat_avg * clearcoat)
    has_coat = clearcoat > 0.0
    p_coat = jnp.where(has_coat, p_coat, 0.0)
    total = total + jnp.where(
        has_coat & (ndotl_s > 0.0),
        p_coat * pdf_ggx_reflect(n, v, l, cc_rough), 0.0)
    prob_base = jnp.where(has_coat, 1.0 - p_coat, 1.0)

    # transmissive branch (pdf.cuh:176-206)
    is_trans = (trans > 0.0) & (metal < 0.1)
    trans_rough = jnp.maximum(mat.transmission_roughness, rough)
    ior_ratio = jnp.where(front_face, 1.0 / mat.ior, mat.ior)
    reflect_prob = schlick_dielectric_one_ior(ndotv, ior_ratio)

    pdf_reflect = pdf_ggx_reflect(n, v, l, rough)
    h = normalize(v + l, 1e-20)
    vdoth = jnp.maximum(v.dot(h), 0.0)
    k = 1.0 - ior_ratio * ior_ratio * (1.0 - vdoth * vdoth)
    pdf_tir = pdf_ggx_reflect(n, v, l, trans_rough)
    trans_pos = prob_base * reflect_prob * pdf_reflect + jnp.where(
        k < 0.0, prob_base * (1.0 - reflect_prob) * pdf_tir, 0.0)
    pdf_refract = pdf_ggx_refract(n, v, l, trans_rough, ior_ratio)
    trans_neg = prob_base * (1.0 - reflect_prob) * pdf_refract
    trans_total = total + jnp.where(ndotl_s > 0.0, trans_pos, trans_neg)

    # opaque branch (pdf.cuh:208-217)
    max_fresnel = f_base.max_component()
    specular_prob = jnp.where(metal > 0.0, 1.0, max_fresnel)
    pdf_spec = pdf_ggx_reflect(n, v, l, rough)
    pdf_diff = jnp.maximum(ndotl, 0.0) * (1.0 / PI)
    opaque_total = total + jnp.where(
        ndotl_s > 0.0,
        prob_base * (specular_prob * pdf_spec + (1.0 - specular_prob) * pdf_diff),
        0.0)

    result = jnp.where(is_trans, trans_total, opaque_total)
    return jnp.where(ndotv == 0.0, 0.0, result)


def pdf_ggx_reflect(n: Vec3, v: Vec3, l: Vec3, roughness):
    """``pdf.cuh:80-94``."""
    ndotv = jnp.maximum(n.dot(v), 0.0)
    h = normalize(v + l, 1e-20)
    ndoth = jnp.maximum(n.dot(h), 0.0)
    vdoth = jnp.maximum(v.dot(h), 0.0)
    d = distribution_ggx(n, h, roughness)
    pdf = d * ndoth / (4.0 * vdoth + 1e-6)
    return jnp.where(ndotv == 0.0, 0.0, pdf)


def pdf_ggx_refract(n: Vec3, v: Vec3, l: Vec3, roughness, ior_ratio):
    """``pdf.cuh:97-123``."""
    ndotv = jnp.maximum(n.dot(v), 0.0)
    ndotl = n.dot(l)
    eta = ior_ratio
    h = normalize(-(v * eta + l), 1e-20)
    h = where(n.dot(h) < 0.0, -h, h)
    vdoth = jnp.maximum(v.dot(h), 0.0)
    ldoth = jnp.abs(l.dot(h))
    ndoth = jnp.maximum(n.dot(h), 0.0)
    d = distribution_ggx(n, h, roughness)
    dwh_dwo = (eta * eta * ldoth) / ((eta * vdoth + ldoth) ** 2 + 1e-12)
    pdf = d * ndoth * jnp.abs(dwh_dwo)
    return jnp.where((ndotv <= 0.0) | (ndotl >= 0.0), 0.0, pdf)


class ScatterResult(NamedTuple):
    direction: Vec3
    attenuation: Vec3  # f * cos / pdf
    is_specular: jnp.ndarray  # bool
    pdf: jnp.ndarray
    valid: jnp.ndarray  # bool — False = absorbed (path terminates)


def material_scatter(state, n: Vec3, front_face, mat, ray_dir: Vec3
                     ) -> tuple:
    """Sample the multi-lobe BSDF (``material_scatter``,
    ``path_logic.cuh:490-780``).  Returns (rng_state, ScatterResult).

    The CUDA original picks one lobe per thread with nested branches; here
    the lobe id is a per-lane select, one GGX half-vector + one cosine sample
    are drawn from a shared uniform pair (lobes are exclusive per lane), and
    f/pdf sums are evaluated with masks exactly like the scalar code.
    """
    v = -ray_dir
    ndotv = jnp.maximum(n.dot(v), 0.0)

    metal = clamp01(mat.metallic)
    rough = jnp.maximum(mat.roughness, MIN_ROUGH)
    trans = clamp01(mat.transmission)
    albedo = mat.albedo
    f0_base = _f0_base(mat, ndotv)
    f_base_nv = fresnel_schlick(ndotv, f0_base)

    # clearcoat selection prob (path_logic.cuh:518-531)
    clearcoat = clamp01(mat.clearcoat)
    cc_rough = jnp.maximum(mat.clearcoat_roughness, 0.001)
    f0_coat = Vec3.full(0.04)
    f_coat_nv = fresnel_schlick(ndotv, f0_coat)
    f_coat_avg = (f_coat_nv.x + f_coat_nv.y + f_coat_nv.z) * (1.0 / 3.0)
    p_coat = jnp.where(clearcoat > 0.0, clamp01(f_coat_avg * clearcoat), 0.0)
    prob_base = 1.0 - p_coat

    is_trans = (trans > 0.0) & (metal < 0.1)
    trans_rough = jnp.maximum(mat.transmission_roughness, rough)
    eta = jnp.where(front_face, 1.0 / mat.ior, mat.ior)
    ior_i = jnp.where(front_face, 1.0, mat.ior)
    ior_t = jnp.where(front_face, mat.ior, 1.0)
    reflect_prob = schlick_dielectric(ndotv, ior_i, ior_t)
    p_trans_reflect = prob_base * reflect_prob
    # p_trans_refract implied as remainder

    # opaque selection probs (path_logic.cuh:692-697)
    max_fresnel = f_base_nv.max_component()
    specular_prob = jnp.where(metal > 0.0, 1.0, max_fresnel)
    p_opq_spec = prob_base * specular_prob
    p_opq_diff = prob_base * (1.0 - specular_prob)

    # ---- lobe selection ----------------------------------------------------
    state, u = prng.uniform(state)
    state, g1, g2 = prng.uniform2(state)

    # lobe ids: 0 coat-reflect, 1 base-reflect, 2 refract, 3 diffuse, 4 absorb
    lobe_trans = jnp.where(
        u < p_coat, 0, jnp.where(u < p_coat + p_trans_reflect, 1, 2))
    lobe_opq = jnp.where(
        u < p_coat, 0,
        jnp.where(u < p_coat + p_opq_spec, 1,
                  jnp.where(p_opq_diff > 1e-6, 3, 4)))
    lobe = jnp.where(is_trans, lobe_trans, lobe_opq)

    sample_rough = jnp.where(
        lobe == 0, cc_rough,
        jnp.where(lobe == 2, trans_rough,
                  jnp.where(is_trans, rough, rough)))
    h = prng.ggx_half_vector_from(g1, g2, n, sample_rough)
    diffuse_dir = prng.hemisphere_to_world(
        prng.cosine_hemisphere_from(g1, g2), n)

    refl_dir = reflect(-v, h)

    # refraction with H-flip + TIR (path_logic.cuh:563-586)
    h_refr = where(v.dot(h) < 0.0, -h, h)
    vdoth_tir = jnp.abs(v.dot(h_refr))
    k_tir = 1.0 - eta * eta * (1.0 - vdoth_tir * vdoth_tir)
    tir = k_tir < 0.0
    cos_t = jnp.sqrt(jnp.maximum(k_tir, 0.0))
    refr_dir = normalize((-v) * eta + h_refr * (eta * vdoth_tir - cos_t), 1e-20)
    refract_branch_dir = where(tir, reflect(-v, h_refr), refr_dir)

    scattered = where(lobe == 3, diffuse_dir,
                      where(lobe == 2, refract_branch_dir, refl_dir))
    scattered = normalize(scattered, 1e-20)

    is_refraction = (lobe == 2) & jnp.logical_not(tir)
    is_specular = jnp.where(
        lobe == 0, cc_rough < 0.1,
        jnp.where(lobe == 1, rough < 0.1,
                  jnp.where(lobe == 2, tir | (trans_rough < 0.1), False)))

    ndotl_s = n.dot(scattered)
    ndotl = jnp.maximum(ndotl_s, 0.0)
    ndotl_abs = jnp.abs(ndotl_s)

    # ---- f/pdf accumulation ------------------------------------------------
    # shared half-vectors
    h_refl = normalize(v + scattered, 1e-20)
    ndoth_refl = jnp.maximum(n.dot(h_refl), 0.0)
    vdoth_refl = jnp.maximum(v.dot(h_refl), 0.0)

    h_rf = normalize(-(v * eta + scattered), 1e-20)
    h_rf = where(n.dot(h_rf) < 0.0, -h_rf, h_rf)
    vdoth_rf = jnp.maximum(v.dot(h_rf), 0.0)
    ldoth_rf = jnp.abs(scattered.dot(h_rf))
    ndoth_rf = jnp.maximum(n.dot(h_rf), 0.0)

    # clearcoat attenuation of the base (path_logic.cuh:592-602, 738-741)
    vdoth_for_coat = jnp.where(is_refraction,
                               jnp.maximum(v.dot(normalize(v * eta + scattered, 1e-20)).astype(jnp.float32), 0.0),
                               vdoth_refl)
    f_coat_atten = fresnel_schlick(vdoth_for_coat, f0_coat)
    base_atten = Vec3.full(1.0) - f_coat_atten * clearcoat

    f_total = Vec3.full(jnp.zeros_like(ndotv))
    pdf_total = jnp.zeros_like(ndotv)

    # coat lobe (both cases, NdotL > 0; path_logic.cuh:604-619, 722-736)
    d_coat = distribution_ggx(n, h_refl, cc_rough)
    g_coat = geometry_smith(n, v, scattered, cc_rough)
    f_coat = fresnel_schlick(vdoth_refl, f0_coat)
    pdf_coat = d_coat * ndoth_refl / (4.0 * vdoth_refl + 1e-6)
    coat_on = (p_coat > 0.0) & (ndotl_s > 0.0)
    pdf_total = pdf_total + jnp.where(coat_on, p_coat * pdf_coat, 0.0)
    brdf_coat = f_coat * (d_coat * g_coat / (4.0 * ndotv * ndotl + 1e-6))
    f_total = f_total + where(coat_on, brdf_coat * (clearcoat * ndotl),
                              Vec3.full(0.0))

    # ---------------- transmissive case terms ------------------------------
    # base reflection (path_logic.cuh:621-636)
    d_refl_t = distribution_ggx(n, h_refl, rough)
    g_refl_t = geometry_smith(n, v, scattered, rough)
    f_refl_t = fresnel_schlick(vdoth_refl, f0_base)
    pdf_refl_t = d_refl_t * ndoth_refl / (4.0 * vdoth_refl + 1e-6)
    refl_on_t = (p_trans_reflect > 0.0) & (ndotl_s > 0.0)
    pdf_t = jnp.where(refl_on_t, p_trans_reflect * pdf_refl_t, 0.0)
    brdf_refl_t = f_refl_t * (d_refl_t * g_refl_t / (4.0 * ndotv * ndotl + 1e-6))
    f_t = where(refl_on_t, brdf_refl_t * base_atten * ndotl, Vec3.full(0.0))

    # refraction btdf (path_logic.cuh:638-669)
    p_trans_refract = prob_base * (1.0 - reflect_prob)
    k_rf = 1.0 - eta * eta * (1.0 - vdoth_rf * vdoth_rf)
    d_rf = distribution_ggx(n, h_rf, trans_rough)
    g_rf = geometry_smith_transmission(n, v, scattered, trans_rough)
    dwh_dwo = (eta * eta * ldoth_rf) / ((eta * vdoth_rf + ldoth_rf) ** 2 + 1e-12)
    pdf_rf = d_rf * ndoth_rf * jnp.abs(dwh_dwo)
    refr_on = (p_trans_refract > 0.0) & (ndotl_s < 0.0) & (k_rf >= 0.0)
    pdf_t = pdf_t + jnp.where(refr_on, p_trans_refract * pdf_rf, 0.0)
    f_rf_fres = Vec3.full(1.0) - fresnel_schlick(vdoth_rf, f0_base)
    numer_rf = eta * eta * (1.0 - metal) * g_rf * d_rf * vdoth_rf * ldoth_rf
    denom_rf = ndotv * ndotl_abs * (eta * vdoth_rf + ldoth_rf) ** 2
    btdf = albedo * f_rf_fres * (numer_rf / (denom_rf + 1e-6))
    f_t = f_t + where(refr_on, btdf * base_atten * ndotl_abs, Vec3.full(0.0))

    # TIR / refraction-sampled-as-reflection (path_logic.cuh:671-685)
    d_tirr = distribution_ggx(n, h_refl, trans_rough)
    g_tirr = geometry_smith(n, v, scattered, trans_rough)
    pdf_tirr = d_tirr * ndoth_refl / (4.0 * vdoth_refl + 1e-6)
    tir_on = (lobe == 2) & (ndotl_s > 0.0)
    pdf_t = pdf_t + jnp.where(tir_on, p_trans_refract * pdf_tirr, 0.0)
    brdf_tirr = Vec3.full(d_tirr * g_tirr / (4.0 * ndotv * ndotl + 1e-6))
    f_t = f_t + where(tir_on, brdf_tirr * base_atten * ndotl, Vec3.full(0.0))

    # ---------------- opaque case terms ------------------------------------
    # base specular always (path_logic.cuh:743-755)
    pdf_o = p_opq_spec * pdf_refl_t
    f_o = f_refl_t * (d_refl_t * g_refl_t / (4.0 * ndotv * ndotl + 1e-6))
    f_o = f_o * base_atten * ndotl

    # diffuse + sheen (path_logic.cuh:757-774)
    diff_on = p_opq_diff > 1e-6
    pdf_diff = ndotl * (1.0 / PI)
    pdf_o = pdf_o + jnp.where(diff_on, p_opq_diff * pdf_diff, 0.0)
    sheen = clamp01(mat.sheen)
    kd = (Vec3.full(1.0) - f_base_nv) * (1.0 - metal)
    f_diff = kd * albedo * (ndotl / PI)
    fh = 1.0 - jnp.maximum(v.dot(h_refl), 0.0)
    fh5 = (fh * fh) * (fh * fh) * fh
    csheen = lerp(Vec3.full(1.0), mat.sheen_tint, 0.5)
    f_diff = f_diff + csheen * (sheen * fh5 * ndotl)
    f_o = f_o + where(diff_on, f_diff * base_atten, Vec3.full(0.0))

    # ---- combine -----------------------------------------------------------
    pdf_total = pdf_total + jnp.where(is_trans, pdf_t, pdf_o)
    f_total = f_total + where(is_trans, f_t, f_o)

    pdf_out = jnp.where(is_trans, jnp.maximum(pdf_total, 1e-6), pdf_total)
    attenuation = f_total / jnp.maximum(pdf_total, 1e-6)

    valid = jnp.logical_not(jnp.logical_not(is_trans) & (lobe == 4))
    attenuation = where(valid, attenuation, Vec3.full(0.0))
    return state, ScatterResult(
        direction=scattered,
        attenuation=attenuation,
        is_specular=is_specular & valid,
        pdf=pdf_out,
        valid=valid,
    )
