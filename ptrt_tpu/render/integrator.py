"""Wavefront path integrator.

TPU-native rebuild of ``tracePath`` / ``tracePathSplit``
(``path_logic.cuh:782-1042``): the per-thread bounce loop becomes a
``lax.while_loop`` over the whole ray wavefront — every bounce phase
(intersect, interior absorption, emission, NEE + MIS, scatter, Russian
roulette) is one fused vector step over all lanes, with terminated lanes
masked.  This is the wavefront formulation SURVEY.md §7 calls for; control
flow is uniform, so no per-lane divergence exists by construction.

Matches the reference's radiometry: Beer–Lambert interior absorption with
``-log(albedo)`` (``:823-829``), emission only on bounce-0/after-specular
(``:831-836``), one-sample NEE with power-2 MIS (``:840-857``), RR from
bounce 2 with p in [0.05, 0.95] (``:871-880``), throughput soft clamp 50,
NEE clamp 500, final clamp 100 (``:24-29``).
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ptrt_tpu.core import rng as prng
from ptrt_tpu.core.vec import Vec3, clamp_vector_soft, where
from ptrt_tpu.render import traverse
from ptrt_tpu.render.bsdf import material_pdf, material_scatter, mis_weight
from ptrt_tpu.render.nee import sample_direct_lighting
from ptrt_tpu.render.pbr import beer_lambert
from ptrt_tpu.render.ray import RayBatch
from ptrt_tpu.render.sky import SkyConfig, sample_sky

RUSSIAN_ROULETTE_START_BOUNCE = 2  # path_logic.cuh:24
RUSSIAN_ROULETTE_MIN_PROB = 0.05
MAX_BOUNCE_WEIGHT = 50.0
MAX_FINAL_RADIANCE = 100.0

from ptrt_tpu.geometry.bvh import _env_int as _ei

# Bounce-wavefront compaction: from this bounce on (unrolled loop only),
# the whole bounce body — walks AND shading arithmetic — runs over a
# packed buffer of the alive lanes instead of the full wavefront.  Late
# bounces are mostly dead (bounce-2 alive ~0.3, bounce-3 <0.2 on the
# bench scene), yet the BSDF/NEE/MIS elementwise chains were paid at
# full width every bounce.  EXACT for every live lane (per-lane math is
# lane-local; processing order cannot change a lane's result); rounds
# repeat while alive lanes remain unprocessed, so an unexpectedly-live
# wavefront degrades to more rounds, never to dropped lanes.  Dead lanes
# no longer advance their (already-dead) rng streams — engagement is
# therefore gated on wavefront size so small CI/golden renders keep
# their committed noise patterns bit-for-bit.
BOUNCE_COMPACT = _ei("PTRT_BOUNCE_COMPACT", 1, 0, 1)
BOUNCE_COMPACT_FROM = _ei("PTRT_BOUNCE_COMPACT_FROM", 2, 1, 64)
BOUNCE_COMPACT_MIN = _ei("PTRT_BOUNCE_COMPACT_MIN", 131072, 0, 1 << 30)

# Max light count for per-light packet routing of coherent (bounce-0) NEE
# shadow rays (see the coherence note in trace_path); 0 disables routing
# and multi-light NEE always takes the scattered per-ray walk.
NEE_PK_LIGHTS = _ei("PTRT_NEE_PK_LIGHTS", 8, 0, 31)


def _enc_i32(a):
    if a.dtype == jnp.bool_:
        return a.astype(jnp.int32)
    if a.dtype == jnp.int32:
        return a
    return jax.lax.bitcast_convert_type(a, jnp.int32)  # f32/u32: exact bits


def _dec_i32(v, dt):
    if dt == jnp.bool_:
        return v != 0
    if dt == jnp.int32:
        return v
    return jax.lax.bitcast_convert_type(v, dt)


def _packed_bounce(s, body_fn, shrink: int):
    """Run one bounce body over only the ALIVE lanes in rounds of a
    total//shrink buffer.  Transport is one fused row gather/scatter
    (the traverse._fused_take trick): all per-lane state rides a single
    int32 matrix.  Unfilled pack slots duplicate lane 0; their results
    are DROPPED at scatter (index -> out of bounds), so a lane is never
    double-processed."""
    from ptrt_tpu.render.traverse import _pack_active

    scalars = {k: s[k] for k in ("bounce", "rays")}
    # first_* G-buffer keys are only written at bounce 0 — past that the
    # body's is_first gates are statically dead, so they need neither
    # transport nor the (small) where-chains: pass them through untouched
    frozen = {k: s[k] for k in s if k.startswith("first_")}
    per_lane = {k: v for k, v in s.items()
                if k not in scalars and k not in frozen}
    leaves, treedef = jax.tree_util.tree_flatten(per_lane)
    total = jnp.size(leaves[0])
    C = max(total // shrink, 4096)
    dts = [a.dtype for a in leaves]
    mat = jnp.concatenate([_enc_i32(a)[:, None] for a in leaves], axis=1)

    def cond(c):
        return jnp.any(c[0])

    def rbody(c):
        pending, m, rays = c
        pos = jnp.cumsum(pending.astype(jnp.int32)) - 1
        processed = pending & (pos < C)
        perm = _pack_active(processed, C)
        sm = jnp.take(m, perm, axis=0)
        act_s = jnp.take(processed, perm, axis=0)
        sml = [_dec_i32(sm[:, i], dt) for i, dt in enumerate(dts)]
        st = dict(jax.tree_util.tree_unflatten(treedef, sml),
                  bounce=scalars["bounce"], rays=rays)
        # frozen keys: dead stand-ins (the body's is_first writes are
        # no-ops past bounce 0; outputs are discarded)
        for fk, fv in frozen.items():
            st[fk] = jax.tree_util.tree_map(
                lambda a: jnp.zeros((C,), a.dtype), fv)
        # duplicate slots enter DEAD so they trace/accumulate/count nothing
        st["alive"] = st["alive"] & act_s
        st = body_fn(st)
        rays = st.pop("rays")
        st.pop("bounce")
        for fk in frozen:
            st.pop(fk)
        out_leaves = jax.tree_util.tree_leaves(st)
        sm_out = jnp.concatenate([_enc_i32(a)[:, None] for a in out_leaves],
                                 axis=1)
        # drop writes from duplicate slots (their lane was not processed
        # this round — writing would re-advance its rng / re-accumulate)
        wperm = jnp.where(act_s, perm, total)
        m = m.at[wperm].set(sm_out, mode="drop")
        return (pending & jnp.logical_not(processed), m, rays)

    pending0 = per_lane["alive"]
    _, mat, rays = jax.lax.while_loop(
        cond, rbody, (pending0, mat, scalars["rays"]))
    outl = [_dec_i32(mat[:, i], dt) for i, dt in enumerate(dts)]
    out = dict(jax.tree_util.tree_unflatten(treedef, outl),
               bounce=scalars["bounce"] + 1, rays=rays, **frozen)
    return out


class PathOutput(NamedTuple):
    rays_traced: jnp.ndarray  # scalar: closest-hit + shadow rays traced
    radiance: Vec3  # combined (non-split) radiance
    diffuse: Vec3  # split channels (valid when split=True)
    specular: Vec3
    emission: Vec3
    first_normal: Vec3
    first_depth: jnp.ndarray
    first_object_id: jnp.ndarray
    first_roughness: jnp.ndarray
    first_transmission: jnp.ndarray


def trace_path(geom, materials, lights, n_lights: int, sky: SkyConfig,
               ray: RayBatch, state, max_depth: int, split: bool = False,
               use_brute: bool = False, unroll: bool | None = None,
               rr_enabled: bool = True,
               rr_start: int = RUSSIAN_ROULETTE_START_BOUNCE,
               camera_nee: bool = True, env_nee: bool | None = None,
               pixel_grid: bool = False) -> tuple:
    """Trace the wavefront to completion. Returns (rng_state, PathOutput).

    ``unroll=True`` expands the bounce loop statically (a Python loop of
    ``max_depth`` bodies) instead of a ``lax.while_loop``; default unrolls
    shallow loops (compile size) and keeps ``lax.while_loop`` for deep ones
    (ultra preset depth 32).

    ``rr_enabled``/``rr_start`` surface the reference's PerformanceSettings
    RR toggles (``scene.cuh:196-198``; note the reference kernel hardcodes
    start=2, ``path_logic.cuh:24`` — we honor the setting).

    ``camera_nee=True`` fixes a reference defect: the reference marks camera
    rays specular (``camera.cuh:201-205``) and gates NEE on
    ``!ray.isSpecular()`` (``path_logic.cuh:840,982``), so PRIMARY hits
    never receive direct lighting from analytic lights — a scene lit only
    by a point light renders black.  With the fix, the camera ray's spec
    flag no longer suppresses first-bounce NEE (the flag still exists for
    DOF/emission semantics).  Set False for exact reference behavior.

    ``env_nee`` enables HDRI importance sampling (alias-method env NEE with
    MIS, render/sky.py) — an improvement over the reference, which never
    importance-samples the env map (SURVEY.md §7 defects).  Default: on
    whenever the sky has sampling tables.
    """
    if unroll is None:
        env_u = _os.environ.get("PTRT_UNROLL")
        unroll = (max_depth <= 8) if env_u is None else env_u == "1"
    if env_nee is None:
        env_nee = sky.has_env_sampling
    env_nee = bool(env_nee and sky.has_env_sampling)
    if use_brute:
        closest = lambda o, d, t, coh=False: (
            traverse.intersect_closest_brute(geom, o, d, t))
        make_any = lambda coh: (
            lambda o, d, t, li=None: traverse.intersect_any_brute(
                geom, o, d, t))
    else:
        # ``coh`` marks a bounce whose rays are still pixel-tile COHERENT
        # (bounce 0: camera rays / shadow rays from primary hits): those
        # walks run per 4x4-/8x8-tile packet (render/packet.py) — measured
        # 2.0x (closest) and 6.8x (any) at 1080p.  Scattered bounces and
        # env-NEE rays (directions spread across the HDRI) stay per-ray:
        # a packet of mixed-sign directions has unbounded inv-direction
        # intervals and degrades toward a full-tree sweep.
        #
        # NEE shadow rays are only packet-coherent per LIGHT: sample_light
        # picks a light PER LANE, so with n_lights > 1 an 8x8 shadow packet
        # mixes targets, most packets get sign-mixed direction intervals,
        # and the conservative walk degenerates to near-full-tree sweeps —
        # measured IN-FRAME at 640x360/100k tris: the bounce-0 packet any
        # cost ~970 ms of a 1086 ms frame (9.1x whole-frame regression vs
        # the scattered per-ray walk, and the cause of round-3's 1080p
        # bench device timeout), while isolated single-light probes showed
        # the packet win.  The fix is per-light ROUTING: the sampled light
        # index rides along with the shadow ray, and intersect_any runs one
        # packet pass per light with the other lanes masked dead — each
        # pass's packets aim at a single target, so the intervals are tight
        # again (exact: lanes take their own group's result, the union of
        # the masked passes equals the single mixed pass).  Gated to
        # n_lights <= NEE_PK_LIGHTS: each light adds a packet-walk body to
        # the program, and past a handful of passes the scattered per-ray
        # walk wins back.  tools/prof_frame_ablate.py is the attribution
        # harness.
        # non-coherent bounces also get scattered=True: their wavefronts
        # are mostly-dead and fast-collapsing, so the walk uses the ladder
        # compaction (traverse.SCATTER_SHRINK) instead of the camera
        # profile's wide first pass (tools/prof_r3.py part P)
        closest = lambda o, d, t, coh=False: traverse.intersect_closest(
            geom, o, d, t, coherent=coh and pixel_grid, scattered=not coh)
        nee_pk_ok = 1 <= n_lights <= max(NEE_PK_LIGHTS, 1)
        make_any = lambda coh: (lambda o, d, t, li=None: traverse.intersect_any(
            geom, o, d, t,
            coherent=coh and pixel_grid and nee_pk_ok
            and (li is not None or n_lights == 1),
            # multi-light coherent wavefronts intentionally fall back to the
            # SCATTERED ladder profile when the packet path disengages
            # (PTRT_PACKET_ANY=0 or below _PK_MIN_PIXELS): that matches the
            # measured pre-routing behavior (multi-light NEE ran the
            # scattered per-ray walk, TODO.md round-3 postmortem); only the
            # single-light case keeps the camera profile for its tail.
            scattered=not (coh and n_lights == 1),
            light_id=li if n_lights > 1 else None, n_light_groups=n_lights))
    any_hit = make_any(False)

    shape = jnp.shape(ray.direction.x)
    zero3 = Vec3.zeros(shape)
    f32 = lambda v: jnp.full(shape, v, jnp.float32)

    # camera_nee: the camera ray's spec flag must not suppress bounce-0 NEE
    ray_spec0 = (jnp.zeros(shape, bool) if camera_nee
                 else jnp.broadcast_to(ray.spec, shape))
    init = dict(
        bounce=jnp.int32(0),
        state=state,
        o=ray.origin.broadcast_to(shape),
        d=ray.direction.broadcast_to(shape),
        ray_spec=ray_spec0,
        throughput=Vec3.ones(shape),
        alive=jnp.ones(shape, bool),
        accum=zero3,
        acc_diff=zero3,
        acc_spec=zero3,
        acc_emis=zero3,
        prev_was_specular=jnp.ones(shape, bool),
        path_still_specular=jnp.ones(shape, bool),
        # env-MIS carries: pdf of the previous (non-specular) scatter and
        # whether env NEE ran at the previous hit
        prev_pdf=f32(0.0),
        prev_did_nee=jnp.zeros(shape, bool),
        first_normal=zero3,
        first_depth=f32(1e30),
        first_object_id=jnp.full(shape, -1, jnp.int32),
        first_roughness=f32(1.0),
        first_transmission=f32(0.0),
        rays=jnp.float32(0.0),
    )

    def cond(s):
        return (s["bounce"] < max_depth) & jnp.any(s["alive"])

    def body(s, static_k=None):
        # static_k: the bounce index when the loop is UNROLLED (None inside
        # lax loops) — only bounce 0 is statically known pixel-coherent
        coh = static_k == 0
        # shape-agnostic: under _packed_bounce the body runs on a packed
        # flat buffer smaller than the wavefront, so every broadcast-zero
        # must derive from the CARRIED state, not the outer closure
        zero3 = Vec3.zeros(jnp.shape(s["alive"]))
        bounce = s["bounce"]
        # depth guard: the chunked loop below runs the body in CHUNK-sized
        # groups, so the final chunk can overshoot max_depth — those extra
        # bodies must be no-ops (dead lanes trace nothing and add nothing)
        alive = s["alive"] & (bounce < max_depth)
        o, d = s["o"], s["d"]
        throughput = s["throughput"]
        rng_state = s["state"]

        s["rays"] = s["rays"] + jnp.sum(alive.astype(jnp.float32))
        # dead lanes get a negative t_max -> single-iteration traversal exit
        hit = closest(o, d, jnp.where(alive, 1e30, -1.0), coh=coh)
        live_hit = alive & hit.hit

        # -- bounce-0 G-buffer export (path_logic.cuh:798-808) --------------
        is_first = bounce == 0
        s["first_normal"] = where(is_first & hit.hit, hit.normal,
                                  where(is_first, zero3, s["first_normal"]))
        s["first_depth"] = jnp.where(is_first,
                                     jnp.where(hit.hit, hit.t, 1e30),
                                     s["first_depth"])
        s["first_object_id"] = jnp.where(
            is_first, jnp.where(hit.hit, hit.mesh_index, -1),
            s["first_object_id"])

        mat = materials.gather(jnp.maximum(hit.mesh_index, 0))
        s["first_roughness"] = jnp.where(
            is_first, jnp.where(hit.hit, mat.roughness, 1.0),
            s["first_roughness"])
        s["first_transmission"] = jnp.where(
            is_first, jnp.where(hit.hit, mat.transmission, 0.0),
            s["first_transmission"])

        # -- sky on miss (path_logic.cuh:810-815) ---------------------------
        # With env NEE on, BSDF-sampled sky hits are MIS-weighted against
        # the env pdf for bounces whose origin hit also drew an env sample
        # (standard two-strategy MIS; the reference has no env sampling so
        # its sky weight is always 1 — that path is kept when env_nee=False).
        miss = alive & jnp.logical_not(hit.hit)
        if env_nee:
            from ptrt_tpu.render.sky import env_pdf_dir

            w_sky = jnp.where(
                s["prev_did_nee"] & jnp.logical_not(s["prev_was_specular"]),
                mis_weight(s["prev_pdf"], env_pdf_dir(sky, d)), 1.0)
        else:
            w_sky = 1.0
        sky_c = sample_sky(d, sky) * throughput * w_sky
        s["accum"] = s["accum"] + where(miss, sky_c, zero3)
        sky_spec = s["path_still_specular"]
        s["acc_spec"] = s["acc_spec"] + where(miss & sky_spec, sky_c, zero3)
        s["acc_diff"] = s["acc_diff"] + where(
            miss & jnp.logical_not(sky_spec), sky_c, zero3)
        alive = alive & hit.hit

        # -- interior Beer–Lambert absorption (path_logic.cuh:823-829) ------
        t_unit = Vec3(jnp.maximum(mat.albedo.x, 1e-6),
                      jnp.maximum(mat.albedo.y, 1e-6),
                      jnp.maximum(mat.albedo.z, 1e-6))
        # absorption coefficient = -log(T) (path_logic.cuh:825-827)
        absorb = beer_lambert(Vec3(-jnp.log(t_unit.x), -jnp.log(t_unit.y),
                                   -jnp.log(t_unit.z)), hit.t)
        inside = alive & jnp.logical_not(hit.front_face)
        throughput = where(inside, throughput * absorb, throughput)

        # -- emission (path_logic.cuh:831-836) ------------------------------
        emissive = (mat.emission.x > 0.0) | (mat.emission.y > 0.0) | (
            mat.emission.z > 0.0)
        emit_on = alive & emissive & (is_first | s["prev_was_specular"])
        contrib_e = throughput * mat.emission
        s["accum"] = s["accum"] + where(emit_on, contrib_e, zero3)
        # split routing (path_logic.cuh:965-980)
        s["acc_emis"] = s["acc_emis"] + where(emit_on & is_first, contrib_e,
                                              zero3)
        route_spec = emit_on & jnp.logical_not(is_first) & s["path_still_specular"]
        route_diff = emit_on & jnp.logical_not(is_first) & jnp.logical_not(
            s["path_still_specular"])
        s["acc_spec"] = s["acc_spec"] + where(route_spec, contrib_e, zero3)
        s["acc_diff"] = s["acc_diff"] + where(route_diff, contrib_e, zero3)

        # -- NEE with MIS (path_logic.cuh:840-857) --------------------------
        do_nee = alive & jnp.logical_not(s["ray_spec"])
        if env_nee:
            from ptrt_tpu.render.nee import sample_env_lighting

            s["rays"] = s["rays"] + jnp.sum(do_nee.astype(jnp.float32))
            if split:
                rng_state, l_e, pdf_e, (env_d, env_s) = sample_env_lighting(
                    rng_state, hit.point, hit.normal, hit.front_face, mat,
                    d, sky, any_hit, split=True, active=do_nee)
            else:
                rng_state, l_e, pdf_e, env_c = sample_env_lighting(
                    rng_state, hit.point, hit.normal, hit.front_face, mat,
                    d, sky, any_hit, split=False, active=do_nee)
            pdf_b_e = material_pdf(hit.normal, hit.front_face, mat, -d, l_e)
            w_e = mis_weight(pdf_e, pdf_b_e)
            gate_e = do_nee & (pdf_e > 0.0)
            if split:
                s["acc_diff"] = s["acc_diff"] + where(
                    gate_e, throughput * env_d * w_e, zero3)
                s["acc_spec"] = s["acc_spec"] + where(
                    gate_e, throughput * env_s * w_e, zero3)
                s["accum"] = s["accum"] + where(
                    gate_e, throughput * (env_d + env_s) * w_e, zero3)
            else:
                s["accum"] = s["accum"] + where(
                    gate_e, throughput * env_c * w_e, zero3)
        if n_lights > 0:
            s["rays"] = s["rays"] + jnp.sum(do_nee.astype(jnp.float32))
            if split:
                rng_state, l_nee, pdf_nee, (nee_d, nee_s) = (
                    sample_direct_lighting(
                        rng_state, hit.point, hit.normal, hit.front_face, mat,
                        d, lights, n_lights, make_any(coh), split=True,
                        active=do_nee))
            else:
                rng_state, l_nee, pdf_nee, nee_c = sample_direct_lighting(
                    rng_state, hit.point, hit.normal, hit.front_face, mat,
                    d, lights, n_lights, make_any(coh), split=False,
                    active=do_nee)
            pdf_brdf = material_pdf(hit.normal, hit.front_face, mat, -d, l_nee)
            w = mis_weight(pdf_nee, pdf_brdf)
            gate = do_nee & (pdf_nee > 0.0)
            if split:
                s["acc_diff"] = s["acc_diff"] + where(
                    gate, throughput * nee_d * w, zero3)
                s["acc_spec"] = s["acc_spec"] + where(
                    gate, throughput * nee_s * w, zero3)
                s["accum"] = s["accum"] + where(
                    gate, throughput * (nee_d + nee_s) * w, zero3)
            else:
                s["accum"] = s["accum"] + where(
                    gate, throughput * nee_c * w, zero3)

        # -- scatter (path_logic.cuh:859-869) -------------------------------
        rng_state, sc = material_scatter(rng_state, hit.normal, hit.front_face,
                                         mat, d)
        alive = alive & sc.valid
        if env_nee:
            # pdf of the chosen scatter direction, for MIS-weighting a
            # subsequent BSDF-sampled sky hit against the env sampler
            s["prev_pdf"] = jnp.where(
                alive, material_pdf(hit.normal, hit.front_face, mat, -d,
                                    sc.direction), s["prev_pdf"])
            s["prev_did_nee"] = jnp.where(alive, do_nee, s["prev_did_nee"])
        s["prev_was_specular"] = jnp.where(alive, sc.is_specular,
                                           s["prev_was_specular"])
        s["path_still_specular"] = s["path_still_specular"] & jnp.where(
            alive, sc.is_specular, True)

        # -- Russian roulette (path_logic.cuh:871-880) ----------------------
        rng_state, u_rr = prng.uniform(rng_state)
        p = jnp.clip(throughput.max_component(), RUSSIAN_ROULETTE_MIN_PROB,
                     0.95)
        rr_on = (bounce >= rr_start) if rr_enabled else jnp.asarray(False)
        killed = rr_on & (u_rr > p)
        alive = alive & jnp.logical_not(killed)
        throughput = where(rr_on & alive, throughput / p, throughput)

        # -- advance ray ----------------------------------------------------
        throughput = throughput * sc.attenuation
        throughput = clamp_vector_soft(throughput, MAX_BOUNCE_WEIGHT)
        offset = where(sc.direction.dot(hit.normal) > 0.0, hit.normal * 1e-4,
                       hit.normal * -1e-4)
        new_o = hit.point + offset

        s["o"] = where(alive, new_o, o)
        s["d"] = where(alive, sc.direction, d)
        s["ray_spec"] = jnp.where(alive, sc.is_specular, s["ray_spec"])
        s["throughput"] = throughput
        s["alive"] = alive
        s["state"] = rng_state
        s["bounce"] = bounce + 1
        return s

    total_lanes = 1
    for _sd in shape:
        total_lanes *= _sd
    if unroll:
        out = init
        flat = False
        for k in range(max_depth):
            use_pack = (BOUNCE_COMPACT and k >= BOUNCE_COMPACT_FROM
                        and total_lanes >= BOUNCE_COMPACT_MIN)
            if use_pack and not flat:
                # flatten every per-lane leaf once; packed rounds work in
                # flat lane space (accumulators reshape back at the end)
                out = {kk: (vv if kk in ("bounce", "rays") else
                            jax.tree_util.tree_map(
                                lambda a: a.reshape(total_lanes), vv))
                       for kk, vv in out.items()}
                flat = True
            if use_pack:
                # alive fraction roughly halves per bounce past RR start:
                # buffer 1/2 at the first packed bounce, then 1/4, 1/8, ...
                # (overflow = another round, never dropped lanes)
                shrink = min(2 ** (k - BOUNCE_COMPACT_FROM + 1), 16)
                out = _packed_bounce(
                    out, lambda st, kk=k: body(st, static_k=kk), shrink)
            else:
                out = body(out, static_k=k)
        if flat:
            out = {kk: (vv if kk in ("bounce", "rays") else
                        jax.tree_util.tree_map(
                            lambda a: a.reshape(shape), vv))
                   for kk, vv in out.items()}
    else:
        # peel the statically-known-coherent camera bounce out of the loop
        # so deep presets (ultra d32) still get the packet walks
        if max_depth > 0:
            init = body(init, static_k=0)
        # chunked bounce loop: while_loop over CHUNK-bounce unrolled bodies.
        # A while_loop whose body is ONE bounce makes XLA's TPU scheduler
        # pathologically slow on this program (d16 compile: ~10 min; the
        # fully-unrolled d6 program compiles in ~2 min) — chunking keeps the
        # trip count small (ceil(depth/8)) with a d<=8-sized body, so deep
        # presets (ultra d32, scene.cuh:1834-1842) compile like d8.
        # PTRT_CHUNK tunes the compile-size/scheduler tradeoff per host
        # (validated like every other PTRT_* knob: a huge value would
        # unroll that many bounce bodies and hang XLA compilation)
        from ptrt_tpu.geometry.bvh import _env_int

        CHUNK = _env_int("PTRT_CHUNK", 8, 1, 64)

        def chunk_body(s):
            for _ in range(CHUNK):
                s = body(s)
            return s

        if max_depth > CHUNK:
            # any depth > CHUNK chunks (not just multiples of CHUNK): the
            # body's bounce < max_depth guard makes overshoot bounces no-ops
            out = jax.lax.while_loop(cond, chunk_body, init)
        else:
            out = jax.lax.while_loop(cond, body, init)

    radiance = clamp_vector_soft(out["accum"], MAX_FINAL_RADIANCE)
    return out["state"], PathOutput(
        rays_traced=out["rays"],
        radiance=radiance,
        diffuse=out["acc_diff"],
        specular=out["acc_spec"],
        emission=out["acc_emis"],
        first_normal=out["first_normal"],
        first_depth=out["first_depth"],
        first_object_id=out["first_object_id"],
        first_roughness=out["first_roughness"],
        first_transmission=out["first_transmission"],
    )
