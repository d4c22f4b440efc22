"""Integrator correctness tests: furnace, energy conservation, MIS/pdf
consistency, reference-semantics checks (SURVEY.md §4a/4c)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptrt_tpu.core import rng as prng
from ptrt_tpu.core.vec import Vec3, normalize, vec3
from ptrt_tpu.geometry.mesh import Mesh
from ptrt_tpu.geometry.scene_geom import assemble_geometry
from ptrt_tpu.render.bsdf import (evaluate_bsdf, evaluate_bsdf_split,
                                  material_pdf, material_scatter, mis_weight)
from ptrt_tpu.render.integrator import trace_path
from ptrt_tpu.render.ray import RayBatch
from ptrt_tpu.render.sky import SkyConfig, sample_sky
from ptrt_tpu.scene.lights import Light, LightTable
from ptrt_tpu.scene.materials import Material, MaterialTable, Materials


def _lanes(mat: Material, n: int):
    return MaterialTable.from_materials([mat]).gather(jnp.zeros(n, jnp.int32))


def _up_normals(n):
    return Vec3(jnp.zeros(n), jnp.ones(n), jnp.zeros(n))


class TestBSDF:
    def test_diffuse_furnace_white(self):
        """Cosine-integrated white diffuse BSDF ~= albedo * kD (energy
        conservation sanity)."""
        n = 1 << 14
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 0)
        nrm = _up_normals(n)
        state, local = prng.sample_cosine_hemisphere(state)
        l = prng.hemisphere_to_world(local, nrm)
        v = normalize(Vec3(jnp.full(n, 0.3), jnp.ones(n), jnp.zeros(n)))
        mat = _lanes(Material.make((1.0, 1.0, 1.0), 1.0, 0.0), n)
        # f*cos / pdf with pdf = cos/pi -> estimate = pi * f
        f = evaluate_bsdf(nrm, jnp.ones(n, bool), mat, l, v)
        pdf = jnp.maximum(nrm.dot(l), 0.0) / np.pi
        est = np.asarray(f.x / jnp.maximum(pdf, 1e-8)).mean()
        # kD ~ (1 - F)(1-metal); with F0=0.04, reflectance ~0.96
        assert 0.7 < est < 1.05

    def test_bsdf_zero_below_horizon_for_opaque(self):
        n = 8
        nrm = _up_normals(n)
        l = normalize(Vec3(jnp.zeros(n), -jnp.ones(n), jnp.ones(n) * 0.2))
        v = normalize(Vec3(jnp.zeros(n), jnp.ones(n), jnp.zeros(n)))
        mat = _lanes(Materials.PlasticRed(), n)
        f = evaluate_bsdf(nrm, jnp.ones(n, bool), mat, l, v)
        assert np.allclose(np.asarray(f.x), 0.0)

    def test_split_sums_to_full_for_opaque(self):
        n = 512
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 3)
        nrm = _up_normals(n)
        state, local = prng.sample_cosine_hemisphere(state)
        l = prng.hemisphere_to_world(local, nrm)
        v = normalize(Vec3(jnp.full(n, 0.2), jnp.ones(n), jnp.full(n, -0.4)))
        mat = _lanes(Materials.Copper(), n)
        full = evaluate_bsdf(nrm, jnp.ones(n, bool), mat, l, v)
        d, s = evaluate_bsdf_split(nrm, jnp.ones(n, bool), mat, l, v)
        assert np.allclose(np.asarray((d + s).x), np.asarray(full.x),
                           rtol=1e-4, atol=1e-6)

    def test_scatter_weight_matches_f_over_pdf(self):
        """One-sample estimate <f*cos/pdf> with the returned attenuation must
        integrate a constant-radiance environment to the hemisphere
        reflectance (white furnace for the scatter path)."""
        n = 1 << 14
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 9)
        nrm = _up_normals(n)
        d = normalize(Vec3(jnp.full(n, 0.3), -jnp.ones(n), jnp.full(n, 0.1)))
        mat = _lanes(Material.make((1.0, 1.0, 1.0), 0.6, 0.0), n)
        state, sc = material_scatter(state, nrm, jnp.ones(n, bool), mat, d)
        ok = np.asarray(sc.valid)
        est = np.asarray(sc.attenuation.x)[ok].mean() * ok.mean()
        assert 0.6 < est < 1.1  # rough white-furnace bound

    def test_mis_weight(self):
        assert np.isclose(float(mis_weight(1.0, 0.0)), 1.0, atol=1e-6)
        assert np.isclose(float(mis_weight(1.0, 1.0)), 0.5, atol=1e-6)

    def test_material_pdf_positive_on_sampled_dirs(self):
        n = 4096
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 5)
        nrm = _up_normals(n)
        d = normalize(Vec3(jnp.full(n, 0.1), -jnp.ones(n), jnp.zeros(n)))
        for mat_fn in [Materials.PlasticRed, Materials.Gold, Materials.Glass]:
            mat = _lanes(mat_fn(), n)
            state, sc = material_scatter(state, nrm, jnp.ones(n, bool), mat, d)
            pdf = material_pdf(nrm, jnp.ones(n, bool), mat, -d, sc.direction)
            ok = np.asarray(sc.valid)
            assert (np.asarray(pdf)[ok] >= 0).all()
            # most sampled directions should have nonzero pdf
            assert (np.asarray(pdf)[ok] > 0).mean() > 0.9

    def test_glass_scatter_refracts_and_reflects(self):
        n = 1 << 12
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 7)
        nrm = _up_normals(n)
        d = normalize(Vec3(jnp.full(n, 0.4), -jnp.ones(n), jnp.zeros(n)))
        mat = _lanes(Materials.Glass(), n)
        state, sc = material_scatter(state, nrm, jnp.ones(n, bool), mat, d)
        down = np.asarray(sc.direction.y) < 0.0
        up = np.asarray(sc.direction.y) > 0.0
        assert down.mean() > 0.5  # mostly refraction at this angle
        assert up.mean() > 0.01  # some Fresnel reflection


def _one_sphere_scene():
    meshes = [Mesh.sphere(16), Mesh.plane_xz(-1.0, 8.0)]
    meshes[0].transform.set_position(0, 0, 3)
    mats = [Materials.PlasticBlue(), Material.make((0.8, 0.8, 0.8), 0.7)]
    geom = assemble_geometry(meshes, [m.transmission for m in mats])
    table = MaterialTable.from_materials(mats)
    lights = LightTable.from_lights([Light.point((3, 4, 1), (1, 1, 1), 3.0)])
    return geom, table, lights


class TestTracePath:
    def test_furnace_closed_white(self):
        """White furnace: white diffuse sphere inside constant-radiance sky.
        Every path should return ~1.0 regardless of bounces."""
        mesh = Mesh.sphere(16)
        mesh.transform.set_position(0, 0, 3)
        mats = [Material.make((1.0, 1.0, 1.0), 1.0, 0.0)]
        geom = assemble_geometry([mesh], [0.0])
        table = MaterialTable.from_materials(mats)
        lights = LightTable.from_lights([])
        sky = SkyConfig.gradient((1.0, 1.0, 1.0), (1.0, 1.0, 1.0))

        n = 4096
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 11)
        o = Vec3.zeros((n,))
        ang = jnp.linspace(-0.15, 0.15, n)
        d = normalize(Vec3(ang, ang * 0.5, jnp.ones(n)))
        ray = RayBatch.make(o, d, jnp.ones(n, bool))
        state, out = trace_path(geom, table, lights, 0, sky, ray, state,
                                max_depth=16)
        lum = np.asarray(out.radiance.luminance())
        # unbiased white furnace -> mean 1; RR + clamps allow small deviation
        assert abs(lum.mean() - 1.0) < 0.12

    def test_gbuffer_on_hit_and_miss(self):
        geom, table, lights = _one_sphere_scene()
        sky = SkyConfig.gradient()
        n = 2
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 1)
        o = Vec3.zeros((n,))
        d = Vec3(jnp.array([0.0, 0.0]), jnp.array([0.0, 1.0]),
                 jnp.array([1.0, 0.0]))
        ray = RayBatch.make(o, normalize(d), jnp.ones(n, bool))
        state, out = trace_path(geom, table, lights, 1, sky, ray, state, 4)
        assert int(out.first_object_id[0]) == 0  # sphere
        assert int(out.first_object_id[1]) == -1  # sky
        assert float(out.first_depth[0]) == pytest.approx(2.5, abs=0.02)
        assert float(out.first_depth[1]) > 1e29

    def test_black_sky_dark_scene(self):
        geom, table, lights = _one_sphere_scene()
        sky = SkyConfig.off()
        lights0 = LightTable.from_lights([])
        n = 64
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 2)
        o = Vec3.zeros((n,))
        d = normalize(Vec3(jnp.linspace(-0.2, 0.2, n), jnp.zeros(n),
                           jnp.ones(n)))
        ray = RayBatch.make(o, d, jnp.ones(n, bool))
        state, out = trace_path(geom, table, lights0, 0, sky, ray, state, 4)
        assert float(out.radiance.luminance().max()) < 1e-6

    def test_camera_nee_defect_semantics(self):
        """camera_nee pins both behaviors: with the fix a point-lit diffuse
        primary hit receives direct light; with exact reference semantics
        (camera.cuh:201-205 + path_logic.cuh:840,982) it stays black under
        depth=1 (no bounce can reach the light, NEE suppressed)."""
        mesh = Mesh.plane_xz(0.0, 10.0)
        mats = [Material.make((0.8, 0.8, 0.8), 1.0, 0.0)]
        geom = assemble_geometry([mesh], [0.0])
        table = MaterialTable.from_materials(mats)
        lights = LightTable.from_lights(
            [Light.point((0.0, 5.0, 3.0), (1.0, 1.0, 1.0), 20.0)])
        sky = SkyConfig.off()
        n = 32
        o = Vec3(jnp.zeros(n), jnp.full(n, 2.0), jnp.zeros(n))
        d = normalize(Vec3(jnp.linspace(-0.1, 0.1, n), jnp.full(n, -1.0),
                           jnp.full(n, 1.5)))
        ray = RayBatch.make(o, d, jnp.ones(n, bool))
        lit = dark = None
        for fix in (True, False):
            state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 5)
            state, out = trace_path(geom, table, lights, 1, sky, ray, state,
                                    max_depth=1, camera_nee=fix)
            lum = float(out.radiance.luminance().mean())
            if fix:
                lit = lum
            else:
                dark = lum
        assert lit > 1e-3  # fix: primary hits receive direct light
        assert dark < 1e-6  # reference defect reproduced exactly

    def test_emissive_visible_on_primary(self):
        mesh = Mesh.sphere(12)
        mesh.transform.set_position(0, 0, 3)
        mats = [Materials.EmissiveLamp((1.0, 0.5, 0.2), 5.0)]
        geom = assemble_geometry([mesh], [0.0])
        table = MaterialTable.from_materials(mats)
        lights = LightTable.from_lights([])
        sky = SkyConfig.off()
        n = 8
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 3)
        ray = RayBatch.make(Vec3.zeros((n,)),
                            Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n)),
                            jnp.ones(n, bool))
        state, out = trace_path(geom, table, lights, 0, sky, ray, state, 2)
        assert float(out.radiance.x.min()) >= 4.9  # emission * throughput 1

    def test_rays_counted(self):
        geom, table, lights = _one_sphere_scene()
        sky = SkyConfig.gradient()
        n = 32
        state = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 4)
        ray = RayBatch.make(Vec3.zeros((n,)),
                            Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n)),
                            jnp.ones(n, bool))
        state, out = trace_path(geom, table, lights, 1, sky, ray, state, 4)
        assert float(out.rays_traced) >= n  # at least the primary rays


class TestNEEWalkRouting:
    """NEE shadow rays are only packet-COHERENT per LIGHT: sample_light
    picks a light PER LANE, so multi-light packets mix targets and the
    conservative interval walk degenerates to near-full-tree sweeps
    (measured 9.1x whole-frame in-frame).  Multi-light scenes therefore
    route shadow packets per light (one masked packet pass per light,
    integrator.NEE_PK_LIGHTS cap); past the cap they fall back to the
    scattered per-ray walk (see the coherence note in trace_path)."""

    def _routed_flags(self, n_lights, pk_cap=None):
        from ptrt_tpu.render import integrator as ig
        from ptrt_tpu.render import traverse as tv

        geom, table, _ = _one_sphere_scene()
        lights = LightTable.from_lights(
            [Light.point((3, 4, 1), (1, 1, 1), 3.0)][:1] * n_lights)
        sky = SkyConfig.gradient()
        h, w = 4, 8
        state = prng.seed(jnp.arange(h * w).reshape(h, w),
                          jnp.zeros((h, w), jnp.int32), 5)
        d = normalize(Vec3(jnp.zeros((h, w)), jnp.zeros((h, w)),
                           jnp.ones((h, w))))
        ray = RayBatch.make(Vec3.zeros((h, w)), d, jnp.ones((h, w), bool))

        calls = []
        real_any = tv.intersect_any
        real_cap = ig.NEE_PK_LIGHTS

        def spy(geom_, o, dd, t, coherent=False, scattered=False,
                light_id=None, n_light_groups=0):
            calls.append((coherent, scattered, light_id is not None))
            return real_any(geom_, o, dd, t, coherent=coherent,
                            scattered=scattered, light_id=light_id,
                            n_light_groups=n_light_groups)

        tv.intersect_any = spy
        if pk_cap is not None:
            ig.NEE_PK_LIGHTS = pk_cap
        try:
            trace_path(geom, table, lights, n_lights, sky, ray, state, 2,
                       pixel_grid=True)
        finally:
            tv.intersect_any = real_any
            ig.NEE_PK_LIGHTS = real_cap
        return calls

    def test_single_light_nee_claims_coherence(self):
        calls = self._routed_flags(1)
        assert any(coh for coh, _, _ in calls)

    def test_multi_light_nee_routes_per_light_packets(self):
        calls = self._routed_flags(2)
        assert any(coh and routed for coh, _, routed in calls)

    def test_past_cap_multi_light_nee_goes_scattered(self):
        calls = self._routed_flags(3, pk_cap=2)
        assert calls and not any(coh for coh, _, _ in calls)
        assert all(scat for _, scat, _ in calls)

    def test_per_light_packet_nee_bit_equals_scattered(self, monkeypatch):
        """The per-light masked packet passes must reproduce the scattered
        per-ray walk's shadow predicate exactly: identical rng consumption,
        identical radiance.  Packets forced on the tiny frame via
        _PK_MIN_PIXELS=0."""
        from ptrt_tpu.render import integrator as ig
        from ptrt_tpu.render import traverse as tv

        geom, table, _ = _one_sphere_scene()
        lights = LightTable.from_lights([
            Light.point((3, 4, 1), (1, 1, 1), 3.0),
            Light.point((-3, 4, 1), (1, 0.8, 0.6), 2.0),
            Light.spot((0, 6, 3), (0, -1, 0), (1, 1, 1), 4.0,
                       inner_cone=0.44, outer_cone=0.7),
        ])
        sky = SkyConfig.gradient()
        h, w = 16, 16
        state = prng.seed(
            jnp.arange(h * w).reshape(h, w) % 83,
            jnp.arange(h * w).reshape(h, w) // 83, 5)
        xs = (jnp.arange(w, dtype=jnp.float32) - w / 2) / w
        ys = (jnp.arange(h, dtype=jnp.float32)[:, None] - h / 2) / h
        d = normalize(Vec3(jnp.broadcast_to(xs, (h, w)) * 0.8,
                           jnp.broadcast_to(ys, (h, w)) * 0.8,
                           jnp.ones((h, w))))
        ray = RayBatch.make(Vec3.zeros((h, w)), d, jnp.ones((h, w), bool))

        def run():
            _, out = trace_path(geom, table, lights, 3, sky, ray, state,
                                max_depth=3, unroll=True, pixel_grid=True)
            return (np.asarray(out.radiance.x), np.asarray(out.radiance.y),
                    np.asarray(out.rays_traced))

        monkeypatch.setattr(ig, "NEE_PK_LIGHTS", 0)  # scattered reference
        ref_x, ref_y, ref_rays = run()
        monkeypatch.setattr(ig, "NEE_PK_LIGHTS", 8)
        monkeypatch.setattr(tv, "_PK_MIN_PIXELS", 0)
        pk_x, pk_y, pk_rays = run()
        np.testing.assert_array_equal(pk_x, ref_x)
        np.testing.assert_array_equal(pk_y, ref_y)
        assert ref_rays == pk_rays


class TestBounceCompaction:
    def test_packed_bounces_bit_equal(self, monkeypatch):
        """The packed late-bounce path (integrator._packed_bounce) must
        match the full-width body for every pixel: per-lane math is
        lane-local, so compacting the alive set cannot change results.
        Tolerance is 1 ULP — XLA picks different fusions/FMA contractions
        at different buffer shapes (measured: 18/4096 lanes differ by
        ~3e-8 on CPU) — and the traced-ray COUNT must match exactly.
        Forced on tiny wavefronts by dropping the engagement threshold."""
        from ptrt_tpu.render import integrator as ig

        geom, table, lights = _one_sphere_scene()
        sky = SkyConfig.gradient((0.6, 0.7, 0.9), (0.2, 0.2, 0.25))
        n = 4096
        state0 = prng.seed(jnp.arange(n), jnp.zeros(n, jnp.int32), 7)
        ang = jnp.linspace(-0.4, 0.4, n)
        d = normalize(Vec3(ang, jnp.sin(ang * 3.0) * 0.3, jnp.ones(n)))
        ray = RayBatch.make(Vec3.zeros((n,)), d, jnp.ones(n, bool))

        def run():
            _, out = trace_path(geom, table, lights, 1, sky, ray, state0,
                                max_depth=5, unroll=True)
            return np.asarray(out.radiance.x), np.asarray(out.rays_traced)

        monkeypatch.setattr(ig, "BOUNCE_COMPACT", 0)
        full_x, full_rays = run()
        monkeypatch.setattr(ig, "BOUNCE_COMPACT", 1)
        monkeypatch.setattr(ig, "BOUNCE_COMPACT_MIN", 0)
        packed_x, packed_rays = run()
        np.testing.assert_allclose(packed_x, full_x, rtol=1e-5, atol=1e-6)
        assert full_rays == packed_rays
