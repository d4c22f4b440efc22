"""Scene-layer tests: unified scene, builders, animation, RT scene, games."""

import numpy as np
import jax.numpy as jnp
import pytest

from ptrt_tpu.scene.materials import Material, MaterialTable, Materials
from ptrt_tpu.scene.lights import Light, LightTable, LightType
from ptrt_tpu.scene.unified import (
    EaseType,
    TransformAnimation,
    UnifiedMeshDesc,
    UnifiedScene,
    UnifiedSceneBuilder,
    UnifiedScenePresets,
    apply_easing,
)


class TestMaterialTable:
    def test_packed_matches_soa(self):
        mats = [Materials.Gold(), Materials.Glass(), Materials.Velvet((1, 0, 0))]
        t = MaterialTable.from_materials(mats)
        lanes = t.gather(jnp.array([0, 1, 2, 1]))
        assert np.allclose(np.asarray(lanes.albedo.x)[0], 1.0)
        assert np.isclose(float(lanes.transmission[1]), 0.98)
        assert np.isclose(float(lanes.transmission[3]), 0.98)
        assert np.isclose(float(lanes.sheen[2]), 1.0)
        assert np.isclose(float(lanes.iridescence_thickness[0]), 550.0)
        # SoA columns agree with packed gather
        assert np.isclose(float(t.roughness[1]), float(lanes.roughness[1]))

    def test_derived_specular(self):
        m = Material.make((1.0, 0.5, 0.0), 0.3, 1.0)
        assert np.allclose(m.specular, (1.0, 0.5, 0.0))  # metallic lerp
        m2 = Material.make((1.0, 0.5, 0.0), 0.3, 0.0)
        assert np.allclose(m2.specular, (0.04, 0.04, 0.04))

    def test_simple_material_flag(self):
        t = MaterialTable.from_materials(
            [Materials.PlainClay(), Materials.Gold()])
        lanes = t.gather(jnp.array([0, 1]))
        simple = np.asarray(lanes.is_simple())
        assert simple[0] and not simple[1]


class TestLights:
    def test_spot_cones_are_cosines(self):
        lt = Light.spot((0, 5, 0), (0, -1, 0), inner_cone=0.5, outer_cone=0.7)
        assert np.isclose(lt.inner_cone, np.cos(0.5))
        assert np.isclose(lt.outer_cone, np.cos(0.7))

    def test_packed_table(self):
        t = LightTable.from_lights([
            Light.point((1, 2, 3), (1, 0, 0), 5.0),
            Light.directional((0, -1, 0)),
        ])
        assert t.packed.shape == (2, 18)
        assert int(t.packed[1, 0]) == int(LightType.DIRECTIONAL)
        assert np.isclose(float(t.packed[0, 10]), 5.0)  # intensity

    def test_area_keeps_type_and_extent(self):
        """IMPROVEMENT over the reference: Area lights are sampled as real
        rects (render/nee.py), not degraded to points
        (PTRTtransfer.cuh:1833)."""
        t = LightTable.from_lights([Light.area((0, 5, 0), (0, -1, 0),
                                               2.0, 3.0)])
        assert int(t.type[0]) == int(LightType.AREA)
        assert np.isclose(float(t.packed[0, 15]), 2.0)  # width
        assert np.isclose(float(t.packed[0, 16]), 3.0)  # height


class TestAnimation:
    def test_easing_endpoints(self):
        for e in EaseType:
            assert np.isclose(apply_easing(0.0, e), 0.0, atol=1e-6)
            assert np.isclose(apply_easing(1.0, e), 1.0, atol=1e-3)

    def test_keyframe_eval(self):
        a = TransformAnimation()
        a.add_position_key(0.0, (0, 0, 0)).add_position_key(2.0, (4, 0, 0))
        t = a.evaluate(1.0)
        assert np.allclose(t.position, (2, 0, 0))
        assert np.allclose(a.evaluate(5.0).position, (4, 0, 0))  # clamp

    def test_looping(self):
        a = TransformAnimation().set_looping(True)
        a.add_position_key(0.0, (0, 0, 0)).add_position_key(2.0, (4, 0, 0))
        assert np.allclose(a.evaluate(3.0).position, a.evaluate(1.0).position)

    def test_scene_animation_marks_dirty(self):
        u = UnifiedScene(64, 64)
        h = u.add_cube().set_name("c")
        u.clear_dirty_flags()
        anim = TransformAnimation()
        anim.add_position_key(0.0, (0, 0, 0)).add_position_key(1.0, (1, 1, 1))
        u.add_animation("c", anim)
        u.update_animations(0.5)
        assert u.has_dirty_meshes()
        assert np.allclose(u.meshes[h.index].transform.position,
                           (0.5, 0.5, 0.5))


class TestUnifiedBuild:
    def test_build_pt_scene(self):
        u = UnifiedScenePresets.MetalDemo(64, 36)
        scene = UnifiedSceneBuilder.build_pt_scene(u)
        assert len(scene.meshes) == u.mesh_count
        assert len(scene.lights) == 3
        # static transforms were baked: sphere at x=-6 world space
        wv = scene.meshes[1].world_vertices()
        assert abs(wv[:, 0].mean() - (-6)) < 0.2

    def test_incremental_update(self):
        u = UnifiedScenePresets.Empty(32, 32)
        h = u.add_cube(Materials.PlasticRed())
        h.set_dynamic(True).set_position((1, 0, 0))
        scene = UnifiedSceneBuilder.build_pt_scene(u)
        n0 = len(scene.meshes)
        h.set_position((2, 0, 0))
        UnifiedSceneBuilder.update_pt_scene(scene, u)
        assert len(scene.meshes) == n0
        assert np.allclose(scene.meshes[h.index].transform.position,
                           (2, 0, 0))
        assert scene.frame_count == 0  # accumulation reset

    def test_spawn_after_build(self):
        u = UnifiedScenePresets.Empty(32, 32)
        scene = UnifiedSceneBuilder.build_pt_scene(u)
        n0 = len(scene.meshes)
        u.instantiate_object(UnifiedMeshDesc.Cube(Materials.Gold()), "spawned")
        UnifiedSceneBuilder.update_pt_scene(scene, u)
        assert len(scene.meshes) == n0 + 1

    def test_build_rt_scene(self):
        u = UnifiedScenePresets.GlassDemo(64, 36)
        scene = UnifiedSceneBuilder.build_rt_scene(u)
        assert len(scene.meshes) == u.mesh_count
        assert scene._has_glass()

    def test_material_library(self):
        u = UnifiedScene(32, 32)
        u.add_library_material("metal", Materials.Gold())
        h = u.add_cube()
        h.use_library_material("metal")
        scene = UnifiedSceneBuilder.build_pt_scene(u)
        assert scene.mesh_materials[0].name == "Gold"


class TestGames:
    def test_cube_slider_step(self):
        from ptrt_tpu.games.cube_slider import init_state, step

        s = init_state()
        for _ in range(30):
            s = step(s, jnp.float32(0.5), jnp.float32(1 / 30))
        assert float(s.t) > 0.9
        assert float(s.score) > 0.0
        assert float(s.player_x) != 0.0

    def test_fluid_conserves_and_damps(self):
        from ptrt_tpu.games.fluid import (heightfield_to_triangles,
                                          init_state, step)

        s = init_state(16)
        e0 = float((s.height**2).sum())
        for _ in range(50):
            s = step(s, jnp.float32(1 / 30), jnp.float32(6.0),
                     jnp.float32(0.99))
        assert np.isfinite(np.asarray(s.height)).all()
        tris = heightfield_to_triangles(s.height)
        assert tris.shape == (2 * 15 * 15, 3, 3)

    def test_tycoon_economy(self):
        from ptrt_tpu.games.tycoon import TycoonGame

        g = TycoonGame(32, 18)
        assert g.place_building(2, 2, 0)
        assert not g.place_building(2, 2, 0)  # occupied
        assert float(g.economy.income) > 0
        g.update(10.0)
        assert float(g.economy.money) > 50.0 - 50.0  # earned income
        assert g.demolish(2, 2)
        assert float(g.economy.income) == 0.0


class TestHDR:
    def test_roundtrip_quantized(self, tmp_path):
        from ptrt_tpu.utils.hdr import load_hdr, save_hdr

        rng = np.random.default_rng(0)
        img = (rng.random((16, 32, 3)).astype(np.float32) * 8)
        p = str(tmp_path / "t.hdr")
        save_hdr(p, img)
        back = load_hdr(p)
        # RGBE shared-exponent: one quantization step is maxc/(256*m) with
        # frexp mantissa m in [0.5, 1) -> error bounded by maxc/128
        maxc = img.max(axis=-1, keepdims=True)
        assert np.all(np.abs(back - img) <= maxc / 128 + 1e-5)
