"""Geometry tests: mesh factories, OBJ parsing, BVH vs brute-force traversal."""

import numpy as np
import jax.numpy as jnp
import pytest

from ptrt_tpu.core.vec import Vec3, normalize
from ptrt_tpu.geometry.bvh import build_bvh
from ptrt_tpu.geometry.mesh import Mesh, load_obj
from ptrt_tpu.geometry.scene_geom import assemble_geometry, assemble_world
from ptrt_tpu.geometry.transform import Transform3D
from ptrt_tpu.render.traverse import (
    intersect_any,
    intersect_any_brute,
    intersect_closest,
    intersect_closest_brute,
)


def _vec(a):
    a = jnp.asarray(a, jnp.float32)
    return Vec3(a[..., 0], a[..., 1], a[..., 2])


class TestMesh:
    def test_cube_default(self):
        m = Mesh()
        assert m.vertices.shape == (8, 3)
        assert m.faces.shape == (12, 3)

    def test_sphere(self):
        m = Mesh.sphere(segments=8)
        assert m.num_triangles == 2 * 8 * 8
        r = np.linalg.norm(m.vertices, axis=1)
        assert np.allclose(r.max(), 0.5, atol=1e-5)

    def test_plane(self):
        m = Mesh.plane_xz(1.0, 5.0)
        assert m.num_triangles == 2
        assert np.allclose(m.vertices[:, 1], 1.0)

    def test_obj_roundtrip(self, tmp_path):
        p = tmp_path / "tri.obj"
        p.write_text(
            "# comment\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
            "f 1/1/1 2/2/2 3/3/3\nf -3 -1 -2\n"
        )
        v, f = load_obj(str(p), recenter=False)
        assert v.shape == (4, 3)
        assert f.shape == (2, 3)
        assert tuple(f[1]) == (1, 3, 2)  # negative indices resolved

    def test_obj_recenter(self, tmp_path):
        p = tmp_path / "t.obj"
        p.write_text("v 10 10 10\nv 11 10 10\nv 10 11 10\nf 1 2 3\n")
        v, _ = load_obj(str(p), recenter=True)
        assert np.allclose(v.mean(axis=0), 0.0, atol=1e-5)

    def test_transform_bakes_world(self):
        m = Mesh.cube()
        m.transform = Transform3D(position=(5.0, 0.0, 0.0))
        wv = m.world_vertices()
        assert np.allclose(wv.mean(axis=0), [5, 0, 0], atol=1e-5)


class TestBVH:
    def test_build_shapes(self):
        m = Mesh.sphere(16)
        a, b, c = m.triangle_arrays()
        bvh = build_bvh(a, b, c)
        assert bvh.bmin.shape == bvh.bmax.shape
        # every triangle appears exactly once among leaf slots
        got = np.sort(bvh.order[bvh.order >= 0])
        assert np.array_equal(got, np.arange(m.num_triangles))
        # skip pointers are strictly forward
        assert np.all(bvh.skip > np.arange(bvh.num_nodes))

    def test_cube_hit(self):
        geom = assemble_geometry([Mesh.cube()])
        o = _vec(np.array([[0.0, 0.0, 5.0]], np.float32))
        d = _vec(np.array([[0.0, 0.0, -1.0]], np.float32))
        h = intersect_closest(geom, o, d)
        assert bool(h.hit[0])
        assert np.isclose(float(h.t[0]), 4.5, atol=1e-4)
        assert np.isclose(float(h.normal.z[0]), 1.0, atol=1e-4)
        assert bool(h.front_face[0])
        assert int(h.mesh_index[0]) == 0

    def test_miss(self):
        geom = assemble_geometry([Mesh.cube()])
        o = _vec(np.array([[0.0, 5.0, 5.0]], np.float32))
        d = _vec(np.array([[0.0, 0.0, 1.0]], np.float32))
        h = intersect_closest(geom, o, d)
        assert not bool(h.hit[0])
        assert int(h.mesh_index[0]) == -1

    def test_bvh_matches_brute(self, np_rng):
        meshes = [Mesh.sphere(12), Mesh.cube(), Mesh.plane_xz(-1.0, 3.0)]
        meshes[1].transform = Transform3D(position=(1.5, 0.2, -0.3))
        geom = assemble_geometry(meshes)
        n = 256
        o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32) * 0.2
                 + np.array([0, 0, 4], np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)
                           - np.array([0, 0, 2], np.float32)))
        hb = intersect_closest_brute(geom, o, d)
        ht = intersect_closest(geom, o, d)
        assert np.array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
        m = np.asarray(hb.hit)
        assert np.allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=1e-4)
        assert np.array_equal(
            np.asarray(hb.mesh_index)[m], np.asarray(ht.mesh_index)[m]
        )

    def test_any_hit_matches(self, np_rng):
        meshes = [Mesh.sphere(10), Mesh.plane_xz(-1.0, 3.0)]
        geom = assemble_geometry(meshes)
        n = 128
        o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32)
                 + np.array([0, 0, 3], np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)))
        tmax = jnp.full((n,), 10.0)
        ab = intersect_any_brute(geom, o, d, tmax)
        at = intersect_any(geom, o, d, tmax)
        assert np.array_equal(np.asarray(ab), np.asarray(at))

    def test_scattered_ladder_exact(self, np_rng):
        """The scattered-walk ladder profile (SCATTER_SHRINK stages,
        traverse.py) must agree exactly with the camera profile on a
        wavefront big enough to engage compaction (> MIN_COMPACT_LANES),
        with mostly-dead lanes like a real bounce wavefront."""
        from ptrt_tpu.render import traverse as tv

        meshes = [Mesh.sphere(16), Mesh.cube(), Mesh.plane_xz(-1.0, 4.0)]
        geom = assemble_geometry(meshes)
        n = tv.MIN_COMPACT_LANES + 4096
        o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32) * 0.5
                 + np.array([0, 0.2, 3], np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)))
        live = np_rng.uniform(size=n) < 0.4  # bounce-like mostly-dead front
        t0 = jnp.where(jnp.asarray(live), 1e30, -1.0)
        hc = intersect_closest(geom, o, d, t0, scattered=False)
        hs = intersect_closest(geom, o, d, t0, scattered=True)
        assert np.array_equal(np.asarray(hc.hit), np.asarray(hs.hit))
        m = np.asarray(hc.hit)
        assert np.allclose(np.asarray(hc.t)[m], np.asarray(hs.t)[m],
                           rtol=1e-6)
        assert np.array_equal(np.asarray(hc.mesh_index),
                              np.asarray(hs.mesh_index))
        tm = jnp.where(jnp.asarray(live), 8.0, -1.0)
        aa = intersect_any(geom, o, d, tm, scattered=False)
        ab = intersect_any(geom, o, d, tm, scattered=True)
        assert np.array_equal(np.asarray(aa), np.asarray(ab))

    def test_mt_cm_layout_exact(self, np_rng, monkeypatch):
        """The column-major leaf-MT layout (PTRT_MT_CM) must reproduce the
        row-major results bit-for-bit (same gathered values, same test)."""
        from ptrt_tpu.render import traverse as tv

        meshes = [Mesh.sphere(14), Mesh.cube(), Mesh.plane_xz(-1.0, 4.0)]
        geom = assemble_geometry(meshes)
        n = 2048
        o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32) * 0.5
                 + np.array([0, 0.2, 3], np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)))
        h_rm = intersect_closest(geom, o, d)
        a_rm = intersect_any(geom, o, d, jnp.full((n,), 8.0))
        monkeypatch.setattr(tv, "MT_CM", 1)
        h_cm = intersect_closest(geom, o, d)
        a_cm = intersect_any(geom, o, d, jnp.full((n,), 8.0))
        assert np.array_equal(np.asarray(h_rm.hit), np.asarray(h_cm.hit))
        assert np.array_equal(np.asarray(h_rm.t), np.asarray(h_cm.t))
        assert np.array_equal(np.asarray(h_rm.mesh_index),
                              np.asarray(h_cm.mesh_index))
        assert np.array_equal(np.asarray(a_rm), np.asarray(a_cm))

    def test_stack_cm_layout_exact(self, np_rng, monkeypatch):
        """(D, R) walk stacks (PTRT_STACK_CM) must reproduce the (R, D)
        results bit-for-bit, including through compaction stages."""
        from ptrt_tpu.render import traverse as tv

        meshes = [Mesh.sphere(14), Mesh.cube(), Mesh.plane_xz(-1.0, 4.0)]
        geom = assemble_geometry(meshes)
        n = tv.MIN_COMPACT_LANES + 2048  # engage the compaction path
        o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32) * 0.5
                 + np.array([0, 0.2, 3], np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)))
        h_rm = intersect_closest(geom, o, d)
        a_rm = intersect_any(geom, o, d, jnp.full((n,), 8.0))
        monkeypatch.setattr(tv, "STACK_CM", 1)
        monkeypatch.setattr(tv, "NODE_CM", 1)  # exercises both cm layouts
        h_cm = intersect_closest(geom, o, d)
        a_cm = intersect_any(geom, o, d, jnp.full((n,), 8.0))
        assert np.array_equal(np.asarray(h_rm.hit), np.asarray(h_cm.hit))
        assert np.array_equal(np.asarray(h_rm.t), np.asarray(h_cm.t))
        assert np.array_equal(np.asarray(h_rm.mesh_index),
                              np.asarray(h_cm.mesh_index))
        assert np.array_equal(np.asarray(a_rm), np.asarray(a_cm))

    @pytest.mark.parametrize("closest_n,any_n", [(2, 1), (3, 2)])
    def test_leaf_every_exact(self, np_rng, monkeypatch, closest_n, any_n):
        """The composed node-only*(N-1)+full body (PTRT_LEAF_EVERY /
        PTRT_ANY_LEAF_EVERY) must agree with the per-iteration leaf
        schedule bit-for-bit, for both walk types."""
        from ptrt_tpu.render import traverse as tv

        meshes = [Mesh.sphere(14), Mesh.cube(), Mesh.plane_xz(-1.0, 4.0)]
        geom = assemble_geometry(meshes)
        n = tv.MIN_COMPACT_LANES + 2048
        o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32) * 0.5
                 + np.array([0, 0.2, 3], np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)))
        h_a = intersect_closest(geom, o, d)
        any_a = intersect_any(geom, o, d, jnp.full((n,), 8.0))
        monkeypatch.setattr(tv, "LEAF_EVERY", closest_n)
        monkeypatch.setattr(tv, "ANY_LEAF_EVERY", any_n)
        h_b = intersect_closest(geom, o, d)
        any_b = intersect_any(geom, o, d, jnp.full((n,), 8.0))
        assert np.array_equal(np.asarray(h_a.hit), np.asarray(h_b.hit))
        assert np.array_equal(np.asarray(h_a.t), np.asarray(h_b.t))
        assert np.array_equal(np.asarray(h_a.mesh_index),
                              np.asarray(h_b.mesh_index))
        assert np.array_equal(np.asarray(any_a), np.asarray(any_b))

    def test_presplit_exact(self, np_rng, monkeypatch):
        """Build-time triangle pre-splitting (scene_geom._presplit_tris)
        must not change any intersection result — same surface, tighter
        leaf AABBs."""
        import ptrt_tpu.geometry.scene_geom as sg

        meshes = [Mesh.sphere(10), Mesh.plane_xz(-1.0, 30.0)]
        g_ref = assemble_geometry(meshes, presplit=False)
        monkeypatch.setattr(sg, "PRESPLIT_FRAC", 0.05)
        g_split = assemble_geometry(meshes, presplit=True)
        assert g_split.num_tri_slots > g_ref.num_tri_slots  # plane was split
        assert not hasattr(g_split, "_host_order")  # refit must fail loudly
        n = 512
        o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32) * 3.0
                 + np.array([0, 1, 0], np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)))
        ha = intersect_closest(g_ref, o, d)
        hb = intersect_closest(g_split, o, d)
        assert np.array_equal(np.asarray(ha.hit), np.asarray(hb.hit))
        m = np.asarray(ha.hit)
        assert np.allclose(np.asarray(ha.t)[m], np.asarray(hb.t)[m],
                           rtol=1e-5, atol=1e-5)
        assert np.array_equal(np.asarray(ha.mesh_index),
                              np.asarray(hb.mesh_index))
        tm = jnp.full((n,), 10.0)
        assert np.array_equal(np.asarray(intersect_any(g_ref, o, d, tm)),
                              np.asarray(intersect_any(g_split, o, d, tm)))

    @pytest.mark.parametrize("seed", [7, 19, 23])
    def test_fuzz_bvh_vs_brute(self, seed):
        """Seeded fuzz: random triangle soups (including degenerate and
        axis-aligned triangles) and adversarial rays (axis-parallel
        directions, origins inside the soup) must agree with brute force."""
        rng = np.random.default_rng(seed)
        n_tri = 400
        v0 = rng.uniform(-3, 3, (n_tri, 3)).astype(np.float32)
        e = rng.normal(0, 0.7, (n_tri, 2, 3)).astype(np.float32)
        e[: n_tri // 8, 1] = 0.0  # degenerate (zero-area) triangles
        e[n_tri // 8: n_tri // 4, :, 2] = 0.0  # axis-aligned planar tris
        tris = np.stack([v0, v0 + e[:, 0], v0 + e[:, 1]], axis=1)
        m = Mesh.from_triangles(tris)
        geom = assemble_geometry([m])

        n = 1024
        o = _vec(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
        d_raw = rng.normal(size=(n, 3)).astype(np.float32)
        d_raw[: n // 8] = np.array([1, 0, 0], np.float32)  # axis-parallel
        d_raw[n // 8: n // 4] = np.array([0, 0, -1], np.float32)
        d = normalize(_vec(d_raw))
        hb = intersect_closest_brute(geom, o, d)
        ht = intersect_closest(geom, o, d)
        assert np.array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
        mhit = np.asarray(hb.hit)
        assert np.allclose(np.asarray(hb.t)[mhit], np.asarray(ht.t)[mhit],
                           rtol=1e-4)
        tm = jnp.full((n,), 6.0)
        assert np.array_equal(np.asarray(intersect_any_brute(geom, o, d, tm)),
                              np.asarray(intersect_any(geom, o, d, tm)))

    def test_shadow_skips_transmissive(self):
        # glass cube between origin and light must not occlude
        geom = assemble_geometry([Mesh.cube()], material_transmission=[0.98])
        o = _vec(np.array([[0.0, 0.0, 5.0]], np.float32))
        d = _vec(np.array([[0.0, 0.0, -1.0]], np.float32))
        blocked = intersect_any(geom, o, d, jnp.full((1,), 20.0))
        assert not bool(blocked[0])

    def test_dynamic_instance_matches_baked(self, np_rng):
        """Two-level traversal of a transformed dynamic mesh must agree with
        the same transform baked statically (intersection.cuh:438-479)."""
        def build(dynamic: bool):
            cube = Mesh.cube()
            cube.transform = Transform3D(position=(1.2, 0.3, -0.5),
                                         rotation=(0.3, 0.7, 0.1),
                                         scale=(1.5, 0.8, 1.1))
            cube.is_dynamic = dynamic
            ball = Mesh.sphere(12)
            return assemble_world([ball, cube])

        gw = build(True)
        gs = build(False)
        assert len(gw.instances) == 1 and len(gs.instances) == 0
        n = 512
        o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32) * 0.4
                 + np.array([0, 0, 5], np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)
                           - np.array([0, 0, 2.5], np.float32)))
        hw = intersect_closest(gw, o, d)
        hs = intersect_closest(gs, o, d)
        assert np.array_equal(np.asarray(hw.hit), np.asarray(hs.hit))
        m = np.asarray(hs.hit)
        assert np.allclose(np.asarray(hw.t)[m], np.asarray(hs.t)[m],
                           rtol=1e-3, atol=1e-4)
        assert np.array_equal(np.asarray(hw.mesh_index)[m],
                              np.asarray(hs.mesh_index)[m])
        for c in "xyz":
            assert np.allclose(np.asarray(getattr(hw.normal, c))[m],
                               np.asarray(getattr(hs.normal, c))[m],
                               atol=1e-3)
        tm = jnp.full((n,), 10.0)
        assert np.array_equal(np.asarray(intersect_any(gw, o, d, tm)),
                              np.asarray(intersect_any(gs, o, d, tm)))
        # brute path agrees through the same instance machinery
        hb = intersect_closest_brute(gw, o, d)
        assert np.array_equal(np.asarray(hb.hit), np.asarray(hs.hit))
        assert np.allclose(np.asarray(hb.t)[m], np.asarray(hs.t)[m],
                           rtol=1e-3, atol=1e-4)
        assert np.array_equal(np.asarray(intersect_any_brute(gw, o, d, tm)),
                              np.asarray(intersect_any(gs, o, d, tm)))

    def test_incremental_build_counters(self):
        """Transform edits must NOT rebuild any BVH; vertex refills must
        rebuild only that mesh's BLAS (scene.cuh:596-743 semantics)."""
        from ptrt_tpu.scene.pt_scene import Scene

        sc = Scene(32, 32)
        sc.add_plane_xz(-1.0, 5.0)
        cube = sc.add_cube()
        cube.is_dynamic = True
        sc._ensure_device_state()
        assert sc.stats_world_builds == 1
        assert sc.stats_blas_builds == 1
        assert sc.stats_tlas_updates == 0

        # dynamic transform edit: matrix-only update
        cube.transform.set_position(2.0, 0.5, 0.0)
        sc.commit_object_changes()
        sc._ensure_device_state()
        assert sc.stats_world_builds == 1
        assert sc.stats_blas_builds == 1
        assert sc.stats_tlas_updates == 1

        # dynamic vertex refill: one BLAS rebuild, world untouched
        cube.set_triangles(np.array(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32))
        sc.commit_object_changes()
        sc._ensure_device_state()
        assert sc.stats_world_builds == 1
        assert sc.stats_blas_builds == 2

        # static edit: world rebuild, instance untouched
        sc.meshes[0].transform.set_position(0.0, -2.0, 0.0)
        sc.commit_object_changes()
        sc._ensure_device_state()
        assert sc.stats_world_builds == 2
        assert sc.stats_blas_builds == 2

        # no edits: nothing rebuilds
        sc.commit_object_changes()
        sc._ensure_device_state()
        assert sc.stats_world_builds == 2
        assert sc.stats_blas_builds == 2
        assert sc.stats_tlas_updates == 1

    def test_big_scene_traversal(self, np_rng):
        # a denser mesh to force multi-level traversal
        m = Mesh.sphere(32)
        geom = assemble_geometry([m])
        n = 512
        # rays from a ring aimed at the sphere
        # slight off-equator offset avoids exact edge/vertex seam hits
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False) + 1e-3
        y = np.full(n, 0.0123)
        o = _vec(np.stack([3 * np.cos(ang), y, 3 * np.sin(ang)], -1)
                 .astype(np.float32))
        d = normalize(_vec(-np.stack(
            [np.cos(ang), np.zeros(n), np.sin(ang)], -1).astype(np.float32)))
        h = intersect_closest(geom, o, d)
        assert np.asarray(h.hit).all()
        assert np.allclose(np.asarray(h.t), 2.5, atol=0.02)


class TestBatchedInstances:
    def test_many_instances_match_baked(self, np_rng):
        """64 dynamic instances through the batched one-walk TLAS must match
        the same transforms baked statically (intersection.cuh:526-605
        semantics at instance counts the round-2 unrolled loop could not
        reach)."""
        def build(dynamic: bool):
            meshes = [Mesh.plane_xz(-1.0, 12.0)]
            rng = np.random.default_rng(7)
            for k in range(64):
                c = Mesh.cube()
                c.transform = Transform3D(
                    position=tuple(rng.uniform(-6, 6, 3) + [0, 0, 6]),
                    rotation=tuple(rng.uniform(0, 3, 3)),
                    scale=(0.5, 0.5, 0.5))
                c.is_dynamic = dynamic
                meshes.append(c)
            return assemble_world(meshes)

        gw = build(True)
        gs = build(False)
        assert gw.iset is not None and gw.iset.count == 64
        n = 512
        o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32) * 0.3
                 + np.array([0, 1, -2], np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)
                           + np.array([0, -0.2, 2], np.float32)))
        hw = intersect_closest(gw, o, d)
        hs = intersect_closest(gs, o, d)
        assert np.array_equal(np.asarray(hw.hit), np.asarray(hs.hit))
        m = np.asarray(hs.hit)
        assert np.allclose(np.asarray(hw.t)[m], np.asarray(hs.t)[m],
                           rtol=1e-3, atol=1e-4)
        assert np.array_equal(np.asarray(hw.mesh_index)[m],
                              np.asarray(hs.mesh_index)[m])
        tm = jnp.full((n,), 12.0)
        assert np.array_equal(np.asarray(intersect_any(gw, o, d, tm)),
                              np.asarray(intersect_any(gs, o, d, tm)))

    def test_program_size_flat_in_instances(self, np_rng):
        """The traced program must contain a CONSTANT number of traversal
        loops regardless of instance count (one batched walk, not one per
        instance)."""
        import jax

        def build(k):
            meshes = [Mesh.plane_xz(-1.0, 8.0)]
            for i in range(k):
                c = Mesh.cube()
                c.transform = Transform3D(position=(i * 0.7 - 2, 0, 4))
                c.is_dynamic = True
                meshes.append(c)
            return assemble_world(meshes)

        n = 64
        o = _vec(np.zeros((n, 3), np.float32))
        d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)
                           + np.array([0, 0, 2], np.float32)))

        def count_whiles(k):
            g = build(k)
            jx = jax.make_jaxpr(
                lambda oo, dd: intersect_closest(g, oo, dd).t)(o, d)
            return str(jx).count("while[")

        assert count_whiles(2) == count_whiles(16)
