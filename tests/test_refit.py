"""Device-side BVH refit tests (geometry/refit.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptrt_tpu.core.vec import Vec3, normalize
from ptrt_tpu.geometry.mesh import Mesh
from ptrt_tpu.geometry.refit import (build_refit_plan, refit_apply,
                                     refit_root_aabb)
from ptrt_tpu.geometry.scene_geom import assemble_geometry
from ptrt_tpu.render.traverse import (intersect_any, intersect_any_brute,
                                      intersect_closest,
                                      intersect_closest_brute)


def _vec(a):
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
                jnp.asarray(a[:, 2]))


@pytest.fixture
def np_rng():
    return np.random.default_rng(3)


def test_refit_matches_fresh_build(np_rng):
    """A refitted BLAS must trace identically to a brute walk over the NEW
    vertices (tree shape stays from the old build; bounds/tris updated)."""
    m = Mesh.sphere(10)
    geom = assemble_geometry([m])
    plan = build_refit_plan(geom)

    # displace the sphere's triangles (same topology, new shape)
    a, b, c = m.triangle_arrays(world=True)
    wob = 1.0 + 0.25 * np.sin(a[:, 0] * 9.0)
    a2 = (a * wob[:, None]).astype(np.float32)
    b2 = (b * wob[:, None]).astype(np.float32)
    c2 = (c * wob[:, None]).astype(np.float32)

    g2 = jax.jit(lambda v0, v1, v2: refit_apply(geom, plan, v0, v1, v2))(
        jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2))

    n = 256
    o = _vec(np_rng.normal(size=(n, 3)).astype(np.float32) * 0.3
             + np.array([0, 0, 3], np.float32))
    d = normalize(_vec(np_rng.normal(size=(n, 3)).astype(np.float32)
                       - np.array([0, 0, 1.5], np.float32)))
    hb = intersect_closest_brute(g2, o, d)
    ht = intersect_closest(g2, o, d)
    assert np.array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
    msk = np.asarray(hb.hit)
    assert msk.any()
    assert np.allclose(np.asarray(hb.t)[msk], np.asarray(ht.t)[msk],
                       rtol=1e-4)
    tm = jnp.full((n,), 8.0)
    assert np.array_equal(np.asarray(intersect_any_brute(g2, o, d, tm)),
                          np.asarray(intersect_any(g2, o, d, tm)))

    # root AABB follows the new geometry
    lo, hi = refit_root_aabb(g2, plan)
    allv = np.concatenate([a2, b2, c2])
    assert np.allclose(np.asarray(lo), allv.min(axis=0), atol=1e-5)
    assert np.allclose(np.asarray(hi), allv.max(axis=0), atol=1e-5)


def test_refit_is_jittable_and_stable(np_rng):
    """refit_apply must jit (no host sync) and be idempotent for unchanged
    vertices."""
    m = Mesh.cube()
    geom = assemble_geometry([m])
    plan = build_refit_plan(geom)
    a, b, c = m.triangle_arrays(world=True)
    f = jax.jit(lambda v0, v1, v2: refit_apply(geom, plan, v0, v1, v2))
    g2 = f(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    assert np.allclose(np.asarray(g2.node_rows[:, 0:48]),
                       np.asarray(geom.node_rows[:, 0:48]), atol=1e-6)
    # bitwise compare: the packed-id column carries bitcast ints whose
    # float view can be NaN
    assert np.array_equal(np.asarray(g2.tri_rows).view(np.int32),
                          np.asarray(geom.tri_rows).view(np.int32))


def test_scene_refill_uses_device_refit(np_rng):
    """A fixed-topology refill (Triangles hook, fluid surface) must NOT
    rebuild any BVH on host — it refits on device (VERDICT r2 item 4;
    reference analog fastBVHUpdates, scene.cuh:196)."""
    from ptrt_tpu.scene.pt_scene import Scene

    sc = Scene(32, 32)
    sc.add_plane_xz(-1.0, 5.0)
    tris0 = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                        [[0, 0, 1], [1, 0, 1], [0, 1, 1]]], np.float32)
    surf = sc.add_mesh(Mesh.from_triangles(tris0))
    surf.is_dynamic = True
    sc._ensure_device_state()
    assert sc.stats_blas_builds == 1
    assert sc.stats_device_refits == 0

    # same-topology refill -> device refit, no host build
    tris1 = tris0 + np.float32(0.25)
    surf.set_triangles(tris1)
    sc.commit_object_changes()
    sc._ensure_device_state()
    assert sc.stats_blas_builds == 1
    assert sc.stats_device_refits == 1

    # the refitted world traces like a freshly-built one
    sc2 = Scene(32, 32)
    sc2.add_plane_xz(-1.0, 5.0)
    m2 = sc2.add_mesh(Mesh.from_triangles(tris1))
    m2.is_dynamic = True
    sc2._ensure_device_state()
    o = _vec(np.array([[0.3, 0.2, -3.0]] * 8, np.float32))
    dirs = np_rng.normal(size=(8, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 1.0
    d = normalize(_vec(dirs))
    h1 = intersect_closest(sc._geom, o, d)
    h2 = intersect_closest(sc2._geom, o, d)
    assert np.array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    m = np.asarray(h1.hit)
    assert np.allclose(np.asarray(h1.t)[m], np.asarray(h2.t)[m], rtol=1e-5)

    # topology CHANGE still does a full rebuild
    surf.set_triangles(np.concatenate([tris1, tris1 + 1.0]))
    sc.commit_object_changes()
    sc._ensure_device_state()
    assert sc.stats_blas_builds == 2
    assert sc.stats_device_refits == 1
