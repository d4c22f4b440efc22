"""Packet (ray-tile) traversal tests: exactness vs the per-ray walk.

The packet walk (render/packet.py) must return identical hits to the
per-ray walk — its interval slab tests are conservative (can only ADD
node visits) and the per-ray MT bounds are exact.  These tests pin that
on direct packet calls, on the grid dispatch (padding + reorder), and on
a full frame through the integrator's coherence gating.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3
from ptrt_tpu.render import packet as pk
from ptrt_tpu.render import traverse as tv
from ptrt_tpu.scene.materials import Material, Materials
from ptrt_tpu.scene.pt_scene import Scene


@pytest.fixture(scope="module")
def scene_geom():
    sc = Scene(64, 32)
    sc.add_plane_xz(-1.0, 10.0, Material.make((0.8, 0.8, 0.8), 0.7))
    sc.add_sphere(12, Materials.PlasticRed()).transform.set_position(
        0, -0.5, 4)
    sc.add_sphere(8, Materials.Gold()).transform.set_position(1.5, 0.0, 5)
    sc.add_sphere(8, Materials.Glass()).transform.set_position(-1.5, 0.2, 5)
    sc.set_camera((0, 0.5, 0), (0, 0, 4), fov=60)
    sc._ensure_device_state()
    g = sc._geom
    return sc, (g.static if hasattr(g, "static") else g)


def _camera_rays(sc, h, w):
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    u = jnp.asarray((xs.ravel() + 0.5) / w, jnp.float32)
    v = jnp.asarray((ys.ravel() + 0.5) / h, jnp.float32)
    rb = sc.camera.get_ray_simple(u, v)
    o = rb.origin.map(lambda c: jnp.broadcast_to(c, (h * w,)))
    return o, rb.direction


class TestPacketWalks:
    def test_closest_matches_per_ray(self, scene_geom):
        sc, g = scene_geom
        h, w = 32, 64
        o, d = _camera_rays(sc, h, w)
        t_ray = np.asarray(tv.intersect_closest(g, o, d).t).reshape(h, w)
        to_p = lambda c: pk.tile_to_packets(c.reshape(h, w), h, w, 4, 4)
        s = pk.packet_closest(g, o.map(to_p), d.map(to_p),
                              jnp.full(((h // 4) * (w // 4), 16), 1e30))
        t_pk = np.asarray(pk.packets_to_tile(s["t"], h, w, 4, 4))
        miss = t_ray > 1e29
        assert np.array_equal(miss, t_pk > 1e29)
        np.testing.assert_allclose(np.where(miss, 0, t_ray),
                                   np.where(miss, 0, t_pk), rtol=1e-5)

    def test_any_matches_per_ray(self, scene_geom):
        sc, g = scene_geom
        h, w = 32, 64
        o, d = _camera_rays(sc, h, w)
        tf = jnp.full((h * w,), 6.0)
        h_ray = np.asarray(tv.intersect_any(g, o, d, tf)).reshape(h, w)
        to_p = lambda c: pk.tile_to_packets(c.reshape(h, w), h, w)
        h_pk = np.asarray(pk.packets_to_tile(
            pk.packet_any(g, o.map(to_p), d.map(to_p), to_p(tf)), h, w))
        assert np.array_equal(h_ray, h_pk)

    def test_dead_rays_stay_dead(self, scene_geom):
        sc, g = scene_geom
        h, w = 16, 16
        o, d = _camera_rays(sc, h, w)
        t0 = jnp.where(jnp.arange(h * w) % 3 == 0, -1.0, 1e30)
        to_p = lambda c: pk.tile_to_packets(c.reshape(h, w), h, w, 4, 4)
        s = pk.packet_closest(g, o.map(to_p), d.map(to_p), to_p(t0))
        best = np.asarray(pk.packets_to_tile(s["best"], h, w, 4, 4)).ravel()
        assert np.all(best[::3] == -1)

    def test_grid_dispatch_pads_odd_sizes(self, scene_geom):
        """intersect_closest/any with coherent=True on a non-tile-multiple
        (h, w) grid must agree with the per-ray path (padding with dead
        rays)."""
        sc, g = scene_geom
        h, w = 30, 46  # not multiples of 4 or 8
        o, d = _camera_rays(sc, h, w)
        o2 = o.map(lambda c: c.reshape(h, w))
        d2 = d.map(lambda c: c.reshape(h, w))
        old = tv._PK_MIN_PIXELS
        tv._PK_MIN_PIXELS = 0
        try:
            hit_c = tv.intersect_closest(g, o2, d2, coherent=True)
            hit_r = tv.intersect_closest(g, o2, d2)
            np.testing.assert_allclose(np.asarray(hit_c.t),
                                       np.asarray(hit_r.t), rtol=1e-5)
            assert np.array_equal(np.asarray(hit_c.mesh_index),
                                  np.asarray(hit_r.mesh_index))
            tf = jnp.full((h, w), 6.0)
            a_c = tv.intersect_any(g, o2, d2, tf, coherent=True)
            a_r = tv.intersect_any(g, o2, d2, tf)
            assert np.array_equal(np.asarray(a_c), np.asarray(a_r))
        finally:
            tv._PK_MIN_PIXELS = old

    def test_hybrid_handoff_above_compaction_threshold(self, scene_geom):
        """A coherent grid big enough to engage the compaction machinery
        (> MIN_COMPACT_LANES) exercises the skip_pass1 handoff tails the
        small-grid tests never reach; results must match per-ray."""
        sc, g = scene_geom
        h, w = 96, 192  # 18432 > MIN_COMPACT_LANES
        o, d = _camera_rays(sc, h, w)
        o2 = o.map(lambda c: c.reshape(h, w))
        d2 = d.map(lambda c: c.reshape(h, w))
        old = tv._PK_MIN_PIXELS
        tv._PK_MIN_PIXELS = 0
        try:
            hit_c = tv.intersect_closest(g, o2, d2, coherent=True)
            hit_r = tv.intersect_closest(g, o2, d2)
            m = np.asarray(hit_r.hit)
            assert np.array_equal(m, np.asarray(hit_c.hit))
            np.testing.assert_allclose(np.asarray(hit_c.t)[m],
                                       np.asarray(hit_r.t)[m], rtol=1e-5)
            tf = jnp.full((h, w), 6.0)
            a_c = tv.intersect_any(g, o2, d2, tf, coherent=True)
            a_r = tv.intersect_any(g, o2, d2, tf)
            assert np.array_equal(np.asarray(a_c), np.asarray(a_r))
        finally:
            tv._PK_MIN_PIXELS = old

    def test_full_frame_with_packets_matches(self, scene_geom):
        """A rendered frame with the packet paths forced on equals the
        per-ray frame (same RNG stream restored between renders; closest-t
        TIES may resolve to a different co-located triangle under the
        packet's different visit order, so a handful of edge pixels may
        shift by a quantization step)."""
        sc, _ = scene_geom
        old = tv._PK_MIN_PIXELS
        rng0 = sc._rng_state
        fc0 = sc.frame_count
        try:
            tv._PK_MIN_PIXELS = 1 << 30
            img_ray = np.asarray(sc.render_frame())
            sc.reset_accumulation()
            # full state restore: SVGF history now survives
            # reset_accumulation (it is motion-compensated), so the
            # bit-compare needs the explicit hard reset too
            sc.reset_denoiser_history()
            sc._rng_state = rng0
            sc.frame_count = fc0
            tv._PK_MIN_PIXELS = 0
            img_pk = np.asarray(sc.render_frame())
        finally:
            tv._PK_MIN_PIXELS = old
        diff = np.abs(img_ray.astype(int) - img_pk.astype(int))
        assert (diff > 2).mean() < 0.001, diff.max()


class TestSortedPacketScattered:
    def test_sorted_packet_closest_matches_per_ray(self, scene_geom,
                                                   monkeypatch):
        """Round-5 sorted-packet scattered path (traverse.PTRT_SORTPK):
        binned packets + shared tail must reproduce the per-ray walk's
        hits exactly (closest-t ties aside) — including dead lanes and a
        non-multiple-of-64 wavefront (pad path)."""
        sc, g = scene_geom
        h, w = 32, 64
        o, d = _camera_rays(sc, h, w)
        hit0 = tv.intersect_closest(g, o, d)
        # scattered bounce-like wavefront: origins on surfaces, random
        # directions, ~40% dead lanes; odd count exercises padding
        rng = np.random.default_rng(11)
        n = h * w - 37
        cut = lambda c: c[:n]
        oo = Vec3(cut(hit0.point.x + hit0.normal.x * 1e-3),
                  cut(hit0.point.y + hit0.normal.y * 1e-3),
                  cut(hit0.point.z + hit0.normal.z * 1e-3))
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        nrm = np.linalg.norm(dirs, axis=1, keepdims=True)
        dd = Vec3(*(jnp.asarray(dirs[:, k] / nrm[:, 0]) for k in range(3)))
        live = np.asarray(cut(hit0.hit)) & (rng.uniform(size=n) > 0.4)
        t0 = jnp.asarray(np.where(live, 1e30, -1.0).astype(np.float32))

        base = tv._closest_state(g, oo, dd, t0, scattered=True)
        monkeypatch.setattr(tv, "SORTPK", 1)
        monkeypatch.setattr(tv, "SORTPK_MIN_LANES", 0)
        srt = tv._closest_state(g, oo, dd, t0, scattered=True)
        assert np.array_equal(np.asarray(base["mesh"] >= 0),
                              np.asarray(srt["mesh"] >= 0))
        msk = np.asarray(base["mesh"] >= 0)
        assert msk.any()
        np.testing.assert_allclose(np.asarray(base["t"])[msk],
                                   np.asarray(srt["t"])[msk], rtol=1e-5)
