"""Pipeline-level tests: frame programs, presets, demo scenes, sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptrt_tpu.scene.materials import Material, Materials
from ptrt_tpu.scene.pt_scene import Scene
from ptrt_tpu.scene.rt_scene import RTScene


def _tiny_pt_scene(w=48, h=32):
    sc = Scene(w, h)
    sc.add_plane_xz(-1.0, 8.0, Material.make((0.8, 0.8, 0.8), 0.7))
    sc.add_sphere(8, Materials.PlasticRed()).transform.set_position(0, -0.5, 3)
    sc.add_point_light((2, 4, 1), (1, 1, 1), 2.0, radius=0.1)
    sc.set_camera((0, 0.5, -1), (0, 0, 3))
    return sc


class TestFrameProgram:
    def test_fast_preset_deterministic(self):
        a = _tiny_pt_scene()
        a.set_performance_preset("fast")
        a.perf.resolution_scale = 1.0
        img1 = a.render_frame()
        b = _tiny_pt_scene()
        b.set_performance_preset("fast")
        b.perf.resolution_scale = 1.0
        img2 = b.render_frame()
        assert np.array_equal(img1, img2)  # same seed -> same image

    def test_denoised_frame_finite(self):
        sc = _tiny_pt_scene()
        sc.set_performance_preset("balanced")
        for _ in range(3):
            img = sc.render_frame()
        assert img.shape == (32, 48, 3)
        assert img.max() > 0

    def test_resolution_scale_upscales(self):
        sc = _tiny_pt_scene()
        sc.set_performance_preset("fast")  # 0.35x internal res
        img = sc.render_frame()
        assert img.shape == (32, 48, 3)

    def test_wireframe(self):
        sc = _tiny_pt_scene()
        img = sc.render_wireframe(0.1)
        assert img.shape == (32, 48, 3)
        assert img.std() > 0  # edges visible

    def test_render_average_converges_smoother(self):
        sc = _tiny_pt_scene()
        sc.perf.enable_denoiser = False
        sc.perf.enable_bloom = False
        one = sc.render_average(1).astype(np.float64)
        sc2 = _tiny_pt_scene()
        sc2.perf.enable_denoiser = False
        sc2.perf.enable_bloom = False
        many = sc2.render_average(8).astype(np.float64)

        def noise(img):
            # mean absolute Laplacian as a noise proxy
            g = img.mean(-1)
            return np.abs(4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
                          - g[1:-1, :-2] - g[1:-1, 2:]).mean()

        assert noise(many) < noise(one)

    def test_progressive_accumulation_converges(self):
        """VERDICT r4 #5: with the denoiser off, a static view accumulates
        across frames (``scene.cuh:86-88``) — displayed noise decreases
        with frame count, and edits/camera moves reset the state."""
        sc = _tiny_pt_scene()
        sc.perf.enable_denoiser = False
        sc.perf.enable_bloom = False
        frames = [sc.render_frame().astype(np.float64) for _ in range(6)]
        # successive displayed frames differ by the newest sample / n:
        # early deltas are much larger than late deltas
        d_early = np.abs(frames[1] - frames[0]).mean()
        d_late = np.abs(frames[5] - frames[4]).mean()
        assert sc._accum_state is not None
        assert int(sc._accum_state[1]) == 6
        assert d_late < d_early * 0.6
        # frame 1 of a progressive run is bit-identical to a
        # non-progressive frame (sum of one sample x 1.0)
        sc2 = _tiny_pt_scene()
        sc2.perf.enable_denoiser = False
        sc2.perf.enable_bloom = False
        sc2.perf.progressive_accumulation = False
        assert np.array_equal(np.asarray(frames[0], np.uint8),
                              sc2.render_frame())
        # camera move resets accumulation
        sc.set_camera((0, 0.6, -1), (0, 0, 3))
        sc.render_frame()
        assert int(sc._accum_state[1]) == 1
        # scene edit resets accumulation
        sc.commit_material_changes()
        assert sc._accum_state is None
        sc.render_frame()
        assert int(sc._accum_state[1]) == 1

    def test_rt_and_pt_roughly_agree_on_sky(self):
        pt = Scene(32, 24)
        pt.set_sky_gradient((0.5, 0.7, 1.0), (1.0, 1.0, 1.0))
        pt.perf.enable_denoiser = False
        pt.perf.enable_bloom = False
        img_pt = pt.render_frame().astype(float)
        rt = RTScene(32, 24)
        rt.set_sky_gradient((0.5, 0.7, 1.0), (1.0, 1.0, 1.0))
        img_rt = rt.render_frame().astype(float)
        # different tonemaps (ACES vs Reinhard), so just directional checks:
        # both show blue-dominant sky at top
        assert img_pt[0, :, 2].mean() > img_pt[0, :, 0].mean()
        assert img_rt[0, :, 2].mean() > img_rt[0, :, 0].mean()


class TestDemoScenes:
    @pytest.mark.parametrize("sid", list(range(11)))
    def test_pt_scene_builds(self, sid):
        from ptrt_tpu.app.demo_scenes import build_scene_by_id

        sc, name = build_scene_by_id(sid, 32, 24)
        assert name
        sc._ensure_device_state()
        assert sc._geom.num_tri_slots > 0

    @pytest.mark.parametrize("sid", list(range(8)))
    def test_rt_scene_builds(self, sid):
        from ptrt_tpu.app.rt_demo_scenes import build_scene_by_id

        sc, name = build_scene_by_id(sid, 32, 24)
        assert name
        sc._ensure()
        assert sc._geom.num_tri_slots > 0

    def test_unified_presets_render(self):
        from ptrt_tpu.scene.unified import (UnifiedSceneBuilder,
                                            UnifiedScenePresets)

        u = UnifiedScenePresets.MetalDemo(32, 24)
        sc = UnifiedSceneBuilder.build_pt_scene(u)
        sc.set_performance_preset("fast")
        sc.perf.resolution_scale = 1.0
        img = sc.render_frame()
        assert img.mean() > 1  # not black


class TestSharding:
    def test_pixel_mesh_sharded_trace(self):
        from ptrt_tpu.parallel.sharding import make_pixel_mesh, shard_pixels
        import ptrt_tpu.render.pipeline as pl

        assert len(jax.devices()) >= 8  # conftest virtual CPU devices
        mesh = make_pixel_mesh(8)
        sc = _tiny_pt_scene(64, 32)
        sc._ensure_device_state()
        rng = shard_pixels(mesh, sc._rng_state)

        def frame(rng_state):
            state, bufs = pl.trace_frame(
                sc._geom, sc._mat_table, sc._light_table, len(sc.lights),
                sc._sky(), sc.camera, rng_state, jnp.int32(0), 64, 32, 1, 2,
                split=False, use_brute=False, blue_noise_tbl=sc._blue_noise)
            return pl.tonemap_to_rgb8(bufs.color)

        img_sharded = np.asarray(jax.jit(frame)(rng))
        img_single = np.asarray(jax.jit(frame)(sc._rng_state))
        assert np.array_equal(img_sharded, img_single)

    def test_full_frame_sharded_equivalence(self):
        """The COMPLETE frame program (split trace + motion vectors + SVGF
        denoise with its halo-exchange convolutions + bloom + tonemap) on the
        8-device pixel mesh must match the single-device pixels exactly."""
        from ptrt_tpu.parallel.sharding import make_pixel_mesh, shard_pixels
        import ptrt_tpu.render.pipeline as pl
        from ptrt_tpu.render.bloom import apply_bloom
        from ptrt_tpu.render.denoiser import (denoise_frame,
                                              init_denoiser_state)
        from ptrt_tpu.render.motion import motion_vectors

        mesh = make_pixel_mesh(8)
        dy, dx = mesh.devices.shape
        h, w = 8 * dy, 16 * dx
        sc = _tiny_pt_scene(w, h)
        sc._ensure_device_state()
        prev_vp = sc.camera.get_view_proj()
        den0 = init_denoiser_state(h, w)

        def frame(rng_state, den_state):
            state, bufs = pl.trace_frame(
                sc._geom, sc._mat_table, sc._light_table, len(sc.lights),
                sc._sky(), sc.camera, rng_state, jnp.int32(0), w, h, 1, 2,
                split=True, use_brute=False, blue_noise_tbl=sc._blue_noise)
            mv = motion_vectors(bufs.depth, sc.camera, prev_vp, w, h)
            color, den_state = denoise_frame(bufs, mv, den_state, sc.camera,
                                             jnp.int32(0))
            color = apply_bloom(color)
            return pl.tonemap_to_rgb8(color), den_state

        jf = jax.jit(frame)
        img_single, den_single = jf(sc._rng_state, den0)
        rng_sh = shard_pixels(mesh, sc._rng_state)
        den_sh = jax.tree_util.tree_map(
            lambda a: shard_pixels(mesh, a) if jnp.ndim(a) >= 2 else a, den0)
        img_sharded, den_sharded = jf(rng_sh, den_sh)
        assert np.array_equal(np.asarray(img_sharded), np.asarray(img_single))
        # second frame: history state round-trips through the sharded program
        img2_s, _ = jf(sc._rng_state, den_sharded)
        img2_1, _ = jf(sc._rng_state, den_single)
        assert np.array_equal(np.asarray(img2_s), np.asarray(img2_1))


class TestCLI:
    def test_parse_arguments(self):
        from ptrt_tpu.app.app_utils import parse_arguments

        cfg = parse_arguments(["-s", "3", "-w", "320", "-h", "180", "-o", "x"])
        assert (cfg.scene_id, cfg.width, cfg.height, cfg.output_name) == \
            (3, 320, 180, "x")
        assert parse_arguments(["--help"]).show_help
        assert parse_arguments(["--bogus"]).show_help

    def test_camera_controller(self):
        from ptrt_tpu.app.app_utils import CameraController, InputState

        sc = _tiny_pt_scene()
        ctl = CameraController()
        ctl.init_from_scene(sc)
        p0 = list(ctl.pos)
        ctl.update(sc, InputState(keys={"w"}), 0.1)
        assert ctl.pos != p0
        fc = sc.frame_count
        assert fc == 0  # set_camera reset accumulation


class TestMultichipCollectives:
    def test_sharded_frame_has_no_scene_table_allgather(self):
        """Multi-chip cost canary (VERDICT r2 item 9): in the sharded frame
        program the scene tables (BVH node rows, tri rows, materials) are
        REPLICATED — XLA must not insert an all-gather/all-to-all that
        materializes a table across the mesh.  Halo exchanges
        (collective-permute) and small reductions are expected."""
        import re

        from ptrt_tpu.parallel.sharding import make_pixel_mesh, shard_pixels
        import ptrt_tpu.render.pipeline as pl

        from ptrt_tpu.scene.materials import Material
        from ptrt_tpu.scene.pt_scene import Scene

        mesh = make_pixel_mesh(8)
        dy, dx = mesh.devices.shape
        h, w = 12 * dy, 12 * dx
        # enough triangles that the table dims cannot collide with any
        # image-shaped intermediate (the shape-string match below)
        sc = Scene(w, h)
        sc.add_plane_xz(-1.0, 6.0, Material.make((0.8, 0.8, 0.8), 0.7))
        sc.add_sphere(18, Material.make((0.8, 0.2, 0.2), 0.5))
        sc.add_point_light((2, 4, 2), (1, 1, 1), 3.0, radius=0.2)
        sc.set_camera((0, 0.5, -2), (0, 0, 2), fov=60)
        sc._ensure_device_state()
        g = sc._geom
        assert g.node_rows.shape[0] not in (h, w, h * w)
        nshape = f"{g.node_rows.shape[0]},{g.node_rows.shape[1]}]"
        tshape = f"{g.tri_rows.shape[0]},{g.tri_rows.shape[1]}]"

        def frame(geom, rng_state):
            state, bufs = pl.trace_frame(
                geom, sc._mat_table, sc._light_table, len(sc.lights),
                sc._sky(), sc.camera, rng_state, jnp.int32(0), w, h, 1, 2,
                split=False, use_brute=False,
                blue_noise_tbl=sc._blue_noise)
            return pl.tonemap_to_rgb8(bufs.color)

        # tables enter as explicitly-replicated ARGUMENTS (as the real
        # frame program passes them) — a closure capture would let GSPMD
        # shard them arbitrarily and re-gather per use
        from ptrt_tpu.parallel.sharding import replicate

        g_rep = replicate(mesh, g)
        rng_sh = shard_pixels(mesh, sc._rng_state)
        txt = jax.jit(frame).lower(g_rep, rng_sh).compile().as_text()
        bad = [ln for ln in txt.splitlines()
               if re.search(r"all-gather|all-to-all", ln)
               and (nshape in ln or tshape in ln)]
        assert not bad, f"scene-table collective found:\n" + "\n".join(bad[:4])
        # the program IS sharded (some collective communication exists)
        assert re.search(r"collective-permute|all-reduce|all-gather", txt)

    def test_tiled_trace_equals_whole_frame(self):
        """trace_frame(tile=...) must be bit-identical to the whole-frame
        render on every tile: camera uv, blue noise and RNG salts all key
        off GLOBAL pixel coordinates (the invariant shard_mapped_trace
        relies on)."""
        import ptrt_tpu.render.pipeline as pl
        from ptrt_tpu.scene.materials import Material
        from ptrt_tpu.scene.pt_scene import Scene

        h, w = 32, 64
        sc = Scene(w, h)
        sc.add_plane_xz(-1.0, 6.0, Material.make((0.8, 0.8, 0.8), 0.7))
        sc.add_sphere(12, Material.make((0.8, 0.2, 0.2), 0.5))
        sc.add_point_light((2, 4, 2), (1, 1, 1), 3.0, radius=0.2)
        sc.set_camera((0, 0.5, -2), (0, 0, 2), fov=60)
        sc._ensure_device_state()
        common = (sc._geom, sc._mat_table, sc._light_table, len(sc.lights),
                  sc._sky(), sc.camera)

        _, full = pl.trace_frame(*common, sc._rng_state, jnp.int32(0), w, h,
                                 2, 3, split=False, use_brute=False,
                                 blue_noise_tbl=sc._blue_noise)
        th, tw = h // 2, w // 2
        for y0 in (0, th):
            for x0 in (0, tw):
                rng_tile = sc._rng_state[y0:y0 + th, x0:x0 + tw]
                _, bufs = pl.trace_frame(
                    *common, rng_tile, jnp.int32(0), tw, th, 2, 3,
                    split=False, use_brute=False,
                    blue_noise_tbl=sc._blue_noise,
                    tile=(jnp.int32(y0), jnp.int32(x0), h, w))
                ref = np.asarray(full.color.x)[y0:y0 + th, x0:x0 + tw]
                assert np.array_equal(np.asarray(bufs.color.x), ref)
                refd = np.asarray(full.depth)[y0:y0 + th, x0:x0 + tw]
                assert np.array_equal(np.asarray(bufs.depth), refd)

    def test_shard_mapped_trace_is_collective_free(self):
        """The canonical multi-chip trace (shard_mapped_trace): each device
        traces its own tile with its own compaction buffers, so the
        compiled trace contains NO all-gather/all-to-all at all (GSPMD on
        the same program inserted 85 ray-state all-gathers,
        tools/prof_mesh.py) — and the result is bit-identical to the
        single-device frame."""
        from ptrt_tpu.parallel.sharding import make_pixel_mesh, shard_pixels
        from ptrt_tpu.scene.pt_scene import _frame_fn
        from ptrt_tpu.scene.materials import Material
        from ptrt_tpu.scene.pt_scene import Scene
        from ptrt_tpu.render.denoiser import init_denoiser_state

        mesh = make_pixel_mesh(8)
        dy, dx = mesh.devices.shape
        h, w = 16 * dy, 16 * dx
        sc = Scene(w, h)
        sc.add_plane_xz(-1.0, 6.0, Material.make((0.8, 0.8, 0.8), 0.7))
        sc.add_sphere(18, Material.make((0.8, 0.2, 0.2), 0.5))
        sc.add_point_light((2, 4, 2), (1, 1, 1), 3.0, radius=0.2)
        sc.set_camera((0, 0.5, -2), (0, 0, 2), fov=60)
        sc._ensure_device_state()
        den0 = init_denoiser_state(h, w)
        args = lambda r, d: (sc._geom, sc._mat_table, sc._light_table,
                             sc._sky(), sc.camera, r, jnp.int32(1),
                             sc.prev_view_proj, d, sc._blue_noise)
        # trace-only (no denoiser) so the assertion isolates the trace
        kw = dict(n_lights=len(sc.lights), use_brute=False,
                  has_env=sc.env_map is not None)
        body1 = _frame_fn(w, h, w, h, 1, 3, False, False, **kw)
        img1, _, _ = jax.jit(lambda r, d: body1(*args(r, d)))(
            sc._rng_state, den0)
        body8 = _frame_fn(w, h, w, h, 1, 3, False, False, mesh=mesh, **kw)
        rng8 = shard_pixels(mesh, sc._rng_state)
        f8 = jax.jit(lambda r, d: body8(*args(r, d)))
        img8, _, _ = f8(rng8, den0)
        assert np.array_equal(np.asarray(img1), np.asarray(img8))
        txt = f8.lower(rng8, den0).compile().as_text()
        assert txt.count("all-gather(") == 0
        assert txt.count("all-to-all") == 0
