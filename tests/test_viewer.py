"""Viewer + VisualizationController tests (headless backends)."""

import json
import urllib.request

import numpy as np
import pytest

from ptrt_tpu.app.app_utils import InputState
from ptrt_tpu.app.viewer import HttpViewer, run_interactive
from ptrt_tpu.app.viz_controller import VisualizationController
from ptrt_tpu.scene.materials import Material
from ptrt_tpu.scene.pt_scene import Scene


def tiny_scene(w=64, h=36):
    sc = Scene(w, h)
    sc.add_sphere(8, Material.make((1.0, 0.2, 0.2)))
    sc.meshes[-1].transform.set_position(0, 0, 3)
    sc.add_plane_xz(-0.5, 10.0)
    sc.add_point_light((0, 3, 2), (1, 1, 1), 5.0)
    sc.set_camera((0, 0.5, -1), (0, 0, 3))
    sc.perf.enable_denoiser = False
    sc.perf.enable_bloom = False
    sc.perf.samples_per_pixel = 1
    sc.perf.max_bounce_depth = 2
    return sc


class TestVisualizationController:
    def test_frustum_toggle_adds_and_removes_mesh(self):
        sc = tiny_scene()
        viz = VisualizationController(sc)
        n0 = len(sc.meshes)
        viz.toggle_frustum()
        assert len(sc.meshes) == n0 + 1
        viz.toggle_frustum()
        assert len(sc.meshes) == n0

    def test_primary_rays_and_length_hotkeys(self):
        sc = tiny_scene()
        viz = VisualizationController(sc)
        n0 = len(sc.meshes)
        viz.handle_keys({"p"})
        assert len(sc.meshes) == n0 + 1
        # held key does not re-toggle
        viz.handle_keys({"p"})
        assert len(sc.meshes) == n0 + 1
        viz.handle_keys(set())
        viz.handle_keys({"p"})
        assert len(sc.meshes) == n0

        L = viz.ray_length
        viz.handle_keys({"+"})
        assert viz.ray_length > L
        viz.handle_keys(set())
        viz.handle_keys({"-"})
        assert viz.ray_length < L * 1.25

    def test_debug_rays_render(self):
        sc = tiny_scene()
        viz = VisualizationController(sc)
        viz.add_debug_ray((0, 0.5, -1), (0, 0, 1))
        viz.toggle_rays()
        img = sc.render_frame()
        assert img.shape == (36, 64, 3)
        # emissive debug arrow contributes bright pixels
        assert img.max() > 32

    def test_removed_mesh_restores_render(self):
        sc = tiny_scene()
        viz = VisualizationController(sc)
        base = sc.render_frame()
        viz.toggle_frustum()
        sc.render_frame()
        viz.toggle_frustum()
        again = sc.render_frame()
        assert np.array_equal(base.shape, again.shape)


class TestHttpViewer:
    def test_serves_page_and_frames(self):
        v = HttpViewer(64, 36, port=18734)
        try:
            v.present(np.zeros((36, 64, 3), np.uint8))
            page = urllib.request.urlopen(
                "http://127.0.0.1:18734/", timeout=5).read()
            assert b"ptrt_tpu viewer" in page
            jpg = urllib.request.urlopen(
                "http://127.0.0.1:18734/frame.jpg", timeout=5).read()
            assert jpg[:2] == b"\xff\xd8"  # JPEG magic
            # input POST round-trips into poll()
            req = urllib.request.Request(
                "http://127.0.0.1:18734/input",
                data=json.dumps({"keys": ["w", "f"], "dx": 3.0,
                                 "dy": -1.0}).encode(),
                method="POST")
            urllib.request.urlopen(req, timeout=5)
            inp = v.poll()
            assert inp.keys == {"w", "f"}
            assert inp.mouse_dx == 3.0
        finally:
            v.close()


class TestRunInteractive:
    def test_loop_with_scripted_viewer(self):
        sc = tiny_scene()

        class Scripted:
            def __init__(self):
                self.frames = []
                self.n = 0

            def poll(self):
                self.n += 1
                if self.n > 3:
                    return None
                inp = InputState()
                if self.n == 2:
                    inp.keys = {"w"}
                return inp

            def present(self, img):
                self.frames.append(np.asarray(img))

            def close(self):
                pass

        v = Scripted()
        n = run_interactive(sc, viewer=v)
        assert n == 3
        assert len(v.frames) == 3
        assert v.frames[0].shape == (36, 64, 3)
