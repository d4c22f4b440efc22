"""Checkpoint/resume round-trip (utils/checkpoint.py).

A resumed session must continue EXACTLY where the saved one left off:
same RNG streams, same progressive-accumulation average, same SVGF
history — the next rendered frame must be bit-identical.
"""

import numpy as np

from ptrt_tpu.scene.materials import Material
from ptrt_tpu.scene.pt_scene import Scene
from ptrt_tpu.utils.checkpoint import load_render_state, save_render_state


def _scene(denoise: bool):
    sc = Scene(48, 32)
    sc.perf.enable_denoiser = denoise
    sc.perf.enable_bloom = False
    sc.perf.samples_per_pixel = 1
    sc.perf.max_bounce_depth = 2
    sc.perf.resolution_scale = 1.0
    sc.perf.progressive_accumulation = not denoise
    sc.add_plane_xz(-1.0, 8.0, Material.make((0.8, 0.8, 0.8), 0.6))
    sc.add_sphere(8, Material.make((0.7, 0.2, 0.2), 0.4)).transform \
        .set_position(0, -0.4, 4)
    sc.add_point_light((2, 3, 1), (1, 1, 1), 3.0)
    sc.set_camera((0, 0.5, 0), (0, 0, 4), fov=60)
    return sc


class TestCheckpoint:
    def test_progressive_resume_bit_identical(self, tmp_path):
        path = str(tmp_path / "state.npz")
        a = _scene(denoise=False)
        for _ in range(2):
            a.render_frame()
        save_render_state(a, path)
        nxt_a = a.render_frame()

        b = _scene(denoise=False)
        b._ensure_device_state()
        load_render_state(b, path)
        nxt_b = b.render_frame()
        np.testing.assert_array_equal(np.asarray(nxt_a), np.asarray(nxt_b))

    def test_denoiser_resume_bit_identical(self, tmp_path):
        path = str(tmp_path / "state.npz")
        a = _scene(denoise=True)
        for _ in range(2):
            a.render_frame()
        save_render_state(a, path)
        nxt_a = a.render_frame()

        b = _scene(denoise=True)
        b._ensure_device_state()
        load_render_state(b, path)
        nxt_b = b.render_frame()
        np.testing.assert_array_equal(np.asarray(nxt_a), np.asarray(nxt_b))
