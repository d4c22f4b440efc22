#!/usr/bin/env python
"""Render the fidelity corpus: feature-matched counterparts of the
reference's showcase screenshots (`Test game screenshots/`).

The reference repo ships NO scene assets (no OBJ/HDR files), so its
screenshots cannot be reproduced pixel-for-pixel; instead each render here
exercises the same feature set as one reference screenshot (material model,
lighting rig, post pipeline) on procedural geometry, and docs/fidelity.md
records a written visual-parity assessment per pair.

Run on TPU (minutes) or CPU (tens of minutes):
    python tools/make_fidelity.py [--w 640] [--h 360] [--frames 48]
Outputs PNG files to docs/fidelity/.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PTRT_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PTRT_JAX_CACHE", "/tmp/ptrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(ROOT, "docs", "fidelity")


def _sky_like_reference(sc):
    """The showcase shots use a blue-grey gradient with a bright horizon."""
    sc.set_sky_gradient((0.18, 0.28, 0.45), (0.75, 0.72, 0.70))


def scene_glass_sculptures(w, h):
    """vs `showcase/glass horse.png` + `low transmission glass.png`:
    clear glass, low-transmission (dark) glossy, and frosted glass bodies
    on pedestals against the gradient sky."""
    from ptrt_tpu.scene.pt_scene import Scene
    from ptrt_tpu.scene.materials import Material, Materials

    sc = Scene(w, h)
    _sky_like_reference(sc)
    pedestal = Material.make((0.75, 0.78, 0.85), 0.4)

    # clear glass: stacked spheres as a "bust"
    for (x, mat) in [(-2.2, Materials.Glass()),
                     (0.0, Material.make((0.02, 0.02, 0.02), 0.15,
                                         transmission=0.25, ior=1.5)),
                     (2.2, Materials.FrostedGlass())]:
        base = sc.add_cube(pedestal)
        base.transform.set_position(x, -1.1, 5.0).set_scale(1.2, 0.4, 1.2)
        body = sc.add_sphere(48, mat)
        body.transform.set_position(x, -0.1, 5.0).set_scale(0.75)
        head = sc.add_sphere(48, mat)
        head.transform.set_position(x, 0.85, 5.0).set_scale(0.45)
    sc.add_plane_xz(-1.3, 60.0, Material.make((0.45, 0.52, 0.65), 0.55))
    sc.add_point_light((4, 6, 0), (1.0, 0.97, 0.9), 14.0, range=50.0,
                       radius=0.4)
    sc.set_camera((0, 0.6, -0.5), (0, 0.0, 5.0), fov=55)
    return sc


def scene_iridescent(w, h):
    """vs `showcase/irridescent moon lander.png`: dark thin-film iridescent
    body floating over the gradient sky."""
    from ptrt_tpu.scene.pt_scene import Scene
    from ptrt_tpu.scene.materials import Material, Materials

    sc = Scene(w, h)
    _sky_like_reference(sc)
    irid = Materials.OilSlick()
    body = sc.add_sphere(64, irid)
    body.transform.set_position(0.0, 0.6, 4.5).set_scale(1.5, 0.9, 1.5)
    cap = sc.add_sphere(48, irid)
    cap.transform.set_position(0.0, 1.35, 4.5).set_scale(0.8, 0.55, 0.8)
    ped = sc.add_cube(Material.make((0.7, 0.73, 0.8), 0.4))
    ped.transform.set_position(2.6, -1.0, 5.5).set_scale(1.0, 0.4, 1.0)
    chrome = sc.add_sphere(48, Materials.Chrome())
    chrome.transform.set_position(2.6, -0.1, 5.5).set_scale(0.6)
    sc.add_plane_xz(-1.3, 60.0, Material.make((0.45, 0.52, 0.65), 0.55))
    sc.add_point_light((-5, 5, -2), (1.0, 1.0, 1.0), 10.0, range=50.0,
                       radius=0.5)
    sc.set_camera((0, 0.8, -0.8), (0.3, 0.4, 4.5), fov=55)
    return sc


def scene_copper_bust(w, h):
    """vs `showcase/abe lincoln.png` (copper life mask under a spot):
    copper material + soft spot shadow on a dark set."""
    from ptrt_tpu.scene.pt_scene import Scene
    from ptrt_tpu.scene.materials import Material, Materials

    sc = Scene(w, h)
    sc.set_sky_gradient((0.04, 0.04, 0.06), (0.0, 0.0, 0.0))
    bust = sc.add_sphere(64, Materials.Copper())
    bust.transform.set_position(-1.2, 0.2, 4.0).set_scale(0.8, 1.1, 0.8)
    marble = sc.add_sphere(64, Materials.MarbleCarrara())
    marble.transform.set_position(1.4, 0.0, 4.2).set_scale(0.9)
    sc.add_plane_xz(-1.2, 50.0, Material.make((0.8, 0.8, 0.8), 0.7))
    sc.add_spot_light((-3, 5, 2), (0.5, -1, 0.5), (1, 1, 1), 40.0,
                      inner_cone=0.1, outer_cone=0.35, radius=0.25)
    sc.add_point_light((3, 4, 2), (0.5, 0.5, 1.0), 6.0, range=30.0,
                       radius=0.2)
    sc.set_camera((0, 0.5, -0.5), (0, 0.2, 4.0), fov=55)
    return sc


def scene_firefly(w, h):
    """vs `showcase/no firefly artifacts.png`: high-frequency glossy
    geometry, a strong off-screen light, and specular caustic paths — the
    firefly clamp + SVGF must keep the frame speckle-free."""
    from ptrt_tpu.scene.pt_scene import Scene
    from ptrt_tpu.scene.materials import Material, Materials

    sc = Scene(w, h)
    sc.set_sky_gradient((0.10, 0.12, 0.2), (0.3, 0.28, 0.26))
    rng = np.random.default_rng(7)
    dark_gloss = Material.make((0.03, 0.03, 0.035), 0.25)
    for i in range(40):
        m = sc.add_sphere(16, dark_gloss if i % 3 else Materials.Chrome())
        x, y, z = rng.uniform(-3, 3), rng.uniform(-1, 2), rng.uniform(3.5, 7)
        m.transform.set_position(x, y, z).set_scale(
            *(rng.uniform(0.2, 0.7, size=3)))
    sc.add_point_light((0, 8, -2), (1.0, 0.9, 0.8), 60.0, range=80.0,
                       radius=0.15)
    sc.set_camera((0, 0.5, -1.0), (0, 0.4, 5.0), fov=65)
    return sc


def game_cube_slider(w, h):
    import jax.numpy as jnp
    from ptrt_tpu.games import cube_slider

    u, sc = cube_slider.build_scene(w, h)
    state = cube_slider.init_state()
    for _ in range(12):
        state = cube_slider.step(state, jnp.float32(0.4), jnp.float32(0.05))
    cube_slider.sync_scene(u, sc, state)
    return sc


def game_fluid(w, h):
    import jax.numpy as jnp
    from ptrt_tpu.games import fluid
    from ptrt_tpu.scene.unified import UnifiedSceneBuilder

    u, sc, state = fluid.build_scene(w, h, n=32)
    for _ in range(10):
        state = fluid.step(state, jnp.float32(1.0 / 30.0), jnp.float32(6.0),
                           jnp.float32(0.995))
    tris = np.asarray(fluid.heightfield_to_triangles(state.height))
    u.find_object("fluid").set_triangles(tris)
    UnifiedSceneBuilder.update_pt_scene(sc, u)
    return sc


def game_tycoon(w, h):
    from ptrt_tpu.games.tycoon import TycoonGame

    g = TycoonGame(w, h)
    g.place_building(2, 2, 0)
    g.place_building(3, 2, 1)
    g.place_building(2, 3, 2)
    g.update(0.5)
    return g.scene


SCENES = {
    "glass_sculptures": scene_glass_sculptures,
    "iridescent": scene_iridescent,
    "copper_bust": scene_copper_bust,
    "firefly": scene_firefly,
    "game_cube_slider": game_cube_slider,
    "game_fluid": game_fluid,
    "game_tycoon": game_tycoon,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--h", type=int, default=360)
    ap.add_argument("--frames", type=int, default=48,
                    help="accumulation frames per image")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    from ptrt_tpu.utils.imageio import save_png

    os.makedirs(OUT_DIR, exist_ok=True)
    names = args.only.split(",") if args.only else list(SCENES)
    for name in names:
        sc = SCENES[name](args.w, args.h)
        sc.set_performance_preset("balanced")
        sc.perf.enable_motion_vectors = False
        img = None
        for _ in range(args.frames):
            img = sc.render_frame()
        save_png(os.path.join(OUT_DIR, f"{name}.png"), img)
        print("fidelity", name, img.shape, float(img.mean()).__round__(1),
              flush=True)


if __name__ == "__main__":
    main()
