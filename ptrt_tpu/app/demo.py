"""Headless demo runner — the game ``main()`` analog.

``python -m ptrt_tpu.app.demo --backend pt -s 8 -w 640 -h 360 -o out``
renders a demo scene for N frames and writes PPM/PNG.  The interactive GLFW
viewer of the reference (``glfw_view_interop.hpp``) maps to a frame loop +
presentation (utils/imageio); a windowed host can wrap the same loop.
"""

from __future__ import annotations

import sys
import time


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    backend = "pt"
    frames = 8
    preset = None
    interactive = None  # None | "auto" | "pygame" | "http"
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--backend" and i + 1 < len(argv):
            i += 1
            backend = argv[i]
        elif argv[i] == "--frames" and i + 1 < len(argv):
            i += 1
            frames = int(argv[i])
        elif argv[i] == "--preset" and i + 1 < len(argv):
            i += 1
            preset = argv[i]
        elif argv[i] == "--interactive":
            interactive = "auto"
        elif argv[i] == "--viewer" and i + 1 < len(argv):
            i += 1
            interactive = argv[i]  # pygame | http
        elif argv[i] == "--cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        else:
            rest.append(argv[i])
        i += 1

    from ptrt_tpu.app.app_utils import parse_arguments, print_render_info, USAGE
    from ptrt_tpu.utils.imageio import save_png, save_ppm

    cfg = parse_arguments(rest)
    if cfg.show_help:
        print(USAGE.format(prog="python -m ptrt_tpu.app.demo"))
        return 0

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ptrt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if backend == "rt":
        from ptrt_tpu.app.rt_demo_scenes import build_scene_by_id

        scene, name = build_scene_by_id(cfg.scene_id, cfg.width, cfg.height)
    else:
        from ptrt_tpu.app.demo_scenes import build_scene_by_id

        scene, name = build_scene_by_id(cfg.scene_id, cfg.width, cfg.height)
        if preset:
            scene.set_performance_preset(preset)

    print_render_info(name, cfg.width, cfg.height)

    if interactive is not None:
        if backend == "rt":
            print("interactive viewer currently drives the PT backend")
            return 1
        from ptrt_tpu.app.viewer import run_interactive

        n = run_interactive(scene, prefer=interactive,
                            max_frames=frames if frames > 8 else None)
        print(f"presented {n} frames")
        return 0

    t0 = time.time()
    img = scene.render_frame()
    print(f"first frame (incl. compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    for _ in range(max(0, frames - 1)):
        img = scene.render_frame()
    dt = time.time() - t0
    if frames > 1:
        print(f"{frames - 1} frames: {dt:.2f}s ({(frames - 1) / max(dt, 1e-9):.1f} FPS)")

    save_ppm(cfg.output_name + ".ppm", img)
    save_png(cfg.output_name + ".png", img)
    print(f"wrote {cfg.output_name}.ppm / .png")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
