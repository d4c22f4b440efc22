#!/usr/bin/env python
"""Preset FPS + compile-time table on the canonical bench scene.

Covers the reference's perf narrative (`Test game screenshots/readme.txt`:
fast 178.9 / performance 80.4 / quality 50.2 / ultra 19.9 FPS on ~1M tris,
RTX-30-class GPU) plus the "ultra ultra" settings listed there.

Usage:  python tools/bench_presets.py [--tris N] [--w W] [--h H]
                                      [--frames N] [--presets a,b,c]
Prints one JSON line per preset:
  {"preset": ..., "fps": ..., "frame_ms": ..., "compile_s": ...,
   "render_size": [h, w], "rays_per_frame_M": ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PTRT_JAX_CACHE", "/tmp/ptrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

PRESETS = ["fast", "performance", "balanced", "quality", "ultra",
           "ultra_ultra"]


def apply_preset(sc, name: str) -> None:
    if name == "ultra_ultra":
        # readme.txt "ultra ultra": raw 256 spp / depth 32 / no post
        p = sc.perf
        p.enable_denoiser = False
        p.enable_bloom = False
        p.enable_motion_vectors = False
        p.samples_per_pixel = 256
        p.max_bounce_depth = 32
        p.resolution_scale = 1.0
        p.russian_roulette_start_bounce = 16
    else:
        sc.set_performance_preset(name)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--h", type=int, default=360)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--presets", type=str, default=",".join(PRESETS))
    args = ap.parse_args()

    from ptrt_tpu.app.bench_scene import build_bench_scene

    for preset in args.presets.split(","):
        sc = build_bench_scene(args.w, args.h, target_tris=args.tris)
        apply_preset(sc, preset)
        n_tris = sum(m.num_triangles for m in sc.meshes)
        sc._ensure_device_state()

        t0 = time.time()
        img = sc.render_frame_device()
        jax.block_until_ready(img)
        compile_s = time.time() - t0

        frames = args.frames
        t0 = time.time()
        for _ in range(frames):
            img = sc.render_frame_device()
        jax.block_until_ready(img)
        dt = time.time() - t0

        rh, rw = sc.render_size
        print(json.dumps({
            "preset": preset,
            "fps": round(frames / dt, 3),
            "frame_ms": round(dt / frames * 1e3, 1),
            "compile_s": round(compile_s, 1),
            "render_size": [rh, rw],
            "tris": n_tris,
        }), flush=True)


if __name__ == "__main__":
    main()
