#!/usr/bin/env python
"""Measured end-to-end GAME-loop FPS (fused step+render, zero host scene
edits per frame) — the product metric the reference screenshots report
(``Test game screenshots/readme.txt``).

Runs each fused game at the given size across presets and prints one
line per (game, preset): frames/s over N timed frames after one warmup/
compile frame.  Results land in TODO.md's round-3 table.

Env: PTRT_GAME_W/H (default 640x360), PTRT_GAME_FRAMES (default 60),
PTRT_GAME_PRESETS (comma list), PTRT_GAMES (comma list).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PTRT_JAX_CACHE", "/tmp/ptrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    w = int(os.environ.get("PTRT_GAME_W", 640))
    h = int(os.environ.get("PTRT_GAME_H", 360))
    n = int(os.environ.get("PTRT_GAME_FRAMES", 60))
    presets = os.environ.get("PTRT_GAME_PRESETS",
                             "fast,performance,balanced").split(",")
    games = os.environ.get("PTRT_GAMES",
                           "cube_slider,fluid,tycoon").split(",")

    results = []
    for game in games:
        if game == "cube_slider":
            from ptrt_tpu.games.cube_slider import run_fused
            runner = lambda p: run_fused(n_frames=n, width=w, height=h,
                                         preset=p)
        elif game == "fluid":
            from ptrt_tpu.games.fluid import run_fused
            runner = lambda p: run_fused(n_frames=n, width=w, height=h,
                                         preset=p)
        elif game == "tycoon":
            from ptrt_tpu.games.tycoon import run_fused
            runner = lambda p: run_fused(n_frames=n, width=w, height=h,
                                         preset=p)
        else:
            print(f"unknown game {game}", file=sys.stderr)
            continue
        for preset in presets:
            t0 = time.time()
            try:
                _, fps, _ = runner(preset)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"{game:12s} {preset:12s} FAILED: {e}")
                continue
            wall = time.time() - t0
            results.append({"game": game, "preset": preset, "w": w, "h": h,
                            "fps": round(fps, 2),
                            "wall_s": round(wall, 1)})
            print(f"{game:12s} {preset:12s} {w}x{h}: {fps:8.2f} FPS "
                  f"(total wall {wall:.1f}s incl compile)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
