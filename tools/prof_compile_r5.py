#!/usr/bin/env python
"""Round-5 compile-time attribution (VERDICT r4 #3).

Where does the 413 s cold / 156 s warm bench compile go?  This tool times
the three stages of program construction separately, across a config
ladder, so the compile-time work targets the real multiplier:

  trace_s   — Python tracing (jax.jit(...).trace): pure host Python over
              the whole program graph; paid EVEN ON CACHE HITS.
  lower_s   — StableHLO lowering of the traced jaxpr; also paid on hits.
  compile_s — XLA compilation (remote helper through the axon tunnel on
              TPU; local on CPU).  The persistent cache eliminates this
              on warm runs ONLY.

Usage:  python tools/prof_compile_r5.py [d1 d2 d4 spp4 ...]
Env:    PTRT_PROF_W/H/TRIS to scale the scene (default 640x360, 100k).
"""

import os
import sys
import time

import jax

# fresh cache dir per run => compile_s is true cold compile
_CACHE = os.environ.get("PTRT_PROF_CACHE", "")
if _CACHE:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402


def main():
    w = int(os.environ.get("PTRT_PROF_W", 640))
    h = int(os.environ.get("PTRT_PROF_H", 360))
    tris = int(os.environ.get("PTRT_PROF_TRIS", 100_000))

    from ptrt_tpu.app.bench_scene import build_bench_scene
    from ptrt_tpu.scene.pt_scene import _trace_only

    sc = build_bench_scene(w, h, target_tris=tris)
    sc.perf.enable_denoiser = False
    sc.perf.resolution_scale = 1.0
    sc._ensure_device_state()
    rh, rw = sc.render_size
    nl = len(sc.lights)
    has_env = sc._sky().has_env_sampling

    configs = sys.argv[1:] or ["d1", "d2", "d4", "d4spp4"]
    if os.environ.get("PTRT_PROF_PROFILE"):
        import cProfile
        import pstats
        _prof = cProfile.Profile()
    else:
        _prof = None
    print(f"scene {rw}x{rh}, {sum(m.num_triangles for m in sc.meshes)} tris, "
          f"{nl} lights, env={has_env}")
    print(f"{'config':>10} {'trace_s':>8} {'lower_s':>8} {'compile_s':>10} "
          f"{'hlo_MB':>7} {'run_ms':>9}")
    for cfg in configs:
        spp = 4 if "spp4" in cfg else 1
        d = int(cfg.replace("spp4", "").lstrip("d"))
        jfn = _trace_only(rw, rh, spp, d, nl, False, has_env, True)
        args = (sc._geom, sc._mat_table, sc._light_table, sc._sky(),
                sc.camera, sc._rng_state, jnp.int32(0), sc._blue_noise)
        t0 = time.time()
        traced = jfn.trace(*args)
        t_trace = time.time() - t0
        t0 = time.time()
        if _prof is not None:
            _prof.enable()
        lowered = traced.lower()
        if _prof is not None:
            _prof.disable()
        t_lower = time.time() - t0
        try:
            hlo_mb = len(lowered.as_text()) / 1e6
        except Exception:
            hlo_mb = -1.0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        run_ms = -1.0
        if os.environ.get("PTRT_PROF_RUN", "1") == "1":
            import numpy as np
            out = compiled(*args)
            jax.block_until_ready(out)
            t0 = time.time()
            for i in range(2):
                out = compiled(*args)
            jax.block_until_ready(out)
            np.asarray(jnp.sum(out[1].color.x))  # force host fetch (axon)
            run_ms = (time.time() - t0) / 2 * 1e3
        print(f"{cfg:>10} {t_trace:8.1f} {t_lower:8.1f} {t_compile:10.1f} "
              f"{hlo_mb:7.1f} {run_ms:9.1f}")
        if _prof is not None:
            pstats.Stats(_prof).sort_stats("cumulative").print_stats(25)
            _prof = None
        del compiled


if __name__ == "__main__":
    main()
