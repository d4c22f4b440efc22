#!/usr/bin/env python
"""In-frame probe: per-light packet routing of bounce-0 NEE (multi-light
scenes) vs the scattered per-ray fallback.  Times the trace-only frame on
the 4-light bench scene with integrator.NEE_PK_LIGHTS = 0 / n.
Env: W, H, SPP, DEPTH, TRIS."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PTRT_JAX_CACHE", "/tmp/ptrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from ptrt_tpu.app.bench_scene import build_bench_scene
from ptrt_tpu.render import integrator as ig
from ptrt_tpu.render import pipeline as pl
from tools.prof_r3 import timeit

W = int(os.environ.get("W", 640))
H = int(os.environ.get("H", 360))
DEPTH = int(os.environ.get("DEPTH", 4))
SPP = int(os.environ.get("SPP", 1))
sc = build_bench_scene(W, H, target_tris=int(os.environ.get("TRIS", 1_000_000)))
sc._ensure_device_state()


def run(label):
    rh, rw = sc.render_size
    nl = len(sc.lights)
    fn = jax.jit(lambda geom, mats, lights, sky, camera, rng, fi, bn:
                 pl.trace_frame(geom, mats, lights, nl, sky, camera, rng,
                                fi, rw, rh, SPP, DEPTH, split=False,
                                use_brute=False, blue_noise_tbl=bn))
    args = (sc._geom, sc._mat_table, sc._light_table, sc._sky(),
            sc.camera, sc._rng_state, jnp.int32(1), sc._blue_noise)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.time() - t0
    ms = timeit(lambda: fn(*args), reps=3) * 1e3
    mean = float(np.asarray(out[1].radiance.x).mean())
    print(f"  {label:44s} {ms:8.1f} ms  (compile {comp:5.1f}s, "
          f"mean.x {mean:.6f})", flush=True)
    return ms, mean


print(f"-- per-light packet NEE probe, {W}x{H} d{DEPTH} spp{SPP}, "
      f"{len(sc.lights)} lights --", flush=True)
ig.NEE_PK_LIGHTS = 0
off_ms, off_mean = run("NEE_PK_LIGHTS=0 (scattered fallback)")
ig.NEE_PK_LIGHTS = 8
on_ms, on_mean = run("NEE_PK_LIGHTS=8 (per-light packets)")
print(f"  => delta {off_ms - on_ms:+.1f} ms ({off_ms / on_ms:.2f}x); "
      f"mean match: {abs(off_mean - on_mean) < 1e-6}")
