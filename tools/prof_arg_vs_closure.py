#!/usr/bin/env python
"""Isolated bounce-1 closest/any walk timed two ways: geometry tables
CLOSED OVER (jit constants — what every round-3 sweep measured) vs passed
as jit ARGUMENTS (what the real frame program does).  The denormal-flush
bug (commit 5d62f7c) was exactly an argument-only behavior; this probe
checks whether argument tables also carry a performance cliff."""
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
from ptrt_tpu.core.vec import Vec3, normalize
from ptrt_tpu.render import traverse as tv
from tools.prof_r3 import _camera_rays, timeit

TRIS = int(os.environ.get("TRIS", 1_000_000))
sc = build_bench_scene(1920, 1080, target_tris=TRIS)
sc._ensure_device_state()
g = sc._geom.static if hasattr(sc._geom, "static") else sc._geom
R = int(os.environ.get("R", 1080 * 1920))
o, d = _camera_rays(sc, R)
hitp = tv.intersect_closest(g, o, d)
rng = np.random.default_rng(2)
rnd = normalize(Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32))
                       for _ in range(3)]))
n = hitp.normal
dd = normalize(Vec3(n.x + 0.9 * rnd.x, n.y + 0.9 * rnd.y, n.z + 0.9 * rnd.z))
oo = Vec3(hitp.point.x + n.x * 1e-3, hitp.point.y + n.y * 1e-3,
          hitp.point.z + n.z * 1e-3)
live = hitp.hit
t0 = jnp.where(live, 1e30, -1.0)
print(f"R={R}, live={float(jnp.mean(live)):.2f}, tris={TRIS}", flush=True)

for scat in (False, True):
    f_clo = jax.jit(lambda O, D, T, s=scat: tv.intersect_closest(
        g, O, D, T, scattered=s).t)
    f_arg = jax.jit(lambda G, O, D, T, s=scat: tv.intersect_closest(
        G, O, D, T, scattered=s).t)
    ms_c = timeit(f_clo, oo, dd, t0, reps=5) * 1e3
    ms_a = timeit(f_arg, g, oo, dd, t0, reps=5) * 1e3
    a = np.asarray(f_clo(oo, dd, t0))
    b = np.asarray(f_arg(g, oo, dd, t0))
    am = np.where(a > 1e29, 0, a)
    bm = np.where(b > 1e29, 0, b)
    mis = float((np.abs(am - bm) > 1e-3 * np.maximum(am, 1)).mean())
    print(f"closest scattered={int(scat)}: closure {ms_c:8.1f} ms | "
          f"arg {ms_a:8.1f} ms | mismatch {mis:.1e}", flush=True)
