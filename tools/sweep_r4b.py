#!/usr/bin/env python
"""Round-4 follow-up: refine the scattered-closest ladder optimum and
re-sweep the CAMERA-profile compaction geometry with fused machinery
(the round-2/3 optima were tuned when each stage cost 11+ gathers)."""
import os
import sys

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

sc = build_bench_scene(1920, 1080, target_tris=1_000_000)
sc._ensure_device_state()
g = sc._geom.static if hasattr(sc._geom, "static") else sc._geom
R = 1080 * 1920
o, d = _camera_rays(sc, R)
hitp = tv.intersect_closest(g, o, d)
rng = np.random.default_rng(2)
rnd = normalize(Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32))
                       for _ in range(3)]))
n = hitp.normal
dd = normalize(Vec3(n.x + 0.9 * rnd.x, n.y + 0.9 * rnd.y, n.z + 0.9 * rnd.z))
oo = Vec3(hitp.point.x + n.x * 1e-3, hitp.point.y + n.y * 1e-3,
          hitp.point.z + n.z * 1e-3)
t0 = jnp.where(hitp.hit, 1e30, -1.0)
which = os.environ.get("SWEEP", "cbk")

if "c" in which:
    print("== scattered closest refinement ==", flush=True)
    ref = None
    for sh, stg in ((4, 4), (5, 4), (6, 4), (4, 5), (5, 3)):
        tv.SCATTER_SHRINK, tv.SCATTER_STAGES = sh, stg
        f = jax.jit(lambda O, D, T: tv.intersect_closest(
            g, O, D, T, scattered=True).t)
        ms = timeit(f, oo, dd, t0, reps=5) * 1e3
        got = np.asarray(f(oo, dd, t0))
        if ref is None:
            ref, mis = got, 0.0
        else:
            a = np.where(ref > 1e29, 0, ref)
            b = np.where(got > 1e29, 0, got)
            mis = float((np.abs(a - b) > 1e-3 * np.maximum(a, 1)).mean())
        print(f"  shrink={sh:2d} stages={stg}: {ms:7.1f} ms  mis {mis:.1e}",
              flush=True)
    tv.SCATTER_SHRINK, tv.SCATTER_STAGES = 0, 2

if "b" in which:
    print("== camera-profile closest (1080p camera rays, per-ray walk) ==",
          flush=True)
    ref = None
    for big, stg in ((12, 2), (8, 3), (6, 3), (4, 4), (6, 4)):
        tv.BIG_COMPACT_SHRINK, tv.COMPACT_STAGES = big, stg
        f = jax.jit(lambda O, D: tv.intersect_closest(g, O, D).t)
        ms = timeit(f, o, d, reps=5) * 1e3
        got = np.asarray(f(o, d))
        if ref is None:
            ref, mis = got, 0.0
        else:
            a = np.where(ref > 1e29, 0, ref)
            b = np.where(got > 1e29, 0, got)
            mis = float((np.abs(a - b) > 1e-3 * np.maximum(a, 1)).mean())
        print(f"  big_shrink={big:2d} stages={stg}: {ms:7.1f} ms  "
              f"mis {mis:.1e}", flush=True)
    tv.BIG_COMPACT_SHRINK, tv.COMPACT_STAGES = 12, 2

if "k" in which:
    print("== camera-profile any (t=30 camera rays) ==", flush=True)
    tfix = jnp.full((R,), 30.0)
    ref = None
    for sh, stg in ((16, 1), (16, 2), (8, 3), (8, 2)):
        tv.ANY_COMPACT_SHRINK, tv.ANY_COMPACT_STAGES = sh, stg
        f = jax.jit(lambda O, D: tv.intersect_any(g, O, D, tfix))
        ms = timeit(f, o, d, reps=5) * 1e3
        got = np.asarray(f(o, d))
        if ref is None:
            ref, mis = got, 0.0
        else:
            mis = float((ref != got).mean())
        print(f"  any_shrink={sh:2d} stages={stg}: {ms:7.1f} ms  "
              f"mis {mis:.1e}", flush=True)
    tv.ANY_COMPACT_SHRINK, tv.ANY_COMPACT_STAGES = 16, 1
