#!/usr/bin/env python
"""Round-4 sweep: scattered-walk compaction ladder geometry, re-measured
with FUSED state compaction (traverse._fused_take — one row gather per
stage instead of 11+ per-array takes).  Round 3 rejected fine ladders
because the per-array machinery dominated; with the machinery ~12x
cheaper the optimum likely moves toward earlier/finer compaction.

Wavefronts mirror tools/sweep_leaf.py: 1080p bounce-1 lambertian rays
(closest) and bounce-1 NEE shadow rays (any) on the 1M-tri bench scene.
"""
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
print(f"bounce-1 wavefront: R={R}, live={float(jnp.mean(hitp.hit)):.2f}",
      flush=True)

hit1 = tv.intersect_closest(g, oo, dd, t0, scattered=True)
o2 = Vec3(hit1.point.x + hit1.normal.x * 1e-3,
          hit1.point.y + hit1.normal.y * 1e-3,
          hit1.point.z + hit1.normal.z * 1e-3)
lp = Vec3(jnp.float32(0.0), jnp.float32(6.5), jnp.float32(6.0))
to_l = Vec3(lp.x - o2.x, lp.y - o2.y, lp.z - o2.z)
dist = jnp.sqrt(jnp.maximum(to_l.dot(to_l), 1e-12))
ds = Vec3(to_l.x / dist, to_l.y / dist, to_l.z / dist)
tf = jnp.where(hit1.hit, dist * 0.999, -1.0)

which = os.environ.get("SWEEP", "ca")

if "c" in which:
    print("== closest on bounce-1 rays (scattered=True) ==", flush=True)
    ref = None
    # (shrink, stages); 0 = auto (camera profile), the shipped default
    for sh, stg in ((0, 2), (2, 4), (3, 4), (4, 3), (4, 4), (6, 3),
                    (8, 2), (12, 2)):
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
        print(f"  shrink={sh:2d} stages={stg}: {ms:7.1f} ms  "
              f"mismatch {mis:.1e}", flush=True)
    tv.SCATTER_SHRINK, tv.SCATTER_STAGES = 0, 2

if "a" in which:
    print("== any on bounce-1 NEE shadow rays (scattered=True) ==",
          flush=True)
    ref = None
    for sh, stg in ((16, 2), (2, 5), (3, 4), (4, 3), (4, 4), (8, 2),
                    (8, 3), (32, 2)):
        tv.ANY_SCATTER_SHRINK, tv.ANY_SCATTER_STAGES = sh, stg
        f = jax.jit(lambda O, D, T: tv.intersect_any(
            g, O, D, T, scattered=True))
        ms = timeit(f, o2, ds, tf, reps=5) * 1e3
        got = np.asarray(f(o2, ds, tf))
        if ref is None:
            ref, mis = got, 0.0
        else:
            mis = float((ref != got).mean())
        print(f"  shrink={sh:2d} stages={stg}: {ms:7.1f} ms  "
              f"mismatch {mis:.1e}", flush=True)
    tv.ANY_SCATTER_SHRINK, tv.ANY_SCATTER_STAGES = 16, 2
