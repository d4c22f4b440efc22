#!/usr/bin/env python
"""In-situ sweep of the leaf-action schedule (LEAF_EVERY/ANY_LEAF_EVERY)
x compaction profile (camera vs scattered ladder) on REALISTIC bounce
wavefronts: 1080p primary hits -> lambertian bounce rays (closest), and
bounce-1 NEE shadow rays (any).  Decides the shipped defaults."""
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

sc = build_bench_scene(1920, 1080, target_tris=1_000_000)
sc._ensure_device_state()
g = sc._geom.static if hasattr(sc._geom, "static") else sc._geom
h, w = 1080, 1920
R = h * w
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
print(f"bounce-1 wavefront: R={R}, live={float(jnp.mean(live)):.2f}",
      flush=True)

# NEE-style shadow rays from bounce-1 hit points
hit1 = tv.intersect_closest(g, oo, dd, t0, scattered=True)
o2 = Vec3(hit1.point.x + hit1.normal.x * 1e-3,
          hit1.point.y + hit1.normal.y * 1e-3,
          hit1.point.z + hit1.normal.z * 1e-3)
lp = Vec3(jnp.float32(0.0), jnp.float32(6.5), jnp.float32(6.0))
to_l = Vec3(lp.x - o2.x, lp.y - o2.y, lp.z - o2.z)
dist = jnp.sqrt(jnp.maximum(to_l.dot(to_l), 1e-12))
ds = Vec3(to_l.x / dist, to_l.y / dist, to_l.z / dist)
tf = jnp.where(hit1.hit, dist * 0.999, -1.0)

ref_t = None
ref_any = None
print("== closest on bounce-1 rays ==", flush=True)
for scat in (False, True):
    for le in (1, 2, 3, 4):
        tv.LEAF_EVERY = le
        f = jax.jit(lambda O, D, T, s=scat: tv.intersect_closest(
            g, O, D, T, scattered=s).t)
        ms = timeit(f, oo, dd, t0, reps=5) * 1e3
        got = np.asarray(f(oo, dd, t0))
        if ref_t is None:
            ref_t = got
            mis = 0.0
        else:
            a = np.where(ref_t > 1e29, 0, ref_t)
            b = np.where(got > 1e29, 0, got)
            mis = float((np.abs(a - b) > 1e-3 * np.maximum(a, 1)).mean())
        print(f"  scattered={int(scat)} LEAF_EVERY={le}: {ms:7.1f} ms  "
              f"mismatch {mis:.1e}", flush=True)
tv.LEAF_EVERY = 1

print("== any on bounce-1 NEE shadow rays ==", flush=True)
for scat in (False, True):
    for le in (1, 2, 3):
        tv.ANY_LEAF_EVERY = le
        f = jax.jit(lambda O, D, T, s=scat: tv.intersect_any(
            g, O, D, T, scattered=s))
        ms = timeit(f, o2, ds, tf, reps=5) * 1e3
        got = np.asarray(f(o2, ds, tf))
        if ref_any is None:
            ref_any = got
            mis = 0.0
        else:
            mis = float((got != ref_any).mean())
        print(f"  scattered={int(scat)} ANY_LEAF_EVERY={le}: {ms:7.1f} ms  "
              f"mismatch {mis:.1e}", flush=True)
tv.ANY_LEAF_EVERY = 1
