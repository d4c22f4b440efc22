#!/usr/bin/env python
"""Confirm the round-3 defaults (LEAF_EVERY=3, ladder 16x2) on bounce-1
wavefronts and camera rays before shipping them."""
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
t0 = jnp.where(hitp.hit, 1e30, -1.0)
hit1 = tv.intersect_closest(g, oo, dd, t0, scattered=True)
o2 = Vec3(hit1.point.x + hit1.normal.x * 1e-3,
          hit1.point.y + hit1.normal.y * 1e-3,
          hit1.point.z + hit1.normal.z * 1e-3)
lp = Vec3(jnp.float32(0.0), jnp.float32(6.5), jnp.float32(6.0))
to_l = Vec3(lp.x - o2.x, lp.y - o2.y, lp.z - o2.z)
dist = jnp.sqrt(jnp.maximum(to_l.dot(to_l), 1e-12))
ds = Vec3(to_l.x / dist, to_l.y / dist, to_l.z / dist)
tf = jnp.where(hit1.hit, dist * 0.999, -1.0)

tv.LEAF_EVERY = 3
tv.ANY_LEAF_EVERY = 3
tv.SCATTER_SHRINK, tv.SCATTER_STAGES = 16, 2
tv.ANY_SCATTER_SHRINK, tv.ANY_SCATTER_STAGES = 16, 2

f = jax.jit(lambda O, D, T: tv.intersect_closest(g, O, D, T,
                                                 scattered=True).t)
ms = timeit(f, oo, dd, t0, reps=5) * 1e3
print(f"bounce-1 closest ladder16x2 LE3: {ms:7.1f} ms  "
      f"(camera LE3 was 164.0)", flush=True)
fa = jax.jit(lambda O, D, T: tv.intersect_any(g, O, D, T, scattered=True))
ms = timeit(fa, o2, ds, tf, reps=5) * 1e3
print(f"bounce-1 any     ladder16x2 LE3: {ms:7.1f} ms  "
      f"(camera LE3 was 90.6)", flush=True)

# camera-ray per-ray walks (non-packet path) with the new LEAF_EVERY
f = jax.jit(lambda O, D: tv.intersect_closest(g, O, D).t)
ms = timeit(f, o, d, reps=5) * 1e3
print(f"camera closest per-ray LE3:      {ms:7.1f} ms", flush=True)
fa = jax.jit(lambda O, D: tv.intersect_any(g, O, D, jnp.full((R,), 30.0)))
ms = timeit(fa, o, d, reps=5) * 1e3
print(f"camera any per-ray LE3:          {ms:7.1f} ms", flush=True)
