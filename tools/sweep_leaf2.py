#!/usr/bin/env python
"""Profile choice on BOUNCE-2 wavefronts (mostly dead, the ladder's
motivating case): camera vs ladder compaction with LEAF_EVERY pinned at
the bounce-1 winner (3), plus a shrink re-check."""
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
rng = np.random.default_rng(2)


def lambertian_step(o, d, t0, salt):
    hit = tv.intersect_closest(g, o, d, t0)
    rnd = normalize(Vec3(*[jnp.asarray(
        rng.normal(size=R).astype(np.float32)) for _ in range(3)]))
    n = hit.normal
    dd = normalize(Vec3(n.x + 0.9 * rnd.x, n.y + 0.9 * rnd.y,
                        n.z + 0.9 * rnd.z))
    oo = Vec3(hit.point.x + n.x * 1e-3, hit.point.y + n.y * 1e-3,
              hit.point.z + n.z * 1e-3)
    # RR-like survival from bounce 2: kill ~35% of continuing lanes
    u = jnp.asarray(rng.uniform(size=R).astype(np.float32))
    live = hit.hit & (t0 > 0) & (u < (0.65 if salt else 1.0))
    return oo, dd, jnp.where(live, 1e30, -1.0), live


o1, d1, t1, _ = lambertian_step(o, d, jnp.full((R,), 1e30), salt=0)
o2, d2, t2, live2 = lambertian_step(o1, d1, t1, salt=1)
print(f"bounce-2 wavefront: live={float(jnp.mean(live2)):.3f}", flush=True)

# shadow rays from bounce-2 hits
hit2 = tv.intersect_closest(g, o2, d2, t2, scattered=True)
o3 = Vec3(hit2.point.x + hit2.normal.x * 1e-3,
          hit2.point.y + hit2.normal.y * 1e-3,
          hit2.point.z + hit2.normal.z * 1e-3)
lp = Vec3(jnp.float32(0.0), jnp.float32(6.5), jnp.float32(6.0))
to_l = Vec3(lp.x - o3.x, lp.y - o3.y, lp.z - o3.z)
dist = jnp.sqrt(jnp.maximum(to_l.dot(to_l), 1e-12))
ds = Vec3(to_l.x / dist, to_l.y / dist, to_l.z / dist)
tf = jnp.where(hit2.hit, dist * 0.999, -1.0)
print(f"bounce-2 NEE live={float(jnp.mean(hit2.hit)):.3f}", flush=True)

tv.LEAF_EVERY = 3
tv.ANY_LEAF_EVERY = 3
print("== closest on bounce-2 rays (LEAF_EVERY=3) ==", flush=True)
for label, scat, shr, stg in (("camera/big12x2", False, None, None),
                              ("ladder 4x4", True, 4, 4),
                              ("ladder 8x3", True, 8, 3),
                              ("ladder 16x2", True, 16, 2)):
    if shr is not None:
        tv.SCATTER_SHRINK, tv.SCATTER_STAGES = shr, stg
    f = jax.jit(lambda O, D, T, s=scat: tv.intersect_closest(
        g, O, D, T, scattered=s).t)
    ms = timeit(f, o2, d2, t2, reps=5) * 1e3
    print(f"  {label:16s}: {ms:7.1f} ms", flush=True)

print("== any on bounce-2 NEE rays (ANY_LEAF_EVERY=3) ==", flush=True)
for label, scat, shr, stg in (("camera/16x1", False, None, None),
                              ("ladder 4x2", True, 4, 2),
                              ("ladder 16x2", True, 16, 2),
                              ("ladder 32x1", True, 32, 1)):
    if shr is not None:
        tv.ANY_SCATTER_SHRINK, tv.ANY_SCATTER_STAGES = shr, stg
    f = jax.jit(lambda O, D, T, s=scat: tv.intersect_any(
        g, O, D, T, scattered=s))
    ms = timeit(f, o3, ds, tf, reps=5) * 1e3
    print(f"  {label:16s}: {ms:7.1f} ms", flush=True)
