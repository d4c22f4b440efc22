#!/usr/bin/env python
"""In-frame cost attribution by surgical substitution: time the REAL
_trace_only d4 spp1 frame, then re-time it with (a) scattered any-hit
walks replaced by constant no-occlusion, (b) scattered closest walks
replaced by a fake constant hit, (c) both.  The deltas attribute the
per-bounce cost to walk vs shading arithmetic IN SITU (isolated probes
have not been predictive: the walk retune doubled isolated bounce walks
but moved the frame <4%)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PTRT_JAX_CACHE", "/tmp/ptrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from ptrt_tpu.app.bench_scene import build_bench_scene
from ptrt_tpu.core.vec import Vec3
from ptrt_tpu.render import traverse as tv
from tools.prof_r3 import timeit

W, H = 1920, 1080
sc = build_bench_scene(W, H, target_tris=int(os.environ.get("TRIS", 1_000_000)))
sc._ensure_device_state()

from ptrt_tpu.scene.pt_scene import _trace_only

real_closest = tv.intersect_closest
real_any = tv.intersect_any


def fake_closest(geom, o, d, t_max=tv.T_MAX, coherent=False,
                 scattered=False):
    if not scattered:
        return real_closest(geom, o, d, t_max, coherent=coherent,
                            scattered=scattered)
    live = jnp.asarray(t_max) > 0.0
    shape = jnp.shape(o.x)
    up = Vec3(jnp.zeros(shape), jnp.ones(shape), jnp.zeros(shape))
    t = jnp.where(live, 1.0, 1e30)
    return tv.Hit(hit=live, t=t, point=o + d * 1.0, normal=up,
                  front_face=jnp.ones(shape, bool),
                  mesh_index=jnp.where(live, 0, -1),
                  u=jnp.zeros(shape), v=jnp.zeros(shape))


def fake_any(geom, o, d, t_f, coherent=False, scattered=False):
    if not scattered:
        return real_any(geom, o, d, t_f, coherent=coherent,
                        scattered=scattered)
    return jnp.zeros(jnp.shape(o.x), bool)


def run(label):
    rh, rw = sc.render_size
    fn = _trace_only(rw, rh, 1, 4, len(sc.lights), sc._use_brute(),
                     sc.env_map is not None)
    args = (sc._geom, sc._mat_table, sc._light_table, sc._sky(),
            sc.camera, sc._rng_state, jnp.int32(1), sc._blue_noise)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.time() - t0
    ms = timeit(lambda: fn(*args), reps=3) * 1e3
    print(f"  {label:34s} {ms:8.1f} ms  (compile {comp:5.1f}s)", flush=True)
    return ms


import ptrt_tpu.render.integrator as integ

print(f"-- in-frame ablation, {W}x{H} d4 spp1 --", flush=True)
base = run("baseline (real walks)")

integ.traverse.intersect_any = fake_any
no_any = run("scattered any -> const unoccluded")

integ.traverse.intersect_any = real_any
integ.traverse.intersect_closest = fake_closest
no_closest = run("scattered closest -> const hit")

integ.traverse.intersect_any = fake_any
both = run("both walks removed")

print(f"  => scattered any walks:   {base - no_any:8.1f} ms")
print(f"  => scattered closest:     {base - no_closest:8.1f} ms")
print(f"  => residual (camera phase + shading arithmetic): {both:8.1f} ms")
