#!/usr/bin/env python
"""In-frame cost attribution by surgical substitution: time the REAL
trace-only d4 spp1 frame, then re-time it with (a) scattered any-hit
walks replaced by constant no-occlusion, (b) scattered closest walks
replaced by a fake constant hit, (c) both, (d) coherent (packet) bounce-0
walks also removed.  The deltas attribute the per-bounce cost to walk vs
shading arithmetic IN SITU (isolated probes have not been predictive).

NOTE: each variant builds a FRESH ``jax.jit`` around ``pl.trace_frame`` —
the first version of this tool went through ``pt_scene._trace_only``,
whose jit cache returned the baseline's compiled program for every
variant (monkeypatching traverse after the first trace has no effect on
an already-compiled jit), so every delta read as zero.
"""
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
from ptrt_tpu.render import pipeline as pl
from ptrt_tpu.render import traverse as tv
from tools.prof_r3 import timeit

W = int(os.environ.get("W", 640))
H = int(os.environ.get("H", 360))
DEPTH = int(os.environ.get("DEPTH", 4))
SPP = int(os.environ.get("SPP", 1))
sc = build_bench_scene(W, H, target_tris=int(os.environ.get("TRIS", 1_000_000)))
sc._ensure_device_state()

real_closest = tv.intersect_closest
real_any = tv.intersect_any


def fake_hit(o, d, t_max):
    live = jnp.asarray(t_max) > 0.0
    shape = jnp.shape(o.x)
    up = Vec3(jnp.zeros(shape), jnp.ones(shape), jnp.zeros(shape))
    t = jnp.where(live, 1.0, 1e30)
    return tv.Hit(hit=live, t=t, point=o + d * 1.0, normal=up,
                  front_face=jnp.ones(shape, bool),
                  mesh_index=jnp.where(live, 0, -1),
                  u=jnp.zeros(shape), v=jnp.zeros(shape))


def make_fakes(kill_scattered, kill_coherent):
    def fc(geom, o, d, t_max=tv.T_MAX, coherent=False, scattered=False):
        if (scattered and kill_scattered) or (coherent and kill_coherent):
            return fake_hit(o, d, t_max)
        return real_closest(geom, o, d, t_max, coherent=coherent,
                            scattered=scattered)

    def fa(geom, o, d, t_f, coherent=False, scattered=False,
           light_id=None, n_light_groups=0):
        if (scattered and kill_scattered) or (coherent and kill_coherent):
            return jnp.zeros(jnp.broadcast_shapes(jnp.shape(o.x),
                                                  jnp.shape(t_f)), bool)
        return real_any(geom, o, d, t_f, coherent=coherent,
                        scattered=scattered, light_id=light_id,
                        n_light_groups=n_light_groups)

    return fc, fa


def run(label, closest=real_closest, anyf=real_any):
    tv.intersect_closest = closest
    tv.intersect_any = anyf
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
    rays = float(out[1].rays_traced)
    print(f"  {label:40s} {ms:8.1f} ms  rays/frame {rays/1e6:6.2f}M  "
          f"(compile {comp:5.1f}s)", flush=True)
    tv.intersect_closest = real_closest
    tv.intersect_any = real_any
    return ms


print(f"-- in-frame ablation, {W}x{H} d{DEPTH} spp{SPP} --", flush=True)
base = run("baseline (real walks)")
fc, fa = make_fakes(True, False)
no_any = run("scattered any -> const unoccluded", real_closest, fa)
no_closest = run("scattered closest -> const hit", fc, real_any)
both = run("both scattered removed", fc, fa)
fc2, fa2 = make_fakes(True, True)
none = run("ALL walks removed (pure shading)", fc2, fa2)
print(f"  => scattered any walks:   {base - no_any:8.1f} ms")
print(f"  => scattered closest:     {base - no_closest:8.1f} ms")
print(f"  => coherent bounce-0:     {both - none:8.1f} ms")
print(f"  => residual arithmetic:   {none:8.1f} ms")
