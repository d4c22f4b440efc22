#!/usr/bin/env python
"""Sweep compaction geometry (shrink/stages) for the phase-gated walk."""
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
from ptrt_tpu.render import traverse as tv
from tools.prof_r3 import _camera_rays, _random_rays, timeit

R = int(os.environ.get("R", 2_200_000))
sc = build_bench_scene(1920, 1080, target_tris=1_000_000)
sc._ensure_device_state()
g = sc._geom.static if hasattr(sc._geom, "static") else sc._geom
oc, dc = _camera_rays(sc, R)
orr, drr = _random_rays(R)

CONFIGS = [
    # (big_shrink, stages, any_shrink, any_stages)
    (12, 2, 16, 1),   # round-2 tuned defaults
    (4, 3, 8, 2),
    (6, 3, 16, 2),
    (4, 4, 4, 3),
]

for bs, st, ash, ast in CONFIGS:
    tv.BIG_COMPACT_SHRINK = bs
    tv.COMPACT_STAGES = st
    tv.ANY_COMPACT_SHRINK = ash
    tv.ANY_COMPACT_STAGES = ast
    fc = jax.jit(lambda o, d: tv.intersect_closest(g, o, d).t)
    fa = jax.jit(lambda o, d: tv.intersect_any(g, o, d,
                                               jnp.full((R,), 30.0)))
    mc = timeit(fc, oc, dc, reps=5) * 1e3
    mr = timeit(fc, orr, drr, reps=5) * 1e3
    ac = timeit(fa, oc, dc, reps=5) * 1e3
    ar = timeit(fa, orr, drr, reps=5) * 1e3
    print(f"shrink={bs} stages={st} anyshrink={ash} anystages={ast}: "
          f"closest cam {mc:7.1f} rnd {mr:7.1f} | any cam {ac:6.1f} "
          f"rnd {ar:6.1f} ms", flush=True)
