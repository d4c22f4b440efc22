#!/usr/bin/env python
"""Sweep compaction parameters (PASS_MIN_ITERS, SHRINK, STAGES) on TPU.

The constants are read from env at traverse import, so each config runs in
a fresh subprocess.  Measures intersect_closest + intersect_any on the
bench scene at 640x360 lanes.
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHILD = """
import os, sys, time
sys.path.insert(0, %(root)r)
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ptrt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from ptrt_tpu.app.bench_scene import build_bench_scene
from ptrt_tpu.core.vec import Vec3, normalize
from ptrt_tpu.render import traverse as tv

import os as _o
sc = build_bench_scene(int(_o.environ.get("SW_W","640")), int(_o.environ.get("SW_H","360")), target_tris=int(_o.environ.get("SW_TRIS","20000")))
sc._ensure_device_state()
geom = sc._geom
R = int(_o.environ.get("SW_W","640")) * int(_o.environ.get("SW_H","360"))
rng = np.random.default_rng(0)
o = Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32) * 0.5 + c)
           for c in (0.0, 1.5, 6.0)])
d = normalize(Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32) - c)
                     for c in (0.0, 0.2, 1.0)]))

def timeit(fn, *args, reps=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps

fc = jax.jit(lambda o, d: tv.intersect_closest(geom, o, d).t)
fa = jax.jit(lambda o, d: tv.intersect_any(
    geom, o, d, jnp.full((R,), 100.0)))
c_ms = timeit(fc, o, d) * 1e3
a_ms = timeit(fa, o, d) * 1e3
print("RESULT closest %%.2f any %%.2f" %% (c_ms, a_ms))
""" % {"root": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}


def run(pmi, shrink, stages):
    env = dict(os.environ)
    env["PTRT_PASS_MIN_ITERS"] = str(pmi)
    env["PTRT_COMPACT_SHRINK"] = str(shrink)
    env["PTRT_COMPACT_STAGES"] = str(stages)
    p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=900)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT"):
            print(f"pmi={pmi} shrink={shrink:2d} stages={stages}: "
                  f"{line[7:]}")
            return
    print(f"pmi={pmi} shrink={shrink} stages={stages}: FAILED\n"
          f"{p.stderr[-500:]}")


if __name__ == "__main__":
    import os
    cfgs = os.environ.get("SW_CFGS")
    if cfgs:
        combos = [tuple(int(x) for x in c.split("-")) for c in cfgs.split(",")]
    else:
        combos = [(2, 8, 2), (2, 4, 2), (2, 4, 3), (1, 4, 3), (2, 16, 1),
                  (2, 8, 1), (3, 8, 2)]
    for pmi, shrink, stages in combos:
        run(pmi, shrink, stages)
