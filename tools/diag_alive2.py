#!/usr/bin/env python
"""No-cache bounce-collapse probe: fresh-jit pl.trace_frame at 192x128 on
the current platform, print rays/px + mean radiance + first-hit stats,
with packet walks on/off.  Run once on TPU, once with PTRT_CPU=1; compare.
Dumps /tmp/diag_img_<plat>.npy for cross-platform pixel compare."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PTRT_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/ptrt_jax_cache" + ("_cpu" if os.environ.get("PTRT_CPU")
                                           else ""))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from ptrt_tpu.app.bench_scene import build_bench_scene
from ptrt_tpu.render import pipeline as pl
from ptrt_tpu.render import traverse as tv

plat = jax.devices()[0].platform
sc = build_bench_scene(192, 128, target_tris=20000)
sc._ensure_device_state()
rh, rw = sc.render_size
nl = len(sc.lights)


def probe(label, depth=2):
    fn = jax.jit(lambda geom, mats, lights, sky, camera, rng, fi, bn:
                 pl.trace_frame(geom, mats, lights, nl, sky, camera, rng,
                                fi, rw, rh, 1, depth, split=False,
                                use_brute=False, blue_noise_tbl=bn))
    _, bufs = fn(sc._geom, sc._mat_table, sc._light_table, sc._sky(),
                 sc.camera, sc._rng_state, jnp.int32(1), sc._blue_noise)
    rays = float(bufs.rays_traced)
    mean_r = float((bufs.color.x + bufs.color.y + bufs.color.z).mean()) / 3
    hitfrac = float((bufs.depth < 1e29).mean())
    print(f"[{plat}] {label:24s} rays/px {rays/(rw*rh):5.2f}  "
          f"mean {mean_r:.4f}  first-hit frac {hitfrac:.3f}", flush=True)
    return bufs


bufs = probe("default (packets on)")
np.save(f"/tmp/diag_img_{plat}.npy",
        np.stack([np.asarray(bufs.color.x), np.asarray(bufs.color.y),
                  np.asarray(bufs.color.z)], -1))
tv.PACKET_CLOSEST = 0
tv.PACKET_ANY = 0
probe("packets OFF")
tv.PACKET_CLOSEST = 1
tv.PACKET_ANY = 1
