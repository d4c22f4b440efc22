#!/usr/bin/env python
"""Bisect the bounce-path collapse: at which render size / walk path do
bounce rays die after bounce 0?  Prints rays_traced ratio + mean radiance
for trace-only d2 spp1 at several sizes and with packet walks disabled."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PTRT_JAX_CACHE", "/tmp/ptrt_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from ptrt_tpu.app.bench_scene import build_bench_scene
from ptrt_tpu.render import traverse as tv
from ptrt_tpu.scene.pt_scene import _trace_only


def probe(w, h, label):
    sc = build_bench_scene(w, h, target_tris=1_000_000)
    sc._ensure_device_state()
    rh, rw = sc.render_size
    fn = _trace_only(rw, rh, 1, 2, len(sc.lights), sc._use_brute(),
                     sc.env_map is not None)
    _, bufs = fn(sc._geom, sc._mat_table, sc._light_table, sc._sky(),
                 sc.camera, sc._rng_state, jnp.int32(1), sc._blue_noise)
    rays = float(bufs.rays_traced)
    mean_r = float((bufs.color.x + bufs.color.y + bufs.color.z).mean()) / 3
    print(f"  {label:44s} rays/px {rays/(rw*rh):5.2f}  mean {mean_r:.4f}",
          flush=True)


probe(640, 360, "640x360 default")
probe(1536, 864, "1536x864 default")
probe(1920, 1080, "1920x1080 default")
tv.PACKET_CLOSEST = 0
tv.PACKET_ANY = 0
probe(1920, 1080, "1920x1080 packets OFF")
tv.PACKET_CLOSEST = 1
tv.PACKET_ANY = 1
