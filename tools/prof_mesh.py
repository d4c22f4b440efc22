#!/usr/bin/env python
"""Virtual-mesh cost visibility (VERDICT r2 weak #9/#7): time the SAME
sharded frame program on a 1-device vs 8-device virtual CPU mesh.

Real multi-chip hardware is not available in this environment; this
measures only that the sharding machinery (halo exchanges, replicated
scene tables, collective-permute in the denoiser) does not add
pathological overhead to the step — the collective-set canary test
(tests/test_pipeline.py::test_sharded_frame_has_no_scene_table_allgather)
guards the op set itself.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
tools/prof_mesh.py   (CPU-pinned internally)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/ptrt_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def main():
    from ptrt_tpu.app.bench_scene import build_bench_scene
    from ptrt_tpu.parallel.sharding import make_pixel_mesh, shard_pixels
    from ptrt_tpu.scene.pt_scene import _frame_fn
    from ptrt_tpu.render.denoiser import init_denoiser_state

    w, h = int(os.environ.get("W", 256)), int(os.environ.get("H", 128))
    sc = build_bench_scene(w, h, target_tris=50_000)
    sc.perf.resolution_scale = 1.0
    sc.perf.samples_per_pixel = 1
    sc.perf.max_bounce_depth = 3
    sc._ensure_device_state()
    den0 = init_denoiser_state(h, w)
    body = _frame_fn(w, h, w, h, 1, 3, True, True, len(sc.lights), False,
                     sc.env_map is not None)

    def run(n_dev):
        mesh = make_pixel_mesh(n_dev)
        body_n = _frame_fn(w, h, w, h, 1, 3, True, True, len(sc.lights),
                           False, sc.env_map is not None,
                           mesh=mesh if n_dev > 1 else None)
        rng = shard_pixels(mesh, sc._rng_state)
        den = jax.tree_util.tree_map(
            lambda a: shard_pixels(mesh, a) if jnp.ndim(a) >= 2 else a, den0)
        f = jax.jit(lambda r, d: body_n(
            sc._geom, sc._mat_table, sc._light_table, sc._sky(), sc.camera,
            r, jnp.int32(1), sc.prev_view_proj, d, sc._blue_noise))
        out = f(rng, den)
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = f(rng, den)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps * 1e3

    ms1 = run(1)
    ms8 = run(8)
    print(f"virtual-mesh step, {w}x{h} denoised frame (CPU host, "
          f"{os.cpu_count()} core(s)): 1-device {ms1:.1f} ms, "
          f"8-device {ms8:.1f} ms (ratio {ms8 / ms1:.2f})")
    print("(8 virtual devices share the same physical core(s); parity-ish "
          "ratio = the sharding adds no pathological collectives)")


if __name__ == "__main__":
    main()
