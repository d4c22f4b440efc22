#!/usr/bin/env python
"""Profile the BVH8 traversal pieces on the current backend."""
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


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    w = int(os.environ.get("W", 640)); h = int(os.environ.get("H", 360))
    sc = build_bench_scene(w, h, target_tris=int(os.environ.get("TRIS", 20000)))
    sc._ensure_device_state()
    geom = sc._geom
    R = w * h
    print(f"lanes={R} nodes={geom.num_nodes} tri_blocks={geom.num_tri_blocks} "
          f"stack_depth={geom.stack_depth}")

    rng = np.random.default_rng(0)
    o = Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32) * 0.5 + c)
               for c in (0.0, 1.5, 6.0)])
    d = normalize(Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32) - c)
                         for c in (0.0, 0.2, 1.0)]))

    # --- raw gathers ---
    idx_n = jnp.asarray(rng.integers(0, geom.num_nodes, R).astype(np.int32))
    idx_t = jnp.asarray(rng.integers(0, geom.num_tri_blocks, R).astype(np.int32))

    g_node = jax.jit(lambda i: jnp.take(geom.node_rows, i, axis=0).sum(axis=1))
    g_tri = jax.jit(lambda i: jnp.take(geom.tri_rows, i, axis=0).sum(axis=1))
    print(f"node-row gather (R,{geom.node_rows.shape[1]}): "
          f"{timeit(g_node, idx_n)*1e3:.3f} ms")
    print(f"tri-row gather (R,{geom.tri_rows.shape[1]}): "
          f"{timeit(g_tri, idx_t)*1e3:.3f} ms")

    # --- stack ops ---
    D = geom.stack_depth
    stack = jnp.zeros((R, D), jnp.int32)
    sp = jnp.asarray(rng.integers(0, D, R).astype(np.int32))
    iota_d = jnp.arange(D, dtype=jnp.int32)

    def stack_ops(stack, sp, val):
        sel = iota_d[None, :] == sp[:, None]
        top = jnp.sum(jnp.where(sel, stack, 0), axis=1)
        stack = jnp.where(sel, val[:, None], stack)
        return stack, top

    print(f"stack push+pop (R,{D}): "
          f"{timeit(jax.jit(stack_ops), stack, sp, idx_n)*1e3:.3f} ms")

    # --- fixed-iteration closest walk (cost per iteration) ---
    iota = jnp.arange(geom.stack_depth, dtype=jnp.int32)

    def fixed_iters(o, d, n_iters):
        t0 = jnp.full((R,), tv.T_MAX, jnp.float32)
        state = tv._init_walk_state(R, geom.stack_depth, t0 > 0,
                                    ordered=True)
        state.update(t=t0, best=jnp.full((R,), -1, jnp.int32))
        body = tv._make_closest_body(geom, o, d, iota)

        def b2(k, s):
            st, _ = body((s, jnp.int32(k)))
            return st

        return jax.lax.fori_loop(0, n_iters, b2, state)

    for iters in (8, 16, 32):
        fn = jax.jit(lambda o, d, n=iters: fixed_iters(o, d, n))
        ms = timeit(fn, o, d, reps=10) * 1e3
        print(f"fixed {iters:3d} iters: {ms:8.2f} ms  ({ms/iters:.3f} ms/iter)")

    # --- full intersect_closest (with while+compaction) ---
    f = jax.jit(lambda o, d: tv.intersect_closest(geom, o, d).t)
    print(f"intersect_closest full: {timeit(f, o, d, reps=10)*1e3:.2f} ms")

    # remaining work distribution: run fixed iters then count active
    def active_after(o, d, n_iters):
        st = fixed_iters(o, d, n_iters)
        return jnp.sum(tv._active(st).astype(jnp.int32))

    for iters in (4, 8, 12, 16, 24, 32, 48):
        n = int(jax.jit(lambda o, d, n=iters: active_after(o, d, n))(o, d))
        print(f"active after {iters:3d} iters: {n} ({100.0*n/R:.2f}%)")


if __name__ == "__main__":
    main()
