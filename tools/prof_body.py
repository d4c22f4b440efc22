#!/usr/bin/env python
"""Bisect the traversal body cost on TPU (current BVH8 dual-action API)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ptrt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from ptrt_tpu.app.bench_scene import build_bench_scene
from ptrt_tpu.core.vec import Vec3, cross, normalize, where
from ptrt_tpu.render import traverse as tv
from ptrt_tpu.render.traverse import (_descend, _fetch_leaf, _fetch_node8,
                                      _lsb_slot, _mt_test, _pop_cur,
                                      _safe_inv, T_MIN)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    w, h = 640, 360
    sc = build_bench_scene(w, h, target_tris=20000)
    sc._ensure_device_state()
    geom = sc._geom
    R = w * h
    D = geom.stack_depth
    iota_d = jnp.arange(D, dtype=jnp.int32)

    rng = np.random.default_rng(0)
    o = Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32) * 0.5 + c)
               for c in (0.0, 1.5, 6.0)])
    d = normalize(Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32) - c)
                         for c in (0.0, 0.2, 1.0)]))
    inv_d = _safe_inv(d)
    oe = o.map(lambda c: c[:, None])
    de = d.map(lambda c: c[:, None])

    def init_state():
        t0 = jnp.full((R,), tv.T_MAX, jnp.float32)
        st = tv._init_walk_state(R, D, t0 > 0, ordered=True)
        st.update(t=t0, best=jnp.full((R,), -1, jnp.int32))
        return st

    def run(name, body_fn, iters=16):
        def f():
            def b2(k, s):
                return body_fn(s)
            return jax.lax.fori_loop(0, iters, b2, init_state())
        ms = timeit(jax.jit(f)) * 1e3
        print(f"{name:36s} {ms:8.2f} ms total  {ms/iters:7.3f} ms/iter")

    run("pop only", lambda st: _pop_cur(st, iota_d))
    run("pop + descend (node gather+slab)",
        lambda st: _descend(_pop_cur(st, iota_d), geom, o, inv_d, st["t"],
                            iota_d))

    def leaf_only(st):
        st = _pop_cur(st, iota_d)
        blk = jnp.clip(st["base_l"] + _lsb_slot(st["mask_l"]), 0,
                       geom.num_tri_blocks - 1)
        v0, e1, e2, mesh_id, _ = _fetch_leaf(geom, blk)
        ok, t, uu, vv = _mt_test(v0, e1, e2, oe, de, T_MIN, st["t"][:, None])
        tm = jnp.where(ok & (mesh_id >= 0), t, jnp.inf)
        tbest = jnp.min(tm, axis=-1)
        return dict(st, mask_l=st["mask_l"] & (st["mask_l"] - 1),
                    t=jnp.minimum(st["t"], tbest))

    run("pop + leaf (tri gather + block MT)", leaf_only)

    def leaf_full(st):
        st = _pop_cur(st, iota_d)
        blk = jnp.clip(st["base_l"] + _lsb_slot(st["mask_l"]), 0,
                       geom.num_tri_blocks - 1)
        v0, e1, e2, mesh_id, _ = _fetch_leaf(geom, blk)
        ok, t, uu, vv = _mt_test(v0, e1, e2, oe, de, T_MIN, st["t"][:, None])
        ok = ok & (mesh_id >= 0)
        tm = jnp.where(ok, t, jnp.inf)
        tbest = jnp.min(tm, axis=-1)
        found = tbest < st["t"]
        slot = jnp.argmin(tm, axis=-1).astype(jnp.int32)
        from ptrt_tpu.geometry.bvh import LEAF_SIZE
        return dict(
            st, mask_l=st["mask_l"] & (st["mask_l"] - 1),
            t=jnp.where(found, tbest, st["t"]),
            best=jnp.where(found, blk * LEAF_SIZE + slot, st["best"]),
        )

    run("pop + leaf + best-update (no descend)", leaf_full)

    body = tv._make_closest_body(geom, o, d, iota_d)
    run("FULL body", lambda st: body((st, jnp.int32(0)))[0])


if __name__ == "__main__":
    main()
