#!/usr/bin/env python
"""Bisect the traversal body cost on TPU."""
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
from ptrt_tpu.render.traverse import (_fetch_leaf, _fetch_node8, _hitmask8,
                                      _lsb_slot, _mt_test, _pop_cur, _safe_inv,
                                      _slab8, T_MIN)


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

    def init_state():
        t0 = jnp.full((R,), tv.T_MAX, jnp.float32)
        st = tv._init_walk_state(R, D, t0 > 0)
        st.update(t=t0, u=jnp.zeros((R,)), v=jnp.zeros((R,)),
                  nrm=Vec3.zeros((R,)), mesh=jnp.full((R,), -1, jnp.int32))
        return st

    def leaf_action(st, n_tris):
        best_t, best_u, best_v = st["t"], st["u"], st["v"]
        best_nrm, best_mesh = st["nrm"], st["mesh"]
        has_leaf = st["mask_l"] != 0
        blk = jnp.clip(st["base_l"] + _lsb_slot(st["mask_l"]), 0,
                       geom.num_tri_blocks - 1)
        tris = _fetch_leaf(geom, blk)[:n_tris]
        for v0, e1, e2, mesh_id, _ in tris:
            ok, t, uu, vv = _mt_test(v0, e1, e2, o, d, T_MIN, best_t)
            ok = ok & has_leaf & (mesh_id >= 0)
            n = cross(e1, e2)
            best_nrm = where(ok, n, best_nrm)
            best_mesh = jnp.where(ok, mesh_id, best_mesh)
            best_u = jnp.where(ok, uu, best_u)
            best_v = jnp.where(ok, vv, best_v)
            best_t = jnp.where(ok, t, best_t)
        return dict(st, mask_l=st["mask_l"] & (st["mask_l"] - 1), t=best_t,
                    u=best_u, v=best_v, nrm=best_nrm, mesh=best_mesh)

    def run(body_fn, iters=16):
        def f():
            def b2(k, s):
                return body_fn(s)
            return jax.lax.fori_loop(0, iters, b2, init_state())
        ms = timeit(jax.jit(f)) * 1e3
        print(f"  {ms:8.2f} ms total  {ms/iters:7.3f} ms/iter")
        return ms / iters

    print("pop only:")
    run(lambda st: _pop_cur(st, iota_d))

    print("pop + node action:")
    run(lambda st: tv._descend(_pop_cur(st, iota_d), geom, o, inv_d,
                               st["t"], iota_d))

    for nt in (1, 4, 8, 16):
        print(f"pop + leaf action ({nt} MT tests):")
        run(lambda st, nt=nt: leaf_action(_pop_cur(st, iota_d), nt))

    print("full body:")
    body = tv._make_closest_body(geom, o, d, iota_d)
    run(lambda st: body((st, jnp.int32(0)))[0])

    print("node gather only (no slab/push):")

    def node_gather_only(st):
        naddr = jnp.clip(st["base_i"] + _lsb_slot(st["mask_i"]), 0,
                         geom.num_nodes - 1)
        row = jnp.take(geom.node_rows, naddr, axis=0)
        return dict(st, base_i=st["base_i"] ^ tv._i32(row[:, 48]),
                    mask_i=st["mask_i"] & (st["mask_i"] - 1))
    run(node_gather_only)

    print("tri gather only (sum row, no MT):")

    def tri_gather_only(st):
        blk = jnp.clip(st["base_l"] + _lsb_slot(st["mask_l"]), 0,
                       geom.num_tri_blocks - 1)
        row = jnp.take(geom.tri_rows, blk, axis=0)
        return dict(st, t=st["t"] + row.sum(axis=1),
                    mask_l=st["mask_l"] & (st["mask_l"] - 1))
    run(tri_gather_only)


if __name__ == "__main__":
    main()
