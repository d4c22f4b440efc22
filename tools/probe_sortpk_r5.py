#!/usr/bin/env python
"""Round-5 architecture probe: SORTED-PACKET traversal for scattered rays.

The scattered bounce walks are 81% of a d4 frame (TODO.md in-situ ladder)
and sit near the per-ray gather-model floor (~58 ns/lane).  Packets beat
per-ray walks 2-6x on coherent rays by amortizing every gathered row over
64 rays — scattered rays just don't share sign/locality... unless we BIN
them first.  Round-1 rejected ray sorting (10x worse), but that predates
the fused row transport that made permutations ~1 gather, and it permuted
the whole walk, not a packet head.

Pipeline probed here:
  key = octant(3b) | morton(origin cell)        (dead lanes sort last)
  perm = argsort(key); permute o/d/t (fused row gather)
  packet_closest_partial over (R/64, 64) packets  (head)
  per-ray scattered tail over unfinished packets' rays (exact restart)
  unsort results

Exactness: packets are conservative and the tail re-walks with tightened t;
results match the per-ray walk modulo closest-t ties.

Run on TPU:  python tools/probe_sortpk_r5.py
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
import numpy as np

from ptrt_tpu.app.bench_scene import build_bench_scene
from ptrt_tpu.core.vec import Vec3, normalize
from ptrt_tpu.render import traverse as tv
from ptrt_tpu.render import packet as pk


def timeit(f, *a, reps=5):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    # force a host fetch: block_until_ready through the axon tunnel can
    # return early on uncommitted results (TODO.md measurement discipline)
    first = out[0] if isinstance(out, (tuple, list)) else out
    np.asarray(jnp.sum(first))
    return (time.perf_counter() - t0) / reps


def _morton3(x, y, z, bits):
    """Interleave three `bits`-bit ints (constant shifts only)."""
    out = jnp.zeros_like(x)
    for b in range(bits):
        out = (out
               | (((x >> b) & 1) << (3 * b))
               | (((y >> b) & 1) << (3 * b + 1))
               | (((z >> b) & 1) << (3 * b + 2)))
    return out


def _sort_key(g, o: Vec3, d: Vec3, t0, cell_bits: int):
    """(octant | morton(origin cell)) int32 key; dead lanes sort last."""
    root = g.node_rows[0]
    bmin = [jnp.min(root[a * 8:(a + 1) * 8]) for a in range(3)]
    bmax = [jnp.max(root[24 + a * 8:24 + (a + 1) * 8]) for a in range(3)]
    n = (1 << cell_bits) - 1
    cells = []
    for a, c in enumerate((o.x, o.y, o.z)):
        f = (c - bmin[a]) / jnp.maximum(bmax[a] - bmin[a], 1e-6)
        cells.append(jnp.clip((f * (n + 1)).astype(jnp.int32), 0, n))
    m = _morton3(*cells, bits=cell_bits)
    key = (tv._ray_octant(d) << (3 * cell_bits)) | m
    return jnp.where(t0 > 0.0, key, jnp.int32(2 ** 30))


def sorted_packet_closest(g, o: Vec3, d: Vec3, t0, cell_bits=6,
                          pk_shrink=16, P=64):
    R = jnp.size(t0)
    key = _sort_key(g, o, d, t0, cell_bits)
    perm = jnp.argsort(key).astype(jnp.int32)
    take = lambda a: jnp.take(a, perm, axis=0)
    o_s, d_s = o.map(take), d.map(take)
    t_s = take(t0)

    shp = (R // P, P)
    rp = lambda a: a.reshape(shp)
    s, unfin = pk.packet_closest_partial(
        g, o_s.map(rp), d_s.map(rp), rp(t_s), shrink=pk_shrink)
    t_pk = s["t"].reshape(-1)
    best_pk = s["best"].reshape(-1)
    unfin_rays = jnp.broadcast_to(unfin[:, None], shp).reshape(-1)

    t_restart = jnp.where(unfin_rays & (t_s > 0.0), t_pk, -1.0)
    s_ray = tv._walk_closest_raw(g, o_s, d_s, t_restart, scattered=True,
                                 skip_pass1=pk_shrink >= (tv.SCATTER_SHRINK
                                                          or 16))
    closer = s_ray["best"] >= 0
    t_m = jnp.where(closer, s_ray["t"], t_pk)
    best_m = jnp.where(closer, s_ray["best"], best_pk)
    # unsort
    inv = jnp.zeros((R,), jnp.int32).at[perm].set(
        jnp.arange(R, dtype=jnp.int32))
    return jnp.take(t_m, inv, axis=0), jnp.take(best_m, inv, axis=0)


def main():
    W, H = (int(os.environ.get("PW", 1920)), int(os.environ.get("PH", 1080)))
    tris = int(os.environ.get("PTRIS", 1_000_000))
    sc = build_bench_scene(W, H, target_tris=tris)
    sc._ensure_device_state()
    g = sc._geom.static if hasattr(sc._geom, "static") else sc._geom
    R = W * H
    from tools.prof_r3 import _camera_rays

    o, d = _camera_rays(sc, R)
    hitp = tv.intersect_closest(g, o, d)
    rng = np.random.default_rng(2)
    rnd = normalize(Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32))
                           for _ in range(3)]))
    n = hitp.normal
    dd = normalize(Vec3(n.x + 0.9 * rnd.x, n.y + 0.9 * rnd.y,
                        n.z + 0.9 * rnd.z))
    oo = Vec3(hitp.point.x + n.x * 1e-3, hitp.point.y + n.y * 1e-3,
              hitp.point.z + n.z * 1e-3)
    t0 = jnp.where(hitp.hit, 1e30, -1.0)
    live = float(jnp.mean((t0 > 0).astype(jnp.float32)))
    print(f"bounce-1 wavefront R={R} live={live:.2f}", flush=True)

    base = jax.jit(lambda O, D, T: tv.intersect_closest(
        g, O, D, T, scattered=True).t)
    ms = timeit(base, oo, dd, t0) * 1e3
    t_ref = np.asarray(base(oo, dd, t0))
    print(f"baseline scattered per-ray ladder: {ms:8.1f} ms", flush=True)

    sortonly = jax.jit(lambda O, D, T: jnp.take(
        T, jnp.argsort(_sort_key(g, O, D, T, 6)).astype(jnp.int32), axis=0))
    ms = timeit(sortonly, oo, dd, t0) * 1e3
    print(f"sort+1-array-permute only:         {ms:8.1f} ms", flush=True)

    # keep the default grid small: each variant is a fresh multi-minute
    # compile on this 1-core host (widen via CB=5,6,7 SHR=8,16,32)
    for cb in (int(x) for x in os.environ.get("CB", "6").split(",")):
        for shr in (int(x) for x in os.environ.get("SHR", "16,8").split(",")):
            f = jax.jit(lambda O, D, T, cb=cb, shr=shr: sorted_packet_closest(
                g, O, D, T, cell_bits=cb, pk_shrink=shr)[0])
            ms = timeit(f, oo, dd, t0) * 1e3
            got = np.asarray(f(oo, dd, t0))
            mism = int((~np.isclose(got, t_ref, rtol=1e-5, atol=1e-5)).sum())
            print(f"sorted-packet cb={cb} shrink={shr:3d}: {ms:8.1f} ms  "
                  f"mismatches={mism}", flush=True)

    # the PRODUCT integration (traverse._sorted_packet_closest_state)
    tv.SORTPK = 1
    fprod = jax.jit(lambda O, D, T: tv._sorted_packet_closest_state(
        g, O, D, T)["t"])
    ms = timeit(fprod, oo, dd, t0) * 1e3
    got = np.asarray(fprod(oo, dd, t0))
    mism = int((~np.isclose(got, t_ref, rtol=1e-5, atol=1e-5)).sum())
    print(f"product _sorted_packet_closest_state: {ms:8.1f} ms  "
          f"mismatches={mism}", flush=True)
    tv.SORTPK = 0


if __name__ == "__main__":
    main()
