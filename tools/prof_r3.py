#!/usr/bin/env python
"""Round-3 traversal profiling: decompose walk cost into (a) gather cost as
a function of TABLE SIZE / width / dtype, (b) lock-step work efficiency
(active-width profile per iteration), (c) per-lane visit distribution.

Round-2 in-situ numbers hint gather cost scales with table bytes, not row
width (node 3MB table: 3.4 ns/idx; tri 27MB table: 11.8 ns/idx at 2M
lanes) — if true, bf16 rows (half the table) are a real lever even though
row WIDTH is free.
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


def _sync(out):
    """Force FULL materialization of a result: ``block_until_ready``
    through the axon tunnel can return before the dispatch queue drains
    (measured: a 30 ms walk 'timed' at 0.1 ms), so fetch a tiny slice of
    one leaf to the host — the fetch orders after everything queued."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf if getattr(leaf, "ndim", 0) == 0
               else leaf.reshape(-1)[:1])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / reps


def part_a(R=2_200_000):
    """Gather ns/idx vs table size x width x dtype.

    The consumer is a slab-test-like reduction mixing per-LANE state with
    the gathered row, chained K deep so each gather depends on the last —
    XLA cannot factor a per-row reduction through the gather (the round-2
    microbench trap: take(t,i).sum(1) compiles to take(rowsum(t), i))."""
    K = 4
    rng = np.random.default_rng(0)
    lane = jnp.asarray(rng.normal(size=(R,)).astype(np.float32))
    print(f"-- A: gather cost vs table size/width/dtype at {R} indices, "
          f"chain K={K} --")

    def chain(i0, t, rows):
        def body(k, carry):
            i, acc = carry
            row = jnp.take(t, i, axis=0).astype(jnp.float32)
            # per-lane mix: (row - lane) * lane, folded via min/max pairs
            lo = jnp.min(jnp.maximum(row[:, 0:8], lane[:, None]), axis=1)
            hi = jnp.max(jnp.minimum(row[:, 8:16], lane[:, None]), axis=1)
            m = (lo <= hi).astype(jnp.int32)
            i2 = (i * 1664525 + 1013904223 + m) % rows
            return (i2, acc + lo - hi)
        _, acc = jax.lax.fori_loop(0, K, body, (i0, jnp.zeros((R,))))
        return acc

    for dtype, dname in ((np.float32, "f32"), (np.float16, "f16")):
        for rows, width in ((12_000, 64), (48_000, 64), (96_000, 64),
                            (96_000, 80), (384_000, 64), (384_000, 16),
                            (384_000, 80), (1_500_000, 64)):
            tbl = jnp.asarray(rng.normal(size=(rows, width)).astype(dtype))
            idx = jnp.asarray(rng.integers(0, rows, R).astype(np.int32))
            f = jax.jit(lambda i, t, n=rows: chain(i, t, n))
            ms = timeit(f, idx, tbl) * 1e3 / K
            mb = rows * width * np.dtype(dtype).itemsize / 1e6
            print(f"  {dname} ({rows:>9},{width:>3}) {mb:7.1f} MB: "
                  f"{ms:8.2f} ms/gather  {ms*1e6/R:6.2f} ns/idx  "
                  f"{R*width*np.dtype(dtype).itemsize/ms*1e3/1e9:6.1f} GB/s")


def _camera_rays(sc, R):
    """R rays through pixel centers.  For R < rw*rh the pixels are STRIDED
    over the whole frame (a contiguous block would sample one corner — the
    top rows see only sky/floor and give wildly unrepresentative hit and
    bounce populations)."""
    rh, rw = sc.render_size
    cam = sc.camera
    total = rw * rh
    pix = (np.arange(R, dtype=np.int64) * max(total // R, 1)) % total
    ys = pix // rw
    xs = pix % rw
    u = jnp.asarray((xs + 0.5) / rw, jnp.float32)
    v = jnp.asarray((ys + 0.5) / rh, jnp.float32)
    rb = cam.get_ray_simple(u, v)
    o = rb.origin.map(lambda c: jnp.broadcast_to(c, (R,)))
    d = rb.direction
    return o, d


def _random_rays(R):
    rng = np.random.default_rng(1)
    o = Vec3(*[jnp.asarray(rng.uniform(-5, 5, R).astype(np.float32) + c)
               for c in (0.0, 1.0, 6.0)])
    d = normalize(Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32))
                         for _ in range(3)]))
    return o, d


def part_b(sc, R=2_200_000):
    """Walk baselines + active-width profile."""
    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    print(f"-- B: walks at {R} lanes, nodes={g.num_nodes} "
          f"blocks={g.num_tri_blocks} "
          f"node_tbl={g.node_rows.nbytes/1e6:.1f}MB "
          f"tri_tbl={g.tri_rows.nbytes/1e6:.1f}MB --")
    for name, (o, d) in (("camera", _camera_rays(sc, R)),
                         ("random", _random_rays(R))):
        f = jax.jit(lambda oo, dd: tv.intersect_closest(g, oo, dd).t)
        ms = timeit(f, o, d, reps=5) * 1e3
        print(f"  closest {name}: {ms:8.1f} ms "
              f"({R/ms*1e3/1e6:6.1f} Mrays/s)")
        fa = jax.jit(lambda oo, dd: tv.intersect_any(
            g, oo, dd, jnp.full((R,), 30.0)))
        ms = timeit(fa, o, d, reps=5) * 1e3
        print(f"  any     {name}: {ms:8.1f} ms "
              f"({R/ms*1e3/1e6:6.1f} Mrays/s)")


def part_c(sc, R=2_200_000):
    """Host-stepped body: per-iteration active width -> work efficiency."""
    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    o, d = _camera_rays(sc, R)
    iota_d = jnp.arange(g.stack_depth, dtype=jnp.int32)
    state = tv._init_walk_state(R, g.stack_depth, jnp.ones((R,), bool),
                                ordered=True)
    state.update(t=jnp.full((R,), 1e30), best=jnp.full((R,), -1, jnp.int32))
    body, _ = tv._make_closest_body(g, o, d, iota_d)

    step = jax.jit(lambda s: body((s, jnp.int32(0)))[0])
    count = jax.jit(lambda s: jnp.sum(tv._active(s).astype(jnp.int32)))
    leafw = jax.jit(lambda s: jnp.sum((s["mask_l"] != 0).astype(jnp.int32)))

    widths, leaf_useful = [], []
    s = state
    t_full = timeit(step, s, reps=3)
    for it in range(400):
        n = int(count(s))
        if n == 0:
            break
        widths.append(n)
        leaf_useful.append(int(leafw(s)))
        s = step(s)
    widths = np.array(widths)
    lw = np.array(leaf_useful)
    print(f"-- C: camera-walk profile ({R} lanes) --")
    print(f"  full-width iteration time: {t_full*1e3:.2f} ms")
    print(f"  iterations to drain: {len(widths)}")
    print(f"  sum(active)/R = {widths.sum()/R:.2f} (per-lane iters if "
          f"perfectly compacted)")
    print(f"  active width percentiles: "
          f"p50={np.percentile(widths,50)/R:.3f} "
          f"p90={np.percentile(widths,90)/R:.3f} (frac of R)")
    print(f"  leaf-gather useful fraction (mask_l!=0): "
          f"{lw.sum()/max(widths.sum(),1):.2f}")
    # lock-step cost model: iters x cost(width). vs ideal: sum(active) at
    # marginal per-index cost
    print(f"  width profile head: {[round(wv/R,3) for wv in widths[:20]]}")
    print(f"  width profile tail: {[round(wv/R,4) for wv in widths[-10:]]}")


def _main():
    which = os.environ.get("PARTS", "abc")
    R = int(os.environ.get("R", 2_200_000))
    tris = int(os.environ.get("TRIS", 1_000_000))
    if "a" in which:
        part_a(R)
    if "f" in which:
        part_f(R)
    if "o" in which:
        part_o(R)
    if set(which) & set("bcdeghijklmnpqs"):
        sc = build_bench_scene(1920, 1080, target_tris=tris)
        sc._ensure_device_state()
        if "b" in which:
            part_b(sc, R)
        if "c" in which:
            part_c(sc, R)
        if "d" in which:
            part_d(sc, R)
        if "e" in which:
            part_e(sc, R)
        if "g" in which:
            part_g(sc, R)
        if "h" in which:
            part_h(sc)
        if "i" in which:
            part_i(sc)
        if "j" in which:
            part_j(sc)
        if "k" in which:
            part_k(sc)
        if "l" in which:
            part_l(sc)
        if "m" in which:
            part_m(sc)
        if "n" in which:
            part_n(sc)
        if "s" in which:
            part_s(sc)
        if "p" in which:
            part_p(sc, R=int(os.environ.get("RP", "0")) or None)
        if "q" in which:
            part_q(sc)


def part_d(sc, R=2_200_000):
    """Ablate the closest-body cost at full width: gathers vs slab/MT vs
    stack machinery."""
    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    o, d = _camera_rays(sc, R)
    iota_d = jnp.arange(g.stack_depth, dtype=jnp.int32)
    state = tv._init_walk_state(R, g.stack_depth, jnp.ones((R,), bool),
                                ordered=True)
    state.update(t=jnp.full((R,), 1e30), best=jnp.full((R,), -1, jnp.int32))
    body, _ = tv._make_closest_body(g, o, d, iota_d)
    step = jax.jit(lambda s: body((s, jnp.int32(0)))[0])
    # advance two steps so masks/stacks are in a generic configuration
    s2 = step(step(state))
    print(f"-- D: body ablation at {R} lanes --")
    print(f"  full body: {timeit(step, s2, reps=10)*1e3:7.2f} ms")

    inv_d = tv._safe_inv(d)
    octant = tv._ray_octant(d)
    oe = o.map(lambda c: c[:, None])
    de = d.map(lambda c: c[:, None])

    def node_part(s):
        blk = jnp.clip(s["base_i"] + tv._lsb_slot(s["mask_i"]), 0,
                       g.num_nodes - 1)
        bmin8, bmax8, cba, lb, lm, im, op = tv._fetch_node8(g, blk, octant)
        hitm = tv._hitmask8(tv._slab8(bmin8, bmax8, o, inv_d, s["t"]))
        return hitm & im & lm, cba + lb, op

    def leaf_part(s):
        blk = jnp.clip(s["base_l"] + tv._lsb_slot(s["mask_l"]), 0,
                       g.num_tri_blocks - 1)
        v0, e1, e2, mid, _ = tv._fetch_leaf(g, blk)
        ok, t, _, _ = tv._mt_test(v0, e1, e2, oe, de, tv.T_MIN,
                                  s["t"][:, None])
        tm = jnp.where(ok & (mid >= 0), t, jnp.inf)
        return jnp.min(tm, axis=-1), jnp.argmin(tm, axis=-1)

    def stack_part(s):
        s = dict(s)
        s = tv._pop_cur(s, iota_d)
        st = tv._descend(s, g, o, inv_d, s["t"], iota_d, octant)
        return st["sp"], st["mask_i"], st["base_i"]

    print(f"  node gather+slab+ord: "
          f"{timeit(jax.jit(node_part), s2, reps=10)*1e3:7.2f} ms")
    print(f"  leaf gather+MT:       "
          f"{timeit(jax.jit(leaf_part), s2, reps=10)*1e3:7.2f} ms")
    print(f"  pop+descend (incl node gather): "
          f"{timeit(jax.jit(stack_part), s2, reps=10)*1e3:7.2f} ms")




def part_e(sc, R=2_200_000):
    """Isolate the leaf path: gather vs MT math vs layout variants."""
    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    o, d = _camera_rays(sc, R)
    rng = np.random.default_rng(0)
    blkidx = jnp.asarray(rng.integers(0, g.num_tri_blocks, R).astype(np.int32))
    tbound = jnp.full((R,), 25.0)
    oe = o.map(lambda c: c[:, None])
    de = d.map(lambda c: c[:, None])
    blk_const = jnp.asarray(
        rng.normal(size=(R, g.tri_rows.shape[1])).astype(np.float32))

    def consume(x):
        return x[:, 0] + x[:, -1]

    def e1(i):  # gather only
        return consume(jnp.take(g.tri_rows, i, axis=0))

    def mt_from(blk, L=8):
        c = lambda k: blk[..., k * L:(k + 1) * L]
        v0 = Vec3(c(0), c(1), c(2)); e1_ = Vec3(c(3), c(4), c(5))
        e2 = Vec3(c(6), c(7), c(8))
        mid = tv._i32(c(9)) >> 1
        ok, t, _, _ = tv._mt_test(v0, e1_, e2, oe, de, tv.T_MIN,
                                  tbound[:, None])
        tm = jnp.where(ok & (mid >= 0), t, jnp.inf)
        return jnp.min(tm, axis=-1), jnp.argmin(tm, axis=-1)

    def e2(i):  # gather + MT
        return mt_from(jnp.take(g.tri_rows, i, axis=0))

    def e3(_):  # MT on constant rows (no gather)
        return mt_from(blk_const)

    def e4(i):  # node gather + slab, for reference
        bmin8, bmax8, cba, lb, lm, im, _ = tv._fetch_node8(
            g, jnp.clip(i, 0, g.num_nodes - 1))
        return tv._hitmask8(tv._slab8(bmin8, bmax8, o, tv._safe_inv(d),
                                      tbound))

    def e5(_):  # slab on constant node rows (no gather)
        row = blk_const[:, 0:64]
        bmin8 = (row[:, 0:8], row[:, 8:16], row[:, 16:24])
        bmax8 = (row[:, 24:32], row[:, 32:40], row[:, 40:48])
        return tv._hitmask8(tv._slab8(bmin8, bmax8, o, tv._safe_inv(d),
                                      tbound))

    print(f"-- E: leaf-path isolation at {R} lanes --")
    for name, fn, arg in (("tri gather only", e1, blkidx),
                          ("tri gather + MT", e2, blkidx),
                          ("MT on const rows", e3, blkidx),
                          ("node gather + slab", e4, blkidx),
                          ("slab on const rows", e5, blkidx)):
        ms = timeit(jax.jit(fn), arg, reps=10) * 1e3
        print(f"  {name:24s} {ms:8.2f} ms")


def part_g(sc, R=2_200_000):
    """Layout ablation: the MT/slab blocks run on (R, 8) arrays whose minor
    dim uses 8 of the VPU's 128 lanes — if Mosaic pads the minor dim, every
    intermediate is 16x the useful bytes.  Compare slot-major (8, R)
    variants where the minor dim is the wavefront."""
    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    o, d = _camera_rays(sc, R)
    rng = np.random.default_rng(0)
    blkidx = jnp.asarray(rng.integers(0, g.num_tri_blocks, R).astype(np.int32))
    nidx = jnp.asarray(rng.integers(0, g.num_nodes, R).astype(np.int32))
    tbound = jnp.full((R,), 25.0)
    L = 8

    # pre-transposed tables (what assemble_geometry would store)
    tri_T = jnp.asarray(np.asarray(g.tri_rows).T.copy())  # (80, NB)
    node_T = jnp.asarray(np.asarray(g.node_rows).T.copy())  # (64, N)

    def mt_slotmajor(cols, oo, dd):
        """cols: (80, R) slot-major gathered rows -> per-lane best (t, slot).
        All intermediates are (R,) dense or (8, R)."""
        c = lambda k: cols[k * L:(k + 1) * L]  # (8, R)
        v0 = Vec3(c(0), c(1), c(2))
        e1_ = Vec3(c(3), c(4), c(5))
        e2 = Vec3(c(6), c(7), c(8))
        mid = tv._i32(c(9)) >> 1
        ok, t, _, _ = tv._mt_test(v0, e1_, e2,
                                  oo.map(lambda x: x[None, :]),
                                  dd.map(lambda x: x[None, :]),
                                  tv.T_MIN, tbound[None, :])
        tm = jnp.where(ok & (mid >= 0), t, jnp.inf)
        return jnp.min(tm, axis=0), jnp.argmin(tm, axis=0)

    def g1(i):  # current: gather (R,80) rows + row-major MT
        blk = jnp.take(g.tri_rows, i, axis=0)
        oe = o.map(lambda c: c[:, None])
        de = d.map(lambda c: c[:, None])
        c = lambda k: blk[..., k * L:(k + 1) * L]
        v0 = Vec3(c(0), c(1), c(2)); e1_ = Vec3(c(3), c(4), c(5))
        e2 = Vec3(c(6), c(7), c(8))
        mid = tv._i32(c(9)) >> 1
        ok, t, _, _ = tv._mt_test(v0, e1_, e2, oe, de, tv.T_MIN,
                                  tbound[:, None])
        tm = jnp.where(ok & (mid >= 0), t, jnp.inf)
        return jnp.min(tm, axis=-1), jnp.argmin(tm, axis=-1)

    def g2(i):  # gather rows then transpose -> slot-major MT
        blk = jnp.take(g.tri_rows, i, axis=0)  # (R, 80)
        return mt_slotmajor(blk.T, o, d)

    def g3(i):  # gather COLUMNS from pre-transposed table -> slot-major MT
        cols = jnp.take(tri_T, i, axis=1)  # (80, R)
        return mt_slotmajor(cols, o, d)

    def slab_slotmajor(cols, oo, inv, tb):
        """cols: (64, R); slab on (8, R) arrays -> (R,) int32 mask."""
        bmin8 = (cols[0:8], cols[8:16], cols[16:24])
        bmax8 = (cols[24:32], cols[32:40], cols[40:48])
        oc = (oo.x[None, :], oo.y[None, :], oo.z[None, :])
        ic = (inv.x[None, :], inv.y[None, :], inv.z[None, :])
        t_enter = jnp.zeros((8, R), jnp.float32)
        t_exit = jnp.broadcast_to(tb[None, :], (8, R))
        for a in range(3):
            t0 = (bmin8[a] - oc[a]) * ic[a]
            t1 = (bmax8[a] - oc[a]) * ic[a]
            t_enter = jnp.maximum(t_enter, jnp.minimum(t0, t1))
            t_exit = jnp.minimum(t_exit, jnp.maximum(t0, t1))
        hits = t_enter <= t_exit  # (8, R)
        m = jnp.zeros((R,), jnp.int32)
        for k in range(8):
            m = m | jnp.where(hits[k], jnp.int32(1 << k), 0)
        return m

    def s1(i):  # current node fetch + slab (row-major)
        bmin8, bmax8, *_ = tv._fetch_node8(g, i)
        return tv._hitmask8(tv._slab8(bmin8, bmax8, o, tv._safe_inv(d),
                                      tbound))

    def s2(i):  # transposed-table column gather + slot-major slab
        cols = jnp.take(node_T, i, axis=1)  # (64, R)
        return slab_slotmajor(cols, o, tv._safe_inv(d), tbound)

    def s3(i):  # row gather + transpose + slot-major slab
        cols = jnp.take(g.node_rows, i, axis=0).T
        return slab_slotmajor(cols, o, tv._safe_inv(d), tbound)

    print(f"-- G: slot-major layout ablation at {R} lanes --")
    for name, fn, arg in (("MT row-major (current)", g1, blkidx),
                          ("MT gather+transpose", g2, blkidx),
                          ("MT col-gather of (80,NB)", g3, blkidx),
                          ("slab row-major (current)", s1, nidx),
                          ("slab col-gather of (64,N)", s2, nidx),
                          ("slab gather+transpose", s3, nidx)):
        ms = timeit(jax.jit(fn), arg, reps=10) * 1e3
        print(f"  {name:28s} {ms:8.2f} ms")


def part_h(sc, R=2_073_600):
    """Packet traversal vs per-ray walk on camera rays (1080p tiles)."""
    from ptrt_tpu.render import packet as pk

    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    h, w = 1080, 1920
    o, d = _camera_rays(sc, h * w)
    npkt = (h // 8) * (w // 8)

    def to_pk(c):
        return pk.tile_to_packets(c.reshape(h, w), h, w)

    o_p = o.map(to_pk)
    d_p = d.map(to_pk)
    t0_p = jnp.full((npkt, 64), 1e30)

    print(f"-- H: packet vs per-ray, {h}x{w} camera rays, "
          f"{npkt} packets of 64 --")
    f_ray = jax.jit(lambda oo, dd: tv.intersect_closest(g, oo, dd).t)
    ms_ray = timeit(f_ray, o, d, reps=5) * 1e3
    print(f"  per-ray closest: {ms_ray:8.1f} ms "
          f"({h*w/ms_ray/1e3:6.1f} Mrays/s)")

    f_pk = jax.jit(lambda oo, dd: pk.packet_closest(g, oo, dd, t0_p)["t"])
    ms_pk = timeit(f_pk, o_p, d_p, reps=5) * 1e3
    print(f"  packet  closest: {ms_pk:8.1f} ms "
          f"({h*w/ms_pk/1e3:6.1f} Mrays/s)  {ms_ray/ms_pk:4.1f}x")

    # equivalence
    t_ray = np.asarray(f_ray(o, d)).reshape(h, w)
    t_pk = np.asarray(pk.packets_to_tile(f_pk(o_p, d_p), h, w))
    t_ray_f = np.where(t_ray > 1e29, 0, t_ray)
    t_pk_f = np.where(t_pk > 1e29, 0, t_pk)
    bad = np.abs(t_ray_f - t_pk_f) > 1e-3 * np.maximum(t_ray_f, 1.0)
    print(f"  t mismatch frac: {bad.mean():.2e}")

    # any-hit: shadow-ray-like (toward a point above the scene)
    tgt = Vec3(jnp.float32(0.0), jnp.float32(8.0), jnp.float32(6.0))
    to_l = Vec3(tgt.x - o.x, tgt.y - o.y, tgt.z - o.z)
    dist = jnp.sqrt(to_l.dot(to_l))
    d_s = Vec3(to_l.x / dist, to_l.y / dist, to_l.z / dist)
    tf = dist * 0.999
    f_anyr = jax.jit(lambda oo, dd, tt: tv.intersect_any(g, oo, dd, tt))
    ms_ar = timeit(f_anyr, o, d_s, tf, reps=5) * 1e3
    print(f"  per-ray any:     {ms_ar:8.1f} ms")
    d_sp = d_s.map(to_pk)
    tf_p = to_pk(tf)
    f_anyp = jax.jit(lambda oo, dd, tt: pk.packet_any(g, oo, dd, tt))
    ms_ap = timeit(f_anyp, o_p, d_sp, tf_p, reps=5) * 1e3
    print(f"  packet  any:     {ms_ap:8.1f} ms  {ms_ar/ms_ap:4.1f}x")
    h_ray = np.asarray(f_anyr(o, d_s, tf)).reshape(h, w)
    h_pk = np.asarray(pk.packets_to_tile(f_anyp(o_p, d_sp, tf_p), h, w))
    print(f"  any mismatch frac: {(h_ray != h_pk).mean():.2e}")


def part_i(sc):
    """Packet-size sweep + incoherent (bounce-like) workloads: where do
    packets win?  Secondary rays keep the camera's TILE grouping (their
    origins are the tile's hit points) but scatter directions."""
    from ptrt_tpu.render import packet as pk

    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    h, w = 1080, 1920
    o, d = _camera_rays(sc, h * w)
    hit = jax.jit(lambda oo, dd: tv.intersect_closest(g, oo, dd))(o, d)
    jax.block_until_ready(hit.t)
    # bounce-1 rays: origin = hit point (+normal offset), cosine dir
    rng = np.random.default_rng(3)
    n = np.stack([np.asarray(hit.normal.x), np.asarray(hit.normal.y),
                  np.asarray(hit.normal.z)], -1)
    nrm = np.where(np.asarray(hit.hit)[:, None], n, np.array([0, 1, 0.0]))
    r1, r2 = rng.uniform(size=(2, h * w))
    st = np.sqrt(r1)
    phi = 2 * np.pi * r2
    # local cosine sample -> world via ONB
    a = np.where(np.abs(nrm[:, 1:2]) < 0.9, np.array([0, 1, 0.0]),
                 np.array([1, 0, 0.0]))
    tb = np.cross(a, nrm)
    tb /= np.maximum(np.linalg.norm(tb, axis=1, keepdims=True), 1e-9)
    bb = np.cross(nrm, tb)
    dloc = (tb * (st * np.cos(phi))[:, None] + bb * (st * np.sin(phi))[:, None]
            + nrm * np.sqrt(np.maximum(1 - r1, 0))[:, None])
    o2 = Vec3(hit.point.x + hit.normal.x * 1e-3,
              hit.point.y + hit.normal.y * 1e-3,
              hit.point.z + hit.normal.z * 1e-3)
    d2 = Vec3(*[jnp.asarray(dloc[:, k].astype(np.float32)) for k in range(3)])
    live = jnp.asarray(np.asarray(hit.hit))
    t_b = jnp.where(live, 1e30, -1.0)
    tf_b = jnp.where(live, 30.0, -1.0)

    print("-- I: packet sweep + bounce-like workloads (1080p tiles) --")
    f_ray = jax.jit(lambda oo, dd, tt: tv.intersect_closest(g, oo, dd, tt).t)
    ms = timeit(f_ray, o2, d2, t_b, reps=5) * 1e3
    print(f"  per-ray closest bounce1: {ms:8.1f} ms")
    f_any = jax.jit(lambda oo, dd, tt: tv.intersect_any(g, oo, dd, tt))
    ms = timeit(f_any, o2, d2, tf_b, reps=5) * 1e3
    print(f"  per-ray any     bounce1: {ms:8.1f} ms")

    for P, th, tw in ((16, 4, 4), (32, 4, 8), (64, 8, 8)):
        to_p = lambda c: pk.tile_to_packets(c.reshape(h, w), h, w, th, tw)
        o_p = o.map(to_p)
        d_p = d.map(to_p)
        t0_p = jnp.full(((h // th) * (w // tw), P), 1e30)
        f_pk = jax.jit(
            lambda oo, dd, tt: pk.packet_closest(g, oo, dd, tt)["t"])
        ms = timeit(f_pk, o_p, d_p, t0_p, reps=5) * 1e3
        print(f"  packet{P:3d} closest camera:  {ms:8.1f} ms")
        o2p, d2p = o2.map(to_p), d2.map(to_p)
        ms = timeit(f_pk, o2p, d2p, to_p(t_b), reps=5) * 1e3
        print(f"  packet{P:3d} closest bounce1: {ms:8.1f} ms")
        f_pa = jax.jit(lambda oo, dd, tt: pk.packet_any(g, oo, dd, tt))
        ms = timeit(f_pa, o2p, d2p, to_p(tf_b), reps=5) * 1e3
        print(f"  packet{P:3d} any     bounce1: {ms:8.1f} ms")


def part_j(sc):
    """Packet closest-walk anatomy (4x4 packets, 1080p camera rays):
    per-iteration cost at full width, iterations-to-drain profile, and a
    leaf-usefulness measure (how much denser the packet's leaf stream is
    than the per-ray walk's)."""
    from ptrt_tpu.render import packet as pk

    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    h, w = 1080, 1920
    th, tw = 4, 4
    P = th * tw
    npkt = (h // th) * (w // tw)
    o, d = _camera_rays(sc, h * w)
    to_p = lambda c: pk.tile_to_packets(c.reshape(h, w), h, w, th, tw)
    o_p, d_p = o.map(to_p), d.map(to_p)
    live = jnp.ones((npkt, P), bool)

    iota_d = jnp.arange(g.stack_depth, dtype=jnp.int32)
    (body, body_node), ivs = pk.make_closest_bodies(g, o_p, d_p, live,
                                                    iota_d)
    st = tv._init_walk_state(npkt, g.stack_depth, jnp.ones((npkt,), bool),
                             ordered=True)
    st.update(t=jnp.full((npkt, P), 1e30),
              best=jnp.full((npkt, P), -1, jnp.int32))
    st = pk._seed_packet_root(st, g, ivs[0], ivs[1], ivs[2],
                              jnp.full((npkt,), 1e30), ivs[3],
                              jnp.ones((npkt,), bool))

    step = jax.jit(lambda s: body((s, jnp.int32(0)))[0])
    stepn = jax.jit(lambda s: body_node((s, jnp.int32(0)))[0])
    count = jax.jit(lambda s: jnp.sum(tv._active(s).astype(jnp.int32)))
    leafw = jax.jit(lambda s: jnp.sum((s["mask_l"] != 0).astype(jnp.int32)))

    print(f"-- J: packet closest anatomy ({npkt} packets of {P}) --")
    t_full = timeit(step, st, reps=5)
    t_node = timeit(stepn, st, reps=5)
    print(f"  full-body iteration at full width: {t_full*1e3:8.2f} ms")
    print(f"  node-only iteration at full width: {t_node*1e3:8.2f} ms "
          f"(leaf path = {100*(1-t_node/t_full):.0f}%)")

    widths, leaves = [], []
    s = st
    for it in range(400):
        n = int(count(s))
        if n == 0:
            break
        widths.append(n)
        leaves.append(int(leafw(s)))
        s = step(s)
    widths = np.array(widths)
    lv = np.array(leaves)
    print(f"  iterations to drain: {len(widths)}")
    print(f"  sum(active)/npkt = {widths.sum()/npkt:.2f} per-packet iters")
    print(f"  leaf visits total: {lv.sum()} "
          f"({lv.sum()/npkt:.2f} per packet; per-ray MT rows tested: "
          f"{lv.sum()*P*8/1e6:.1f}M for {h*w/1e6:.1f}M rays)")
    print(f"  width head: {[round(wv/npkt,3) for wv in widths[:20]]}")
    # lock-step model: cost ~= sum over iterations of body(width)
    est = widths.sum() / npkt * t_full * 1e3
    print(f"  naive cost model (iters x full-body, perfectly compacted): "
          f"{est:.1f} ms")


def part_o(R=2_200_000, D=16):
    """Lane-padding microbench: the walk state carries (R, D) stacks and
    (R, 8) MT/slab intermediates — minor dims 8/16 use 8/16 of the VPU's
    128 lanes if Mosaic keeps the natural layout.  Compare against
    transposed (D, R)/(8, R) variants where the minor dim is the wavefront."""
    rng = np.random.default_rng(0)
    K = 8
    # build big device arrays FROM small host seeds (the axon tunnel moves
    # host->device bytes at ~MB/s; a (R, D) host upload alone takes minutes)
    seed = jnp.asarray(rng.integers(0, 1 << 26, 4096).astype(np.int32))
    mk = jax.jit(lambda n: jnp.tile(seed, -(-n // 4096))[:n],
                 static_argnums=0)
    sp0 = mk(R) % (D - 1)
    ent0 = mk(R)
    iota_d = jnp.arange(D, dtype=jnp.int32)
    st_rm = jax.jit(lambda: (mk(R)[:, None] + iota_d[None, :]))()
    st_cm = jax.jit(lambda: (mk(R)[None, :] + iota_d[:, None]))()

    def push_pop_rm(st, sp, ent):
        def body(k, carry):
            st, sp, ent = carry
            sel = iota_d[None, :] == sp[:, None]
            st = jnp.where(sel, ent[:, None], st)          # push write
            top = jnp.sum(jnp.where(sel, st, 0), axis=1)   # pop read
            ent = (ent ^ top) + k
            sp = (sp + ent) % (D - 1)
            return st, sp, ent
        return jax.lax.fori_loop(0, K, body, (st, sp, ent))[2]

    def push_pop_cm(st, sp, ent):
        def body(k, carry):
            st, sp, ent = carry
            sel = iota_d[:, None] == sp[None, :]
            st = jnp.where(sel, ent[None, :], st)
            top = jnp.sum(jnp.where(sel, st, 0), axis=0)
            ent = (ent ^ top) + k
            sp = (sp + ent) % (D - 1)
            return st, sp, ent
        return jax.lax.fori_loop(0, K, body, (st, sp, ent))[2]

    sub = os.environ.get("SUB", "sm")
    print(f"-- O: lane-padding microbench, R={R}, D={D}, chain K={K} --",
          flush=True)
    if "s" in sub:
        ms = timeit(jax.jit(push_pop_rm), st_rm, sp0, ent0, reps=3) * 1e3 / K
        print(f"  stack push+pop (R,D) row-major: {ms:7.2f} ms/iter",
              flush=True)
        ms = timeit(jax.jit(push_pop_cm), st_cm, sp0, ent0, reps=3) * 1e3 / K
        print(f"  stack push+pop (D,R) col-major: {ms:7.2f} ms/iter",
              flush=True)
    if "m" not in sub:
        return

    # dense MT, no gather: per-lane tri rows synthesized on device
    fseed = jnp.asarray(rng.normal(size=4096).astype(np.float32))
    mkf = jax.jit(lambda n: jnp.tile(fseed, -(-n // 4096))[:n],
                  static_argnums=0)
    o = Vec3(mkf(R), mkf(R) * 0.7 + 1.0, mkf(R) * 1.3 - 0.5)
    d = normalize(Vec3(mkf(R) + 0.1, mkf(R) * 0.5 - 0.2, mkf(R) * 0.9))
    tb = jnp.full((R,), 25.0)
    k8 = jnp.arange(8, dtype=jnp.float32)
    mk8 = jax.jit(lambda s: mkf(R)[:, None] * (1.0 + 0.1 * k8[None, :]) + s,
                  static_argnums=0)
    rows_rm = [Vec3(mk8(0.1 * i), mk8(0.2 * i + 0.05), mk8(0.3 * i - 0.02))
               for i in range(3)]
    rows_cm = [v.map(lambda c: c.T) for v in rows_rm]

    def mt_rm(o, d, v0, e1, e2):
        def body(k, acc):
            ok, t, _, _ = tv._mt_test(v0, e1, e2,
                                      o.map(lambda c: c[:, None]),
                                      d.map(lambda c: c[:, None]),
                                      tv.T_MIN, tb[:, None])
            tm = jnp.where(ok, t, jnp.inf)
            return acc + jnp.min(tm, axis=-1) + k
        return jax.lax.fori_loop(0, K, body, jnp.zeros((R,)))

    def mt_cm(o, d, v0, e1, e2):
        def body(k, acc):
            ok, t, _, _ = tv._mt_test(v0, e1, e2,
                                      o.map(lambda c: c[None, :]),
                                      d.map(lambda c: c[None, :]),
                                      tv.T_MIN, tb[None, :])
            tm = jnp.where(ok, t, jnp.inf)
            return acc + jnp.min(tm, axis=0) + k
        return jax.lax.fori_loop(0, K, body, jnp.zeros((R,)))

    ms = timeit(jax.jit(mt_rm), o, d, *rows_rm, reps=3) * 1e3 / K
    print(f"  dense MT x8 (R,8) row-major:    {ms:7.2f} ms/iter", flush=True)
    ms = timeit(jax.jit(mt_cm), o, d, *rows_cm, reps=3) * 1e3 / K
    print(f"  dense MT x8 (8,R) col-major:    {ms:7.2f} ms/iter", flush=True)


def part_n(sc):
    """Rebinned packet traversal for SCATTERED rays: sort diffuse-bounce
    rays by (direction octant, origin Morton cell), form P=16 packets in
    sorted order, run the hybrid packet walk, scatter back.  If sorted
    bins recover enough coherence, the dominant bounce-1..3 per-ray walks
    (81% of the frame, part L) inherit the packet win."""
    from ptrt_tpu.render import packet as pk

    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    h, w = 1080, 1920
    R = h * w
    o, d = _camera_rays(sc, R)
    hitp = tv.intersect_closest(g, o, d)
    rng = np.random.default_rng(2)
    rnd = normalize(Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32))
                           for _ in range(3)]))
    n = hitp.normal
    # Lambertian-ish bounce: normal + 0.9*random unit, renormalized
    dd = normalize(Vec3(n.x + 0.9 * rnd.x, n.y + 0.9 * rnd.y,
                        n.z + 0.9 * rnd.z))
    oo = Vec3(hitp.point.x + n.x * 1e-3, hitp.point.y + n.y * 1e-3,
              hitp.point.z + n.z * 1e-3)
    t0 = jnp.where(hitp.hit, 1e30, -1.0)
    live_frac = float(jnp.mean(hitp.hit))
    print(f"-- N: rebinned scattered-ray packets, {R} diffuse bounce rays "
          f"({live_frac:.2f} live) --")

    f_ray = jax.jit(lambda O, D, T: tv.intersect_closest(g, O, D, T).t)
    ms_ray = timeit(f_ray, oo, dd, t0, reps=5) * 1e3
    print(f"  per-ray closest:      {ms_ray:8.1f} ms")
    t_ref = np.asarray(f_ray(oo, dd, t0))

    def morton7(x, lo, inv):
        q = jnp.clip(((x - lo) * inv * 127.0).astype(jnp.int32), 0, 127)
        out = jnp.zeros_like(q)
        for b in range(7):
            out = out | (((q >> b) & 1) << (3 * b))
        return out

    def make_key(O, D, T):
        oct_ = tv._ray_octant(D)
        lo = Vec3(*[jnp.min(jnp.where(T > 0, c, jnp.inf))
                    for c in (O.x, O.y, O.z)])
        hi = Vec3(*[jnp.max(jnp.where(T > 0, c, -jnp.inf))
                    for c in (O.x, O.y, O.z)])
        inv = [1.0 / jnp.maximum(h_ - l_, 1e-6)
               for l_, h_ in ((lo.x, hi.x), (lo.y, hi.y), (lo.z, hi.z))]
        m = (morton7(O.x, lo.x, inv[0])
             | (morton7(O.y, lo.y, inv[1]) << 1)
             | (morton7(O.z, lo.z, inv[2]) << 2))
        # dead rays sort to the back (whole packets go dead -> skipped)
        key = (oct_ << 21) | m
        return jnp.where(T > 0, key, jnp.int32(0x7FFFFFF0))

    P = 16

    def rebinned(O, D, T, shrink):
        key = make_key(O, D, T)
        _, perm = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
        rows = jnp.stack([O.x, O.y, O.z, D.x, D.y, D.z, T,
                          jnp.zeros((R,), jnp.float32)], axis=1)
        srt = jnp.take(rows, perm, axis=0)  # ONE row gather
        Os = Vec3(srt[:, 0].reshape(-1, P), srt[:, 1].reshape(-1, P),
                  srt[:, 2].reshape(-1, P))
        Ds = Vec3(srt[:, 3].reshape(-1, P), srt[:, 4].reshape(-1, P),
                  srt[:, 5].reshape(-1, P))
        Ts = srt[:, 6].reshape(-1, P)
        s, unfin = pk.packet_closest_partial(g, Os, Ds, Ts, shrink=shrink)
        t_flat = s["t"].reshape(-1)
        # per-ray tail on rays of unfinished packets, t tightened
        t_restart = jnp.where(
            jnp.broadcast_to(unfin[:, None], Ts.shape).reshape(-1)
            & (Ts.reshape(-1) > 0), t_flat, -1.0)
        Of = Os.map(lambda c: c.reshape(-1))
        Df = Ds.map(lambda c: c.reshape(-1))
        s_ray = tv._walk_closest_raw(g, Of, Df, t_restart)
        closer = s_ray["best"] >= 0
        t_m = jnp.where(closer, s_ray["t"], t_flat)
        return jnp.zeros((R,), jnp.float32).at[perm].set(t_m)

    for shrink in (8, 16, 32):
        f_rb = jax.jit(lambda O, D, T, s=shrink: rebinned(O, D, T, s))
        ms_rb = timeit(f_rb, oo, dd, t0, reps=5) * 1e3
        got = np.asarray(f_rb(oo, dd, t0))
        a = np.where(t_ref > 1e29, 0, t_ref)
        b = np.where(got > 1e29, 0, got)
        bad = (np.abs(a - b) > 1e-3 * np.maximum(a, 1.0)).mean()
        print(f"  rebinned (shrink {shrink:3d}): {ms_rb:8.1f} ms "
              f"({ms_ray/ms_rb:4.1f}x)  mismatch {bad:.2e}")

    # overhead breakdown: sort+permute alone
    def just_perm(O, D, T):
        key = make_key(O, D, T)
        _, perm = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
        rows = jnp.stack([O.x, O.y, O.z, D.x, D.y, D.z, T,
                          jnp.zeros((R,), jnp.float32)], axis=1)
        return jnp.take(rows, perm, axis=0)
    ms_p = timeit(jax.jit(just_perm), oo, dd, t0, reps=5) * 1e3
    print(f"  (sort + row-permute overhead alone: {ms_p:6.1f} ms)")


def part_s(sc):
    """Rebinned packet ANY-hit for scattered-NEE shadow rays: bounce-hit
    origins all aim at the SAME light, so direction coherence is free and
    origin-Morton binning recovers spatial coherence — if the packet any
    walk (6.8x on pixel-tile shadow rays) survives rebinned packets, the
    per-bounce NEE any walk (~half the scattered-bounce cost, part L)
    inherits it."""
    from ptrt_tpu.render import packet as pk

    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    h, w = 1080, 1920
    R = h * w
    o, d = _camera_rays(sc, R)
    hitp = tv.intersect_closest(g, o, d)
    rng = np.random.default_rng(3)
    rnd = normalize(Vec3(*[jnp.asarray(rng.normal(size=R).astype(np.float32))
                           for _ in range(3)]))
    n = hitp.normal
    # one diffuse bounce first, so origins look like bounce-1 NEE sites
    dd = normalize(Vec3(n.x + 0.9 * rnd.x, n.y + 0.9 * rnd.y,
                        n.z + 0.9 * rnd.z))
    oo = Vec3(hitp.point.x + n.x * 1e-3, hitp.point.y + n.y * 1e-3,
              hitp.point.z + n.z * 1e-3)
    hit1 = tv.intersect_closest(g, oo, dd, jnp.where(hitp.hit, 1e30, -1.0),
                                scattered=True)
    live = hit1.hit
    p1 = hit1.point
    o2 = Vec3(p1.x + hit1.normal.x * 1e-3, p1.y + hit1.normal.y * 1e-3,
              p1.z + hit1.normal.z * 1e-3)
    lp = Vec3(jnp.float32(0.0), jnp.float32(6.5), jnp.float32(6.0))
    to_l = Vec3(lp.x - o2.x, lp.y - o2.y, lp.z - o2.z)
    dist = jnp.sqrt(jnp.maximum(to_l.dot(to_l), 1e-12))
    ds = Vec3(to_l.x / dist, to_l.y / dist, to_l.z / dist)
    tf = jnp.where(live, dist * 0.999, -1.0)
    print(f"-- S: rebinned packet any on bounce-1 NEE shadow rays, R={R}, "
          f"live={float(jnp.mean(live)):.2f} --")
    for name, scat in (("camera", False), ("ladder", True)):
        f = jax.jit(lambda O, D, T, s=scat: tv.intersect_any(g, O, D, T,
                                                             scattered=s))
        ms = timeit(f, o2, ds, tf, reps=5) * 1e3
        print(f"  per-ray any ({name}):  {ms:8.1f} ms", flush=True)
        if not scat:
            ref = np.asarray(f(o2, ds, tf))
            ms_ray = ms

    def morton7(x, lo, inv):
        q = jnp.clip(((x - lo) * inv * 127.0).astype(jnp.int32), 0, 127)
        out = jnp.zeros_like(q)
        for b in range(7):
            out = out | (((q >> b) & 1) << (3 * b))
        return out

    def make_key(O, D, T):
        oct_ = tv._ray_octant(D)
        lo = Vec3(*[jnp.min(jnp.where(T > 0, c, jnp.inf))
                    for c in (O.x, O.y, O.z)])
        hi = Vec3(*[jnp.max(jnp.where(T > 0, c, -jnp.inf))
                    for c in (O.x, O.y, O.z)])
        inv = [1.0 / jnp.maximum(h_ - l_, 1e-6)
               for l_, h_ in ((lo.x, hi.x), (lo.y, hi.y), (lo.z, hi.z))]
        m = (morton7(O.x, lo.x, inv[0])
             | (morton7(O.y, lo.y, inv[1]) << 1)
             | (morton7(O.z, lo.z, inv[2]) << 2))
        key = (oct_ << 21) | m
        return jnp.where(T > 0, key, jnp.int32(0x7FFFFFF0))

    for P in (16, 64):
        def rebinned(O, D, T, P=P):
            key = make_key(O, D, T)
            _, perm = jax.lax.sort_key_val(
                key, jnp.arange(R, dtype=jnp.int32))
            rows = jnp.stack([O.x, O.y, O.z, D.x, D.y, D.z, T,
                              jnp.zeros((R,), jnp.float32)], axis=1)
            srt = jnp.take(rows, perm, axis=0)
            Os = Vec3(srt[:, 0].reshape(-1, P), srt[:, 1].reshape(-1, P),
                      srt[:, 2].reshape(-1, P))
            Ds = Vec3(srt[:, 3].reshape(-1, P), srt[:, 4].reshape(-1, P),
                      srt[:, 5].reshape(-1, P))
            Ts = srt[:, 6].reshape(-1, P)
            hit_p, unfin = pk.packet_any_partial(g, Os, Ds, Ts, shrink=16)
            hit_f = hit_p.reshape(-1)
            un_rays = (jnp.broadcast_to(unfin[:, None], Ts.shape)
                       .reshape(-1) & (Ts.reshape(-1) > 0)
                       & jnp.logical_not(hit_f))
            t_tail = jnp.where(un_rays, Ts.reshape(-1), -1.0)
            tail = tv._any_state(g, Os.map(lambda c: c.reshape(-1)),
                                 Ds.map(lambda c: c.reshape(-1)), t_tail,
                                 scattered=True, skip_pass1=True)
            hit_m = hit_f | (tail & un_rays)
            return jnp.zeros((R,), bool).at[perm].set(hit_m)

        f_rb = jax.jit(rebinned)
        ms_rb = timeit(f_rb, o2, ds, tf, reps=5) * 1e3
        got = np.asarray(f_rb(o2, ds, tf))
        mism = (got != ref).mean()
        print(f"  rebinned P={P:3d}:      {ms_rb:8.1f} ms "
              f"({ms_ray/ms_rb:4.1f}x)  mismatch {mism:.2e}", flush=True)


def part_p(sc, R=None):
    """Walk utilization profile on SCATTERED (diffuse-bounce) rays: per
    iteration, what fraction of lanes has a pending leaf (the leaf
    gather+MT block — 3/4 of the body cost — is useful only for those)
    and a pending node.  If leaf occupancy is low, scheduling leaf work
    less often at higher occupancy is a direct multiplier."""
    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    h, w = 1080, 1920
    R = h * w if R is None else R
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
    live = hitp.hit
    print(f"-- P: scattered-walk utilization, R={R}, "
          f"live={float(jnp.mean(live)):.2f} --")

    iota_d = jnp.arange(g.stack_depth, dtype=jnp.int32)
    state = tv._init_walk_state(R, g.stack_depth, live, ordered=True)
    t0 = jnp.where(live, 1e30, -1.0)
    state.update(t=t0, best=jnp.full((R,), -1, jnp.int32))
    state = tv._seed_from_root(state, g, oo, dd, t0, tv._ray_octant(dd))
    body, _ = tv._make_closest_body(g, oo, dd, iota_d)

    step = jax.jit(lambda s: body((s, jnp.int32(0)))[0])
    stats = jax.jit(lambda s: (
        jnp.sum(tv._active(s).astype(jnp.int32)),
        jnp.sum((s["mask_l"] != 0).astype(jnp.int32)),
        jnp.sum((s["mask_i"] != 0).astype(jnp.int32)),
        jnp.sum(jax.lax.population_count(s["mask_l"])),
    ))

    act, lf, nd, lbits = [], [], [], []
    s = state
    for it in range(600):
        a, l, ni, lb = (int(x) for x in stats(s))
        if a == 0:
            break
        act.append(a); lf.append(l); nd.append(ni); lbits.append(lb)
        s = step(s)
    act = np.array(act); lf = np.array(lf); nd = np.array(nd)
    print(f"  iterations to drain (no compaction): {len(act)}")
    print(f"  sum(active)/R = {act.sum()/R:.2f}")
    print(f"  leaf-occupancy (mask_l!=0 of active): "
          f"overall {lf.sum()/act.sum():.3f}")
    print(f"  node-occupancy (mask_i!=0 of active): "
          f"overall {nd.sum()/act.sum():.3f}")
    print(f"  mean pending leaf bits per leaf-lane: "
          f"{np.array(lbits).sum()/max(lf.sum(),1):.2f}")
    for a, b in ((0, 5), (5, 10), (10, 20), (20, 40), (40, len(act))):
        if a >= len(act):
            break
        sl = slice(a, min(b, len(act)))
        print(f"  iters {a:>3}-{min(b,len(act)):>3}: act/R "
              f"{act[sl].mean()/R:.3f}  leaf-occ {lf[sl].sum()/act[sl].sum():.3f}"
              f"  node-occ {nd[sl].sum()/act[sl].sum():.3f}")


def part_q(sc):
    """Ladder-vs-camera compaction profile on REALISTIC bounce wavefronts
    (1080p primary hits, lambertian bounce, 0.61 live) + NEE-style any."""
    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    h, w = 1080, 1920
    R = h * w
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
    live = hitp.hit
    t0 = jnp.where(live, 1e30, -1.0)
    tny = jnp.where(live, 25.0, -1.0)
    print(f"-- Q: bounce-walk ladder vs camera profile, R={R}, "
          f"live={float(jnp.mean(live)):.2f} --")
    for name, scat in (("camera profile", False), ("ladder profile", True)):
        f = jax.jit(lambda O, D, T, s=scat: tv.intersect_closest(
            g, O, D, T, scattered=s).t)
        ms = timeit(f, oo, dd, t0, reps=5) * 1e3
        print(f"  closest {name}: {ms:8.1f} ms", flush=True)
    for name, scat in (("camera profile", False), ("ladder profile", True)):
        fa = jax.jit(lambda O, D, T, s=scat: tv.intersect_any(
            g, O, D, T, scattered=s))
        ms = timeit(fa, oo, dd, tny, reps=5) * 1e3
        print(f"  any     {name}: {ms:8.1f} ms", flush=True)


def part_m(sc):
    """Any-hit handoff sweep: pure packet vs packet-head + per-ray tail on
    1080p primary-hit shadow rays."""
    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    h, w = 1080, 1920
    o, d = _camera_rays(sc, h * w)
    # shadow rays from primary hits toward the first spot light
    hitp = tv.intersect_closest(g, o, d)
    lp = Vec3(jnp.float32(0.0), jnp.float32(6.5), jnp.float32(6.0))
    to_l = Vec3(lp.x - hitp.point.x, lp.y - hitp.point.y, lp.z - hitp.point.z)
    dist = jnp.sqrt(jnp.maximum(to_l.dot(to_l), 1e-12))
    d_s = Vec3(to_l.x / dist, to_l.y / dist, to_l.z / dist)
    o_s = Vec3(hitp.point.x + hitp.normal.x * 1e-3,
               hitp.point.y + hitp.normal.y * 1e-3,
               hitp.point.z + hitp.normal.z * 1e-3)
    tf = jnp.where(hitp.hit, dist * 0.999, -1.0)
    o2 = o_s.map(lambda c: c.reshape(h, w))
    d2 = d_s.map(lambda c: c.reshape(h, w))
    tf2 = tf.reshape(h, w)
    print(f"-- M: any-hit handoff sweep, {h}x{w} shadow rays "
          f"({float(jnp.mean(hitp.hit)):.2f} live frac) --")
    f_ray = jax.jit(lambda oo, dd, tt: tv.intersect_any(g, oo, dd, tt))
    ms_ray = timeit(f_ray, o_s, d_s, tf, reps=5) * 1e3
    print(f"  per-ray any:          {ms_ray:8.1f} ms")
    ref = np.asarray(f_ray(o_s, d_s, tf)).reshape(h, w)
    for shrink in (0, 8, 16, 32):
        tv._PKA_HANDOFF_SHRINK = shrink
        f_hy = jax.jit(lambda oo, dd, tt, s=shrink: tv.intersect_any(
            g, oo, dd, tt, coherent=True))
        ms_hy = timeit(f_hy, o2, d2, tf2, reps=5) * 1e3
        got = np.asarray(f_hy(o2, d2, tf2))
        mism = (got != ref).mean()
        label = "pure packet " if shrink == 0 else f"handoff {shrink:3d}"
        print(f"  {label}:          {ms_hy:8.1f} ms  ({ms_ray/ms_hy:4.1f}x) "
              f"mismatch {mism:.2e}")


def part_l(sc):
    """In-situ frame decomposition: time the REAL _trace_only program at a
    ladder of (spp, depth, n_lights) configs; successive diffs attribute
    frame time to camera walk / NEE / scattered bounces / spp scaling."""
    import jax.numpy as jnp
    from ptrt_tpu.scene.pt_scene import _trace_only

    rh, rw = sc.render_size
    sc._ensure_device_state()
    print(f"-- L: in-situ frame ladder, {rw}x{rh} --")
    prev = None
    for label, spp, depth, nl in (
            ("d1 no-NEE (camera+shade)", 1, 1, 0),
            ("d1 +NEE (camera shadow)", 1, 1, len(sc.lights)),
            ("d2 (+1 scattered bounce)", 1, 2, len(sc.lights)),
            ("d4 (full depth)", 1, 4, len(sc.lights)),
            ("d4 spp4 (bench config)", 4, 4, len(sc.lights))):
        fn = _trace_only(rw, rh, spp, depth, nl, sc._use_brute(),
                         sc.env_map is not None)
        args = (sc._geom, sc._mat_table, sc._light_table, sc._sky(),
                sc.camera, sc._rng_state, jnp.int32(1), sc._blue_noise)
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        comp = time.time() - t0
        ms = timeit(lambda: fn(*args), reps=3) * 1e3
        d = "" if prev is None else f"  (+{ms - prev:7.1f})"
        rays = float(out[1].rays_traced)
        print(f"  {label:28s} {ms:8.1f} ms{d}  compile {comp:5.1f}s "
              f"rays {rays/1e6:5.1f}M")
        prev = ms


def part_k(sc):
    """Hybrid closest (packet head + per-ray tail handoff) vs pure packet
    vs per-ray, 1080p camera rays, with an exactness check."""
    from ptrt_tpu.render import packet as pk

    geom = sc._geom
    g = geom.static if hasattr(geom, "static") else geom
    h, w = 1080, 1920
    o, d = _camera_rays(sc, h * w)
    o2 = o.map(lambda c: c.reshape(h, w))
    d2 = d.map(lambda c: c.reshape(h, w))
    npkt = (h // 8) * (w // 8)

    def to_pk(c):
        return pk.tile_to_packets(c.reshape(h, w), h, w)

    o_p, d_p = o.map(to_pk), d.map(to_pk)
    t0_p = jnp.full((npkt, 64), 1e30)

    print(f"-- K: hybrid closest handoff, {h}x{w} camera rays --")
    f_ray = jax.jit(lambda oo, dd: tv.intersect_closest(g, oo, dd).t)
    ms_ray = timeit(f_ray, o, d, reps=5) * 1e3
    print(f"  per-ray closest:        {ms_ray:8.1f} ms")
    f_pk = jax.jit(lambda oo, dd: pk.packet_closest(g, oo, dd, t0_p)["t"])
    ms_pk = timeit(f_pk, o_p, d_p, reps=5) * 1e3
    print(f"  pure-packet closest:    {ms_pk:8.1f} ms")
    for shrink in (4, 8, 16, 32):
        tv._PKC_HANDOFF_SHRINK = shrink
        f_hy = jax.jit(lambda oo, dd, s=shrink:
                       tv.intersect_closest(g, oo, dd, coherent=True).t)
        ms_hy = timeit(f_hy, o2, d2, reps=5) * 1e3
        print(f"  hybrid (shrink {shrink:3d}):    {ms_hy:8.1f} ms "
              f"({h*w/ms_hy/1e3:6.1f} Mrays/s, {ms_ray/ms_hy:4.1f}x per-ray)")
        if shrink == 8:
            t_hy = np.asarray(f_hy(o2, d2))
            t_ray = np.asarray(f_ray(o, d)).reshape(h, w)
            a = np.where(t_ray > 1e29, 0, t_ray)
            b = np.where(t_hy > 1e29, 0, t_hy)
            bad = np.abs(a - b) > 1e-3 * np.maximum(a, 1.0)
            print(f"    t mismatch frac: {bad.mean():.2e}")



def part_f(R=2_200_000):
    """One-hot MXU 'gather' vs jnp.take for SMALL tables (top tree levels).

    Gather issue rate is ~5.5 ns/index regardless of table size below
    30 MB; if a (R,N) one-hot bf16 matmul fetches the same rows faster for
    N <= a few hundred, the top-of-tree node fetches can ride the MXU.
    Chained consumer as in part A so XLA cannot factor the fetch."""
    K = 4
    rng = np.random.default_rng(0)
    lane = jnp.asarray(rng.normal(size=(R,)).astype(np.float32))
    print(f"-- F: one-hot MXU fetch vs gather, {R} lanes, chain K={K} --")

    def consume(row, i, rows):
        lo = jnp.min(jnp.maximum(row[:, 0:8], lane[:, None]), axis=1)
        hi = jnp.max(jnp.minimum(row[:, 8:16], lane[:, None]), axis=1)
        m = (lo <= hi).astype(jnp.int32)
        return (i * 1664525 + 1013904223 + m) % rows, lo - hi

    def chain_take(i0, t, rows):
        def body(k, carry):
            i, acc = carry
            row = jnp.take(t, i, axis=0)
            i2, dv = consume(row, i, rows)
            return (i2, acc + dv)
        _, acc = jax.lax.fori_loop(0, K, body, (i0, jnp.zeros((R,))))
        return acc

    def chain_onehot(i0, t, rows):
        tb = t.astype(jnp.bfloat16)
        col = jnp.arange(rows, dtype=jnp.int32)[None, :]

        def body(k, carry):
            i, acc = carry
            oh = (i[:, None] == col).astype(jnp.bfloat16)
            row = jax.lax.dot_general(
                oh, tb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            i2, dv = consume(row, i, rows)
            return (i2, acc + dv)
        _, acc = jax.lax.fori_loop(0, K, body, (i0, jnp.zeros((R,))))
        return acc

    for rows in (128, 256, 512, 1024, 4096):
        tbl = jnp.asarray(rng.normal(size=(rows, 64)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, rows, R).astype(np.int32))
        ms_t = timeit(jax.jit(lambda i, t, n=rows: chain_take(i, t, n)),
                      idx, tbl) * 1e3 / K
        ms_o = timeit(jax.jit(lambda i, t, n=rows: chain_onehot(i, t, n)),
                      idx, tbl) * 1e3 / K
        print(f"  N={rows:5d}: take {ms_t:7.2f} ms  onehot {ms_o:7.2f} ms "
              f" ({ms_t/ms_o:4.1f}x)")


if __name__ == "__main__":
    _main()
