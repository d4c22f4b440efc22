"""Packet (ray-tile) BVH traversal: ONE tree walk per tile of coherent rays.

TPU-measured reality (TODO.md, tools/prof_r3.py): the per-ray lock-step walk
is bound by per-INDEX gather cost (~5.5 ns/row regardless of row width), so
at 2.2M lanes every walk iteration pays ~12 ms of node+leaf row gathers.
Rays from the same pixel tile traverse nearly the same nodes — a packet
walk amortizes each gathered row across P rays:

* the walk state machine (mask-stack, octant-ordered near-first descent,
  pop/push, compaction) is the per-ray machine from ``render/traverse.py``
  run at PACKET granularity: lanes = packets (R/P of them), so the gathers
  shrink by P;
* node slab tests become conservative INTERVAL tests over the packet's
  origin/inv-direction bounds (axes whose direction sign is mixed within
  the packet accept everything on that axis) — a packet visits the union
  of what its rays would visit, never less, so results stay exact;
* leaf visits test ALL P rays against the gathered triangle block densely
  ((npkt, P, 8) elementwise Möller-Trumbore — VPU work, no gathers), each
  ray bounded by its own current best t;
* the packet's node-pruning bound is the max best-t over its live rays.

This is the TPU analog of classic SIMD packet tracing (Wald et al.), which
the CUDA reference does not need (its per-thread walks hit L2 for shared
nodes, ``intersection.cuh:300-435``); on TPU the cache is the packet.

Exactness: interval slab tests are conservative (can only ADD node visits)
and the per-ray MT bound is the ray's own t, so ``packet_closest`` /
``packet_any`` return bit-identical hits to the per-ray walk modulo
closest-t ties (same argument as compaction reordering).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3
from ptrt_tpu.geometry.bvh import LEAF_SIZE
from ptrt_tpu.geometry.scene_geom import SceneGeometry
from ptrt_tpu.render.traverse import (
    _active,
    _compact_finish,
    _fetch_leaf,
    _fetch_node8,
    _hitmask8,
    _i32,
    _init_walk_state,
    _lsb_slot,
    _mt_test,
    _pop_cur,
    _rank_to_slot,
    _run_walk,
    _safe_inv,
    _slotmask_to_rankmask,
    T_MIN,
    MIN_COMPACT_LANES,
    COMPACT_SHRINK,
    COMPACT_STAGES,
    ANY_COMPACT_SHRINK,
    ANY_COMPACT_STAGES,
)

# default rays per packet: an 8x8 pixel tile
PACKET_SIZE = 64


def tile_to_packets(a: jnp.ndarray, h: int, w: int, th: int = 8,
                    tw: int = 8) -> jnp.ndarray:
    """(..., h, w) -> (..., n_tiles, th*tw) pixel-tile packets.  h, w must
    be multiples of th, tw (the pipeline pads render sizes to tiles)."""
    lead = a.shape[:-2]
    a = a.reshape(lead + (h // th, th, w // tw, tw))
    a = jnp.swapaxes(a, -3, -2)  # (..., h/th, w/tw, th, tw)
    return a.reshape(lead + ((h // th) * (w // tw), th * tw))


def packets_to_tile(a: jnp.ndarray, h: int, w: int, th: int = 8,
                    tw: int = 8) -> jnp.ndarray:
    lead = a.shape[:-2]
    a = a.reshape(lead + (h // th, w // tw, th, tw))
    a = jnp.swapaxes(a, -3, -2)
    return a.reshape(lead + (h, w))


def _packet_intervals(o: Vec3, d: Vec3, live):
    """Per-packet conservative bounds: origin interval, inv-direction
    interval, per-axis mixed-sign flag, representative octant.  ``live``
    (npkt, P) excludes dead rays from the bounds (a packet with no live
    rays gets degenerate bounds; its walk seed is masked off anyway)."""
    inv = _safe_inv(d)
    big = jnp.float32(3e38)

    def lo(c):
        return jnp.min(jnp.where(live, c, big), axis=1)

    def hi(c):
        return jnp.max(jnp.where(live, c, -big), axis=1)

    o_lo = Vec3(lo(o.x), lo(o.y), lo(o.z))
    o_hi = Vec3(hi(o.x), hi(o.y), hi(o.z))
    i_lo = Vec3(lo(inv.x), lo(inv.y), lo(inv.z))
    i_hi = Vec3(hi(inv.x), hi(inv.y), hi(inv.z))
    # mixed sign on an axis -> the inv interval spans +/-inf; that axis's
    # slab contribution must accept everything
    mixed = tuple((getattr(i_lo, ax) < 0.0) & (getattr(i_hi, ax) > 0.0)
                  for ax in ("x", "y", "z"))
    # representative octant from the live-ray mean direction (ordering
    # heuristic only; correctness does not depend on it)
    mean = Vec3(hi(d.x) + lo(d.x), hi(d.y) + lo(d.y), hi(d.z) + lo(d.z))
    octant = ((mean.x < 0.0).astype(jnp.int32)
              | ((mean.y < 0.0).astype(jnp.int32) << 1)
              | ((mean.z < 0.0).astype(jnp.int32) << 2))
    return (o_lo, o_hi), (i_lo, i_hi), mixed, octant


def _islab8(bmin8, bmax8, o_iv, i_iv, mixed, t_bound):
    """Conservative packet-interval slab test of 8 child AABBs.

    Per axis the per-ray entry min((bmin-o)i, (bmax-o)i) is lower-bounded
    and the exit upper-bounded by interval arithmetic (4 corner products);
    a node passes if the bounded entry <= bounded exit and <= the packet's
    t bound.  Any ray's true hit implies the packet test passes."""
    (o_lo, o_hi), (i_lo, i_hi) = o_iv, i_iv
    olo = (o_lo.x[:, None], o_lo.y[:, None], o_lo.z[:, None])
    ohi = (o_hi.x[:, None], o_hi.y[:, None], o_hi.z[:, None])
    ilo = (i_lo.x[:, None], i_lo.y[:, None], i_lo.z[:, None])
    ihi = (i_hi.x[:, None], i_hi.y[:, None], i_hi.z[:, None])
    inf = jnp.float32(3e38)

    shape = jnp.broadcast_shapes(bmin8[0].shape, (t_bound.shape[0], 1))
    t_enter = jnp.zeros(shape, jnp.float32)
    t_exit = jnp.broadcast_to(t_bound[:, None], shape)
    for a in range(3):
        # interval of (b - o) for both slab planes
        b0_lo, b0_hi = bmin8[a] - ohi[a], bmin8[a] - olo[a]
        b1_lo, b1_hi = bmax8[a] - ohi[a], bmax8[a] - olo[a]
        # interval product corners with [ilo, ihi]
        p = (b0_lo * ilo[a], b0_lo * ihi[a], b0_hi * ilo[a], b0_hi * ihi[a])
        q = (b1_lo * ilo[a], b1_lo * ihi[a], b1_hi * ilo[a], b1_hi * ihi[a])
        lo0 = jnp.minimum(jnp.minimum(p[0], p[1]), jnp.minimum(p[2], p[3]))
        hi0 = jnp.maximum(jnp.maximum(p[0], p[1]), jnp.maximum(p[2], p[3]))
        lo1 = jnp.minimum(jnp.minimum(q[0], q[1]), jnp.minimum(q[2], q[3]))
        hi1 = jnp.maximum(jnp.maximum(q[0], q[1]), jnp.maximum(q[2], q[3]))
        entry_lo = jnp.minimum(lo0, lo1)
        exit_hi = jnp.maximum(hi0, hi1)
        mx = mixed[a][:, None]
        t_enter = jnp.maximum(t_enter, jnp.where(mx, -inf, entry_lo))
        t_exit = jnp.minimum(t_exit, jnp.where(mx, inf, exit_hi))
    return t_enter <= t_exit


def _descend_packet(st, geom, o_iv, i_iv, mixed, t_bound, iota_d, octant):
    """Packet node action: identical stack machinery to ``_descend`` but
    with the interval slab test and a per-packet t bound."""
    base_i, mask_i = st["base_i"], st["mask_i"]
    mask_l, base_l = st["mask_l"], st["base_l"]
    sp = st["sp"]
    has_int = mask_i != 0
    slot_i = _rank_to_slot(_lsb_slot(mask_i), st["ord_i"])
    naddr = jnp.clip(base_i + slot_i, 0, geom.num_nodes - 1)
    bmin8, bmax8, cba, lb, row_lmask, row_imask, ordpack = _fetch_node8(
        geom, naddr, octant)
    hitm = _hitmask8(_islab8(bmin8, bmax8, o_iv, i_iv, mixed, t_bound))
    new_l = hitm & row_lmask
    new_i = _slotmask_to_rankmask(hitm & row_imask, ordpack)
    mask_i = mask_i & (mask_i - 1)
    take_new = has_int & ((new_l | new_i) != 0)
    do_push = take_new & ((mask_i | mask_l) != 0)
    ent_a = ((base_i + 8) << 8) | mask_i
    ent_b = (base_l << 8) | mask_l
    sel = (iota_d[None, :] == sp[:, None]) & do_push[:, None]
    return dict(
        st,
        stack_a=jnp.where(sel, ent_a[:, None], st["stack_a"]),
        stack_b=jnp.where(sel, ent_b[:, None], st["stack_b"]),
        stack_o=jnp.where(sel, st["ord_i"][:, None], st["stack_o"]),
        sp=jnp.where(do_push, sp + 1, sp),
        base_i=jnp.where(take_new, cba, base_i),
        mask_i=jnp.where(take_new, new_i, mask_i),
        base_l=jnp.where(take_new, lb, base_l),
        mask_l=jnp.where(take_new, new_l, mask_l),
        ord_i=jnp.where(take_new, ordpack, st["ord_i"]),
    )


def _seed_packet_root(st, geom, o_iv, i_iv, mixed, t_bound, octant, any_live):
    """Dense root visit (packet version of ``_seed_from_root``)."""
    row = geom.node_rows[0]
    bmin8 = tuple(row[k:k + 8][None, :] for k in (0, 8, 16))
    bmax8 = tuple(row[k:k + 8][None, :] for k in (24, 32, 40))
    meta = _i32(row[48:52])
    cba, lb, lmask, imask = meta[0], meta[1], meta[2], meta[3]
    hitm = _hitmask8(_islab8(bmin8, bmax8, o_iv, i_iv, mixed,
                             jnp.where(any_live, t_bound, 0.0)))
    hitm = jnp.where(any_live, hitm, 0)
    ordcols = _i32(row[52:60])
    ordpack = jnp.zeros_like(hitm)
    for oc in range(8):
        ordpack = jnp.where(octant == oc, ordcols[oc], ordpack)
    return dict(st,
                base_i=jnp.full_like(st["base_i"], cba),
                base_l=jnp.full_like(st["base_l"], lb),
                mask_l=hitm & lmask,
                mask_i=_slotmask_to_rankmask(hitm & imask, ordpack),
                ord_i=ordpack)


def make_closest_bodies(geom: SceneGeometry, o_s: Vec3, d_s: Vec3, live_s,
                        iota_d):
    """Closest-walk (body, body_node) over packeted rays + the packet
    intervals; exposed for the compaction restart and the profiler."""
    o_iv, i_iv, mixed, octant = _packet_intervals(o_s, d_s, live_s)
    oe = o_s.map(lambda c: c[:, :, None])
    de = d_s.map(lambda c: c[:, :, None])

    def t_bound(st):
        # packet node-pruning bound: worst live ray's best t
        return jnp.max(jnp.where(live_s, st["t"], -1.0), axis=1)

    def leaf_action(st):
        has_leaf = st["mask_l"] != 0
        blk = jnp.clip(st["base_l"] + _lsb_slot(st["mask_l"]), 0,
                       geom.num_tri_blocks - 1)
        v0, e1, e2, mesh_id, _ = _fetch_leaf(geom, blk)  # (npkt, 8)
        mid = lambda a: a[:, None, :]  # (npkt, 1, 8)
        ok, t, _, _ = _mt_test(v0.map(mid), e1.map(mid), e2.map(mid),
                               oe, de, T_MIN, st["t"][:, :, None])
        ok = ok & has_leaf[:, None, None] & (mesh_id[:, None, :] >= 0)
        tm = jnp.where(ok, t, jnp.inf)
        tbest = jnp.min(tm, axis=-1)  # (npkt, P)
        found = tbest < st["t"]
        slot = jnp.argmin(tm, axis=-1).astype(jnp.int32)
        return dict(
            st,
            mask_l=st["mask_l"] & (st["mask_l"] - 1),
            t=jnp.where(found, tbest, st["t"]),
            best=jnp.where(found, blk[:, None] * LEAF_SIZE + slot,
                           st["best"]),
        )

    def body(s):
        st, k = s
        st = _pop_cur(st, iota_d)
        st = leaf_action(st)
        st = _descend_packet(st, geom, o_iv, i_iv, mixed, t_bound(st),
                             iota_d, octant)
        return st, k + 1

    def body_node(s):
        st, k = s
        st = _pop_cur(st, iota_d)
        st = _descend_packet(st, geom, o_iv, i_iv, mixed, t_bound(st),
                             iota_d, octant)
        return st, k + 1

    return (body, body_node), (o_iv, i_iv, mixed, octant)


def packet_closest_partial(geom: SceneGeometry, o: Vec3, d: Vec3, t0,
                           shrink=None):
    """HEAD of the packet closest walk: seed + walk only until the
    unfinished packets fit a 1/shrink tail buffer, then STOP.

    Returns ``({t, best}, packet_unfinished)``.  The caller hands the
    unfinished packets' rays to the per-ray walk, restarted from scratch
    with ``t_max`` = the packet phase's current best t — exact, because
    the per-ray walk re-discovers anything closer than what the packet
    phase already found.  Rationale (tools/prof_r3.py part J): the mean
    packet needs ~3.7 iterations but the worst needs 400+ (conservative
    interval tests blow up on silhouette/horizon packets); the per-ray
    machine with its own compaction drains that tail ~5x cheaper than
    packet-granularity compaction does."""
    npkt, P = jnp.shape(t0)
    depth = geom.stack_depth
    iota_d = jnp.arange(depth, dtype=jnp.int32)
    live = t0 > 0.0
    any_live = jnp.any(live, axis=1)

    state = _init_walk_state(npkt, depth, any_live, ordered=True, cm=False)
    state.update(t=jnp.where(live, t0, -1.0),
                 best=jnp.full((npkt, P), -1, jnp.int32))
    (body, body_node), ivs = make_closest_bodies(geom, o, d, live, iota_d)
    state = _seed_packet_root(state, geom, ivs[0], ivs[1], ivs[2],
                              jnp.max(jnp.where(live, t0, -1.0), axis=1),
                              ivs[3], any_live)
    s = _run_walk(body, state, False,
                  shrink=COMPACT_SHRINK if shrink is None else shrink,
                  body_node=body_node)
    unfinished = _active(s)
    return ({"t": jnp.where(live, s["t"], t0), "best": s["best"]},
            unfinished)


def packet_closest(geom: SceneGeometry, o: Vec3, d: Vec3, t0) -> dict:
    """Closest-hit walk over (npkt, P) packeted rays; rays with t0 <= 0 are
    dead.  Returns {t, best} shaped (npkt, P) (same contract as
    ``traverse._walk_closest_raw``)."""
    npkt, P = jnp.shape(t0)
    depth = geom.stack_depth
    iota_d = jnp.arange(depth, dtype=jnp.int32)
    live = t0 > 0.0
    any_live = jnp.any(live, axis=1)

    state = _init_walk_state(npkt, depth, any_live, ordered=True, cm=False)
    state.update(t=jnp.where(live, t0, -1.0),
                 best=jnp.full((npkt, P), -1, jnp.int32))

    def make_bodies(o_s, d_s, live_s):
        return make_closest_bodies(geom, o_s, d_s, live_s, iota_d)

    (body, body_node), ivs = make_bodies(o, d, live)
    state = _seed_packet_root(state, geom, ivs[0], ivs[1], ivs[2],
                              jnp.max(jnp.where(live, t0, -1.0), axis=1),
                              ivs[3], any_live)

    def loop_fac(st, o_s, d_s, live_s, to_completion):
        (b, bn), _ = make_bodies(o_s, d_s, live_s)
        return _run_walk(b, st, to_completion, shrink=COMPACT_SHRINK,
                         body_node=bn)

    if npkt < MIN_COMPACT_LANES:
        s = _run_walk(body, state, True, body_node=body_node)
    else:
        s = _run_walk(body, state, False, shrink=COMPACT_SHRINK,
                      body_node=body_node)
        s = _compact_finish(loop_fac, s, o, d, extras=(live,),
                            stages=COMPACT_STAGES,
                            result_keys=("t", "best"),
                            shrink=COMPACT_SHRINK)
    return {"t": jnp.where(live, s["t"], t0), "best": s["best"]}


def _make_any_bodies(geom: SceneGeometry, o_s: Vec3, d_s: Vec3, t_s, live_s,
                     iota_d):
    """Any-hit walk (body, body_node) over packeted rays (shared by
    ``packet_any`` and ``packet_any_partial``)."""
    o_iv, i_iv, mixed, octant = _packet_intervals(o_s, d_s, live_s)
    oe = o_s.map(lambda c: c[:, :, None])
    de = d_s.map(lambda c: c[:, :, None])
    t_pkt = jnp.max(jnp.where(live_s, t_s, -1.0), axis=1)

    def leaf_action(st):
        has_leaf = st["mask_l"] != 0
        blk = jnp.clip(st["base_l"] + _lsb_slot(st["mask_l"]), 0,
                       geom.num_tri_blocks - 1)
        v0, e1, e2, mesh_id, opaque = _fetch_leaf(geom, blk)
        mid = lambda a: a[:, None, :]
        ok, _, _, _ = _mt_test(v0.map(mid), e1.map(mid), e2.map(mid),
                               oe, de, T_MIN, t_s[:, :, None])
        ok = ok & opaque[:, None, :] & (mesh_id[:, None, :] >= 0)
        hit = st["hit"] | (jnp.any(ok, axis=-1)
                           & has_leaf[:, None] & live_s)
        return dict(st, mask_l=st["mask_l"] & (st["mask_l"] - 1),
                    hit=hit)

    def early_out(st):
        # all live rays occluded -> drop the packet's remaining work
        done = jnp.all(st["hit"] | jnp.logical_not(live_s), axis=1)
        return dict(
            st,
            mask_i=jnp.where(done, 0, st["mask_i"]),
            mask_l=jnp.where(done, 0, st["mask_l"]),
            sp=jnp.where(done, 0, st["sp"]),
        )

    def body(s):
        st, k = s
        st = _pop_cur(st, iota_d)
        st = leaf_action(st)
        st = _descend_packet(st, geom, o_iv, i_iv, mixed, t_pkt,
                             iota_d, octant)
        return early_out(st), k + 1

    def body_node(s):
        st, k = s
        st = _pop_cur(st, iota_d)
        st = _descend_packet(st, geom, o_iv, i_iv, mixed, t_pkt,
                             iota_d, octant)
        return early_out(st), k + 1

    return (body, body_node), (o_iv, i_iv, mixed, octant, t_pkt)


def packet_any_partial(geom: SceneGeometry, o: Vec3, d: Vec3, t_f,
                       shrink=None):
    """HEAD of the packet any-hit walk (see ``packet_closest_partial``):
    stop once unfinished packets fit a 1/shrink tail buffer.  Returns
    ``(hit, packet_unfinished)``; the caller re-runs the unfinished
    packets' not-yet-occluded rays through the per-ray any walk (exact:
    hits already found stand, the per-ray walk decides the rest)."""
    npkt, P = jnp.shape(t_f)
    depth = geom.stack_depth
    iota_d = jnp.arange(depth, dtype=jnp.int32)
    live = t_f > 0.0
    any_live = jnp.any(live, axis=1)

    state = _init_walk_state(npkt, depth, any_live, ordered=True, cm=False)
    state.update(hit=jnp.zeros((npkt, P), bool))
    (body, body_node), ivs = _make_any_bodies(geom, o, d, t_f, live, iota_d)
    state = _seed_packet_root(state, geom, ivs[0], ivs[1], ivs[2], ivs[4],
                              ivs[3], any_live)
    s = _run_walk(body, state, False,
                  shrink=ANY_COMPACT_SHRINK if shrink is None else shrink,
                  body_node=body_node)
    return s["hit"] & live, _active(s)


def packet_any(geom: SceneGeometry, o: Vec3, d: Vec3, t_f) -> jnp.ndarray:
    """Any-hit walk over (npkt, P) packeted rays -> hit (npkt, P) bool.
    A packet early-outs once every live ray is occluded."""
    npkt, P = jnp.shape(t_f)
    depth = geom.stack_depth
    iota_d = jnp.arange(depth, dtype=jnp.int32)
    live = t_f > 0.0
    any_live = jnp.any(live, axis=1)

    state = _init_walk_state(npkt, depth, any_live, ordered=True, cm=False)
    state.update(hit=jnp.zeros((npkt, P), bool))

    def make_bodies(o_s, d_s, t_s, live_s):
        return _make_any_bodies(geom, o_s, d_s, t_s, live_s, iota_d)

    (body, body_node), ivs = make_bodies(o, d, t_f, live)
    state = _seed_packet_root(state, geom, ivs[0], ivs[1], ivs[2], ivs[4],
                              ivs[3], any_live)

    def loop_fac(st, o_s, d_s, t_s, live_s, to_completion):
        (b, bn), _ = make_bodies(o_s, d_s, t_s, live_s)
        return _run_walk(b, st, to_completion, shrink=ANY_COMPACT_SHRINK,
                         body_node=bn)

    if npkt < MIN_COMPACT_LANES:
        s = _run_walk(body, state, True, body_node=body_node)
    else:
        s = _run_walk(body, state, False, shrink=ANY_COMPACT_SHRINK,
                      body_node=body_node)
        s = _compact_finish(loop_fac, s, o, d, extras=(t_f, live),
                            stages=ANY_COMPACT_STAGES, result_keys=("hit",),
                            shrink=ANY_COMPACT_SHRINK)
    return s["hit"] & live
