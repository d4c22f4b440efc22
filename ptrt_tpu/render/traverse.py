"""Lock-step BVH traversal + Möller–Trumbore intersection over ray wavefronts.

TPU-native replacement for the reference's per-thread stack walks
(``intersection.cuh:300-435`` BLAS, ``:526-605`` TLAS, ``:481-524`` any-hit).
Every ray holds one node pointer into the skip-pointer BVH
(geometry/bvh.py); all rays advance together inside one ``lax.while_loop``;
interior hits descend to ``i+1``, misses and leaves jump to ``skip[i]``.

Measured TPU reality shapes the memory layout: a gather of R indices costs
the same whether each row is 1 float or ~100 floats (per-index cost, see
SURVEY perf notes), so each iteration issues exactly TWO gathers — one
packed node row (bounds + links) and one packed leaf block (8 triangles,
MT-ready) — and the 8-wide triangle test is unrolled elementwise VPU work.
Hit attributes (normal, mesh id, barycentrics) are carried through the loop,
so no post-traversal gathers are needed.

A gather-free brute-force path (tiled over triangle chunks) is provided for
small scenes, where dense elementwise work beats any gather.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ptrt_tpu.core.vec import Vec3, cross, where
from ptrt_tpu.geometry.bvh import LEAF_SIZE
from ptrt_tpu.geometry.scene_geom import SceneGeometry

T_MIN = 1e-4  # reference ray epsilon (intersection.cuh uses 1e-4 offsets)
T_MAX = 1e30
_MT_EPS = 1e-9


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Hit:
    """SoA ``HitInfo`` (``intersection.cuh:108-132``)."""

    hit: jnp.ndarray  # bool
    t: jnp.ndarray
    point: Vec3
    normal: Vec3  # face-forwarded geometric normal
    front_face: jnp.ndarray  # bool
    mesh_index: jnp.ndarray  # int32 (object/material id)
    u: jnp.ndarray
    v: jnp.ndarray

    def tree_flatten(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _mt_test(v0: Vec3, e1: Vec3, e2: Vec3, o: Vec3, d: Vec3, t_min, t_max):
    """Möller–Trumbore with precomputed edges (``triangle.cuh:59-90``,
    ``intersection.cuh:219-255``); two-sided (no backface cull, the path
    tracer shades interiors)."""
    h = cross(d, e2)
    a = e1.dot(h)
    valid = jnp.abs(a) > _MT_EPS
    f = 1.0 / jnp.where(valid, a, 1.0)
    s = o - v0
    u = f * s.dot(h)
    q = cross(s, e1)
    v = f * d.dot(q)
    t = f * e2.dot(q)
    # small inclusive barycentric epsilon: adjacent triangles overlap by a
    # hair instead of leaving edge gaps (the reference's exclusive bounds
    # produce dotted cracks along quad diagonals; closest-t resolves the
    # overlap, so this stays exact in practice)
    beps = 1e-6
    ok = (
        valid
        & (u >= -beps)
        & (u <= 1.0 + beps)
        & (v >= -beps)
        & (u + v <= 1.0 + beps)
        & (t > t_min)
        & (t < t_max)
    )
    return ok, t, u, v


def _slab_test(bmin: Vec3, bmax: Vec3, o: Vec3, inv_d: Vec3, t_max):
    """Robust slab AABB test (``intersection.cuh:136-216``)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tlo = Vec3(jnp.minimum(t0.x, t1.x), jnp.minimum(t0.y, t1.y),
               jnp.minimum(t0.z, t1.z))
    thi = Vec3(jnp.maximum(t0.x, t1.x), jnp.maximum(t0.y, t1.y),
               jnp.maximum(t0.z, t1.z))
    t_enter = jnp.maximum(jnp.maximum(tlo.x, tlo.y), jnp.maximum(tlo.z, 0.0))
    t_exit = jnp.minimum(jnp.minimum(thi.x, thi.y), jnp.minimum(thi.z, t_max))
    return t_enter <= t_exit


def _safe_inv(d: Vec3) -> Vec3:
    """Signed-epsilon inverse direction (``RayOptimized``,
    ``intersection.cuh:39-88``)."""
    tiny = 1e-12

    def inv(c):
        s = jnp.where(c >= 0.0, 1.0, -1.0)
        return 1.0 / (c + s * tiny)

    return Vec3(inv(d.x), inv(d.y), inv(d.z))


def _i32(col: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(col, jnp.int32)


def _fetch_node(geom: SceneGeometry, nidx):
    """Child-test node row: both children's AABBs + links, one gather."""
    row = jnp.take(geom.node_rows, nidx, axis=0)  # (R, 16)
    lbb_min = Vec3(row[..., 0], row[..., 1], row[..., 2])
    lbb_max = Vec3(row[..., 3], row[..., 4], row[..., 5])
    rbb_min = Vec3(row[..., 6], row[..., 7], row[..., 8])
    rbb_max = Vec3(row[..., 9], row[..., 10], row[..., 11])
    child_r = _i32(row[..., 12])
    skip = _i32(row[..., 13])
    leaf_block = _i32(row[..., 14])
    return lbb_min, lbb_max, rbb_min, rbb_max, child_r, skip, leaf_block


def _fetch_leaf(geom: SceneGeometry, leaf_block):
    blk = jnp.take(geom.tri_rows, jnp.maximum(leaf_block, 0), axis=0)
    out = []
    for k in range(LEAF_SIZE):
        b = k * 12
        v0 = Vec3(blk[..., b + 0], blk[..., b + 1], blk[..., b + 2])
        e1 = Vec3(blk[..., b + 3], blk[..., b + 4], blk[..., b + 5])
        e2 = Vec3(blk[..., b + 6], blk[..., b + 7], blk[..., b + 8])
        mesh_id = _i32(blk[..., b + 9])
        opaque = blk[..., b + 10] > 0.5
        out.append((v0, e1, e2, mesh_id, opaque))
    return out


# -- BVH path ---------------------------------------------------------------

# Two-pass compacted traversal: the lock-step while pays the SLOWEST lane
# (measured: mean 8 node visits vs max 100-3000), so pass 1 runs at most
# PASS1_CAP iterations over the full wavefront (covering ~p99 of lanes),
# then the few unfinished lanes are compacted into a buffer 1/COMPACT_SHRINK
# the size and run to completion there — gather cost is per-index, so the
# tail lanes cost SHRINK-times less per iteration.  Pass 1 keeps looping if
# the unfinished count would overflow the small buffer, so results are
# EXACT.  Batches below MIN_COMPACT_LANES skip the machinery.
PASS1_CAP = 48
COMPACT_SHRINK = 8
MIN_COMPACT_LANES = 16384


def _closest_loop(geom, o, d, state, pass1_cap):
    """Run the closest-hit walk; ``pass1_cap`` of None = to completion.
    state = (node, t, u, v, nrm, mesh)."""
    n_nodes = geom.num_nodes
    inv_d = _safe_inv(d)

    def cond_full(s):
        return jnp.any(s[0]["node"] < n_nodes)

    def cond_capped(s):
        st, k = s
        active = st["node"] < n_nodes
        n_active = jnp.sum(active.astype(jnp.int32))
        cap = jnp.size(st["node"]) // COMPACT_SHRINK
        return jnp.any(active) & ((k < pass1_cap) | (n_active > cap))

    def body(s):
        st, k = s
        node = st["node"]
        active = node < n_nodes
        nidx = jnp.minimum(node, n_nodes - 1)
        (lbb_min, lbb_max, rbb_min, rbb_max, child_r, skip,
         leaf_block) = _fetch_node(geom, nidx)
        is_leaf = leaf_block >= 0

        best_t, best_u, best_v = st["t"], st["u"], st["v"]
        best_nrm, best_mesh = st["nrm"], st["mesh"]
        test_leaf = active & is_leaf
        for v0, e1, e2, mesh_id, _ in _fetch_leaf(geom, leaf_block):
            ok, t, uu, vv = _mt_test(v0, e1, e2, o, d, T_MIN, best_t)
            ok = ok & test_leaf & (mesh_id >= 0)
            n = cross(e1, e2)
            best_nrm = where(ok, n, best_nrm)
            best_mesh = jnp.where(ok, mesh_id, best_mesh)
            best_u = jnp.where(ok, uu, best_u)
            best_v = jnp.where(ok, vv, best_v)
            best_t = jnp.where(ok, t, best_t)

        # both children tested at the parent; missed children never visited
        lh = _slab_test(lbb_min, lbb_max, o, inv_d, best_t)
        rh = _slab_test(rbb_min, rbb_max, o, inv_d, best_t)
        node = jnp.where(
            is_leaf, skip,
            jnp.where(lh, node + 1, jnp.where(rh, child_r, skip)))
        node = jnp.where(active, node, n_nodes)
        return (dict(node=node, t=best_t, u=best_u, v=best_v, nrm=best_nrm,
                     mesh=best_mesh), k + 1)

    if pass1_cap is None:
        out, _ = jax.lax.while_loop(
            lambda s: cond_full(s), body, (state, jnp.int32(0)))
    else:
        out, _ = jax.lax.while_loop(cond_capped, body, (state, jnp.int32(0)))
    return out


def intersect_closest(geom: SceneGeometry, o: Vec3, d: Vec3,
                      t_max=T_MAX) -> Hit:
    """Closest-hit over the wavefront (``traceRay``,
    ``intersection.cuh:526-605``)."""
    shape = jnp.broadcast_shapes(jnp.shape(o.x), jnp.shape(d.x))
    o = o.broadcast_to(shape)
    d = d.broadcast_to(shape)
    n_nodes = geom.num_nodes
    total = 1
    for sdim in shape:
        total *= sdim

    state0 = dict(
        node=jnp.zeros(shape, jnp.int32),
        t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape),
        u=jnp.zeros(shape, jnp.float32),
        v=jnp.zeros(shape, jnp.float32),
        nrm=Vec3.zeros(shape),
        mesh=jnp.full(shape, -1, jnp.int32),
    )

    if total < MIN_COMPACT_LANES:
        s = _closest_loop(geom, o, d, state0, None)
    else:
        # pass 1 over the full wavefront
        s = _closest_loop(geom, o, d, state0, PASS1_CAP)
        # compact the unfinished tail into a small buffer
        flat = jax.tree_util.tree_map(lambda a: a.reshape(total), s)
        o_f = o.map(lambda c: c.reshape(total))
        d_f = d.map(lambda c: c.reshape(total))
        small_n = total // COMPACT_SHRINK
        unfinished = flat["node"] < n_nodes
        perm = jnp.argsort(jnp.logical_not(unfinished),
                           stable=True)[:small_n]
        take = lambda a: jnp.take(a, perm, axis=0)
        small = jax.tree_util.tree_map(take, flat)
        o_s = o_f.map(take)
        d_s = d_f.map(take)
        small = _closest_loop(geom, o_s, d_s, small, None)
        # scatter tail results back
        upd = lambda full, sm: full.at[perm].set(sm)
        s = jax.tree_util.tree_map(upd, flat, small)
        s = jax.tree_util.tree_map(lambda a: a.reshape(shape), s)

    found = s["mesh"] >= 0
    n = s["nrm"].normalized(1e-30)
    front = d.dot(n) < 0.0
    n = where(front, n, -n)
    return Hit(
        hit=found, t=s["t"], point=o + d * s["t"], normal=n,
        front_face=front, mesh_index=jnp.where(found, s["mesh"], -1),
        u=s["u"], v=s["v"],
    )


def _any_loop(geom, o, d, t_max, state, pass1_cap):
    n_nodes = geom.num_nodes
    inv_d = _safe_inv(d)

    def active_of(s):
        node, hit = s
        return (node < n_nodes) & jnp.logical_not(hit)

    def cond_full(s):
        return jnp.any(active_of(s[0]))

    def cond_capped(s):
        st, k = s
        act = active_of(st)
        n_active = jnp.sum(act.astype(jnp.int32))
        cap = jnp.size(st[0]) // COMPACT_SHRINK
        return jnp.any(act) & ((k < pass1_cap) | (n_active > cap))

    def body(s):
        (node, hit), k = s
        active = (node < n_nodes) & jnp.logical_not(hit)
        nidx = jnp.minimum(node, n_nodes - 1)
        (lbb_min, lbb_max, rbb_min, rbb_max, child_r, skip,
         leaf_block) = _fetch_node(geom, nidx)
        is_leaf = leaf_block >= 0
        test_leaf = active & is_leaf

        for v0, e1, e2, mesh_id, opaque in _fetch_leaf(geom, leaf_block):
            ok, _, _, _ = _mt_test(v0, e1, e2, o, d, T_MIN, t_max)
            hit = hit | (ok & test_leaf & opaque & (mesh_id >= 0))

        lh = _slab_test(lbb_min, lbb_max, o, inv_d, t_max)
        rh = _slab_test(rbb_min, rbb_max, o, inv_d, t_max)
        node = jnp.where(
            is_leaf, skip,
            jnp.where(lh, node + 1, jnp.where(rh, child_r, skip)))
        node = jnp.where(active, node, n_nodes)
        return (node, hit), k + 1

    if pass1_cap is None:
        out, _ = jax.lax.while_loop(cond_full, body, (state, jnp.int32(0)))
    else:
        out, _ = jax.lax.while_loop(cond_capped, body, (state, jnp.int32(0)))
    return out


def intersect_any(geom: SceneGeometry, o: Vec3, d: Vec3,
                  t_max) -> jnp.ndarray:
    """Shadow any-hit; skips transmissive occluders,
    matching ``bvh_any_hit_tlas`` (``intersection.cuh:481-524``)."""
    shape = jnp.broadcast_shapes(jnp.shape(o.x), jnp.shape(d.x),
                                 jnp.shape(t_max))
    o = o.broadcast_to(shape)
    d = d.broadcast_to(shape)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    n_nodes = geom.num_nodes
    total = 1
    for sdim in shape:
        total *= sdim

    state0 = (jnp.zeros(shape, jnp.int32), jnp.zeros(shape, bool))

    if total < MIN_COMPACT_LANES:
        _, hit = _any_loop(geom, o, d, t_max, state0, None)
        return hit

    node, hit = _any_loop(geom, o, d, t_max, state0, PASS1_CAP)
    node_f = node.reshape(total)
    hit_f = hit.reshape(total)
    o_f = o.map(lambda c: c.reshape(total))
    d_f = d.map(lambda c: c.reshape(total))
    t_f = t_max.reshape(total)
    small_n = total // COMPACT_SHRINK
    unfinished = (node_f < n_nodes) & jnp.logical_not(hit_f)
    perm = jnp.argsort(jnp.logical_not(unfinished), stable=True)[:small_n]
    take = lambda a: jnp.take(a, perm, axis=0)
    o_s = o_f.map(take)
    d_s = d_f.map(take)
    node_s, hit_s = _any_loop(geom, o_s, d_s, take(t_f),
                              (take(node_f), take(hit_f)), None)
    hit_f = hit_f.at[perm].set(hit_s)
    return hit_f.reshape(shape)


# -- brute-force path (small scenes; gather-free) ---------------------------


def _finalize_hit_brute(geom: SceneGeometry, o: Vec3, d: Vec3, best_t,
                        best_tri, best_u, best_v) -> Hit:
    found = best_tri >= 0
    idx = jnp.maximum(best_tri, 0)

    def g3(v: Vec3):
        return Vec3(jnp.take(v.x, idx, axis=0), jnp.take(v.y, idx, axis=0),
                    jnp.take(v.z, idx, axis=0))

    e1 = g3(geom.e1)
    e2 = g3(geom.e2)
    n = cross(e1, e2).normalized(1e-30)
    front = d.dot(n) < 0.0
    n = where(front, n, -n)
    mesh_id = jnp.where(found, jnp.take(geom.tri_mesh_id, idx, axis=0), -1)
    return Hit(
        hit=found, t=best_t, point=o + d * best_t, normal=n, front_face=front,
        mesh_index=mesh_id, u=best_u, v=best_v,
    )


def intersect_closest_brute(geom: SceneGeometry, o: Vec3, d: Vec3,
                            t_max=T_MAX, chunk: int = 512) -> Hit:
    """All-pairs MT over triangle chunks; pure elementwise VPU work.

    Equivalent semantics to ``intersect_closest``; preferred when the scene
    has few triangles (the (R, C) broadcast beats gather-heavy traversal).
    """
    shape = jnp.broadcast_shapes(jnp.shape(o.x), jnp.shape(d.x))
    o = o.broadcast_to(shape)
    d = d.broadcast_to(shape)
    m = geom.num_tri_slots
    n_chunks = max(1, -(-m // chunk))
    pad = n_chunks * chunk

    def padc(a):
        return jnp.pad(a, (0, pad - m))

    pv0 = geom.v0.map(padc)
    pe1 = geom.e1.map(padc)
    pe2 = geom.e2.map(padc)
    pmid = jnp.pad(geom.tri_mesh_id, (0, pad - m), constant_values=-1)

    t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    tri0 = jnp.full(shape, -1, jnp.int32)
    u0 = jnp.zeros(shape, jnp.float32)
    v0_ = jnp.zeros(shape, jnp.float32)

    oe = o.map(lambda c: c[..., None])
    de = d.map(lambda c: c[..., None])

    def body(ci, state):
        best_t, best_tri, best_u, best_v = state
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        cv0 = pv0.map(sl)
        ce1 = pe1.map(sl)
        ce2 = pe2.map(sl)
        cmid = sl(pmid)
        ok, t, uu, vv = _mt_test(cv0, ce1, ce2, oe, de, T_MIN,
                                 best_t[..., None])
        ok = ok & (cmid >= 0)
        t = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tbest = jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0]
        found = jnp.isfinite(tbest)
        tri_idx = (ci * chunk + j).astype(jnp.int32)
        best_tri = jnp.where(found, tri_idx, best_tri)
        best_u = jnp.where(
            found, jnp.take_along_axis(uu, j[..., None], -1)[..., 0], best_u)
        best_v = jnp.where(
            found, jnp.take_along_axis(vv, j[..., None], -1)[..., 0], best_v)
        best_t = jnp.where(found, tbest, best_t)
        return best_t, best_tri, best_u, best_v

    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(
        0, n_chunks, body, (t0, tri0, u0, v0_)
    )
    return _finalize_hit_brute(geom, o, d, best_t, best_tri, best_u, best_v)


def intersect_any_brute(geom: SceneGeometry, o: Vec3, d: Vec3, t_max,
                        chunk: int = 512) -> jnp.ndarray:
    shape = jnp.broadcast_shapes(jnp.shape(o.x), jnp.shape(d.x),
                                 jnp.shape(t_max))
    o = o.broadcast_to(shape)
    d = d.broadcast_to(shape)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    m = geom.num_tri_slots
    n_chunks = max(1, -(-m // chunk))
    pad = n_chunks * chunk

    def padc(a):
        return jnp.pad(a, (0, pad - m))

    pv0 = geom.v0.map(padc)
    pe1 = geom.e1.map(padc)
    pe2 = geom.e2.map(padc)
    popq = jnp.pad(geom.tri_shadow_opaque, (0, pad - m))

    oe = o.map(lambda c: c[..., None])
    de = d.map(lambda c: c[..., None])

    def body(ci, hit):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        ok, _, _, _ = _mt_test(pv0.map(sl), pe1.map(sl), pe2.map(sl),
                               oe, de, T_MIN, t_max[..., None])
        ok = ok & sl(popq)
        return hit | jnp.any(ok, axis=-1)

    return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros(shape, bool))
