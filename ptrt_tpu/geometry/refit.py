"""Device-side BVH refit for fixed-topology vertex refills.

The reference re-marks a refilled mesh's BVH dirty and rebuilds it on the
CPU every frame (``mesh.cuh:330-346``; dirty-driven updates
``scene.cuh:596-743``).  For meshes whose TOPOLOGY never changes — the
fluid heightfield, any ``Triangles``-type per-frame refill — a rebuild is
wasted work: the tree shape, leaf assignment and traversal order stay
valid, only the AABBs and triangle rows change.  This module refits both
ON DEVICE as pure jittable array ops, which is what lets a game's
step+render fuse into one XLA program (no host round-trip, no C++ build).

The refit plan is extracted ONCE (host) from the packed node rows — the
tree structure is fully recoverable from the float-encoded meta columns
(geometry/bvh8.py layout) — and then applied per frame:

1. triangle rows: scatter the new vertices into leaf-slot order, rebuild
   the Möller–Trumbore (v0, e1, e2) fields and the packed tri-row table;
2. node AABBs: one vectorized min/max reduction per tree LEVEL, deepest
   first — leaf slots pull freshly-reduced triangle-block bounds, internal
   slots pull the child node's just-computed total bounds.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ptrt_tpu.geometry.bvh import LEAF_SIZE
from ptrt_tpu.geometry.scene_geom import SceneGeometry
from ptrt_tpu.core.vec import Vec3


@dataclass(frozen=True)
class RefitPlan:
    """Static (host) tree structure for one mesh's BLAS.

    All arrays are LOCAL to the mesh's own table block; ``node_off`` /
    ``blk_off`` / ``slot_off`` place it inside a merged InstanceSet table
    (zero for a standalone SceneGeometry).
    """

    slot_tri: np.ndarray  # (M,) int32 original tri index per slot, -1 pad
    levels: tuple  # per depth, deepest FIRST: np int32 node ids
    cba: np.ndarray  # (N,) int32 child_base - leaf_count (decoded col 48)
    lb: np.ndarray  # (N,) int32 leaf_base (col 49)
    lmask: np.ndarray  # (N,) int32 (col 50)
    imask: np.ndarray  # (N,) int32 (col 51)
    node_off: int = 0
    blk_off: int = 0
    slot_off: int = 0

    @property
    def num_nodes(self) -> int:
        return int(self.cba.shape[0])

    @property
    def num_blocks(self) -> int:
        return int(self.slot_tri.shape[0]) // LEAF_SIZE


def build_refit_plan(geom: SceneGeometry, order: np.ndarray | None = None,
                     node_off: int = 0, blk_off: int = 0,
                     slot_off: int = 0) -> RefitPlan:
    """Decode the packed node rows back into tree structure (host, once).

    ``order``: original-tri index per padded leaf slot (-1 = pad).
    Defaults to the ``_host_order`` array ``assemble_geometry`` stashes on
    the geometry it returns (host-side only; not part of the pytree).
    """
    rows = np.asarray(geom.node_rows)
    meta = rows[:, 48:52].astype(np.int32)
    cba, lb, lmask, imask = (meta[:, 0].copy(), meta[:, 1].copy(),
                             meta[:, 2].copy(), meta[:, 3].copy())
    n = rows.shape[0]
    # BFS depth per node; children of node x at slot s (internal) = cba[x]+s
    depth = np.full(n, -1, np.int32)
    depth[0] = 0
    frontier = [0]
    while frontier:
        nxt = []
        for x in frontier:
            m = imask[x]
            s = 0
            while m:
                if m & 1:
                    c = cba[x] + s
                    if depth[c] < 0:
                        depth[c] = depth[x] + 1
                        nxt.append(c)
                m >>= 1
                s += 1
        frontier = nxt
    max_d = int(depth.max(initial=0))
    levels = tuple(np.nonzero(depth == dd)[0].astype(np.int32)
                   for dd in range(max_d, -1, -1))
    if order is None:
        order = getattr(geom, "_host_order", None)
        if order is None:
            raise ValueError(
                "build_refit_plan needs the build-time leaf order; pass "
                "order= or use a geometry fresh from assemble_geometry")
    return RefitPlan(slot_tri=np.asarray(order, np.int64).astype(np.int32),
                     levels=levels, cba=cba, lb=lb, lmask=lmask, imask=imask,
                     node_off=node_off, blk_off=blk_off, slot_off=slot_off)


def refit_apply(geom: SceneGeometry, plan: RefitPlan,
                v0: jnp.ndarray, v1: jnp.ndarray,
                v2: jnp.ndarray, slot_tri_dev=None) -> SceneGeometry:
    """Refit one mesh's BLAS inside ``geom`` from new vertices (device).

    ``v0``/``v1``/``v2``: (T, 3) triangle vertices in ORIGINAL triangle
    order (T = the mesh's triangle count at build time — topology fixed).
    Returns a new SceneGeometry with that mesh's tri rows, node AABBs and
    SoA mirrors replaced; everything else untouched.

    ``slot_tri_dev``: optional DEVICE (M,) int32 slot->triangle map
    overriding the plan's static one (pads must stay pads).  Used by the
    Morton-sorted device rebuild (geometry/lbvh.py) to re-assign
    triangles to slots per frame; valid because every slot of this BLAS
    shares one mesh id, so the per-slot packed ids and SoA id mirrors
    stay correct under reordering.
    """
    st = (jnp.asarray(plan.slot_tri) if slot_tri_dev is None
          else slot_tri_dev)
    pad = st < 0
    idx = jnp.maximum(st, 0)
    M = plan.slot_tri.shape[0]
    B = plan.num_blocks

    pv0 = jnp.where(pad[:, None], 0.0, jnp.take(v0, idx, axis=0))
    pv1 = jnp.where(pad[:, None], 0.0, jnp.take(v1, idx, axis=0))
    pv2 = jnp.where(pad[:, None], 0.0, jnp.take(v2, idx, axis=0))
    e1 = pv1 - pv0
    e2 = pv2 - pv0

    # -- tri rows: field-major packed layout (scene_geom.assemble_geometry)
    old_blk = geom.tri_rows[plan.blk_off:plan.blk_off + B]
    packed_id = old_blk.reshape(B, 10, LEAF_SIZE)[:, 9, :]  # ids unchanged
    fields = [pv0[:, 0], pv0[:, 1], pv0[:, 2],
              e1[:, 0], e1[:, 1], e1[:, 2],
              e2[:, 0], e2[:, 1], e2[:, 2]]
    new_rows = jnp.concatenate(
        [f.reshape(B, LEAF_SIZE) for f in fields] + [packed_id], axis=1)
    tri_rows = geom.tri_rows.at[plan.blk_off:plan.blk_off + B].set(new_rows)

    # -- block AABBs (pads excluded) ----------------------------------------
    big = jnp.float32(3.0e30)
    tmin = jnp.minimum(jnp.minimum(pv0, pv1), pv2)
    tmax = jnp.maximum(jnp.maximum(pv0, pv1), pv2)
    tmin = jnp.where(pad[:, None], big, tmin)
    tmax = jnp.where(pad[:, None], -big, tmax)
    blk_min = tmin.reshape(B, LEAF_SIZE, 3).min(axis=1)  # (B, 3)
    blk_max = tmax.reshape(B, LEAF_SIZE, 3).max(axis=1)

    # -- node slot AABBs, deepest level first -------------------------------
    N = plan.num_nodes
    slot_min = jnp.zeros((N, 8, 3), jnp.float32)
    slot_max = jnp.full((N, 8, 3), -1.0, jnp.float32)  # empty: inverted
    node_min = jnp.zeros((N, 3), jnp.float32)
    node_max = jnp.zeros((N, 3), jnp.float32)
    slots = np.arange(8, dtype=np.int32)
    for ids in plan.levels:
        if ids.size == 0:
            continue
        lmask = plan.lmask[ids]
        imask = plan.imask[ids]
        is_leaf = (lmask[:, None] >> slots[None, :]) & 1  # (K, 8)
        is_int = (imask[:, None] >> slots[None, :]) & 1
        used = (is_leaf | is_int).astype(bool)
        lblk = np.clip(plan.lb[ids][:, None] + slots[None, :], 0, B - 1)
        cnod = np.clip(plan.cba[ids][:, None] + slots[None, :], 0, N - 1)
        smin = jnp.where(
            jnp.asarray(is_leaf[..., None] == 1),
            jnp.take(blk_min, jnp.asarray(lblk), axis=0),
            jnp.take(node_min, jnp.asarray(cnod), axis=0))
        smax = jnp.where(
            jnp.asarray(is_leaf[..., None] == 1),
            jnp.take(blk_max, jnp.asarray(lblk), axis=0),
            jnp.take(node_max, jnp.asarray(cnod), axis=0))
        smin = jnp.where(jnp.asarray(used[..., None]), smin, big)
        smax = jnp.where(jnp.asarray(used[..., None]), smax, -big)
        jidx = jnp.asarray(ids)
        # empty slots keep inverted boxes (can never be hit)
        slot_min = slot_min.at[jidx].set(
            jnp.where(jnp.asarray(used[..., None]), smin, 0.0))
        slot_max = slot_max.at[jidx].set(
            jnp.where(jnp.asarray(used[..., None]), smax, -1.0))
        node_min = node_min.at[jidx].set(smin.min(axis=1))
        node_max = node_max.at[jidx].set(smax.max(axis=1))

    bounds = jnp.concatenate(
        [slot_min[:, :, 0], slot_min[:, :, 1], slot_min[:, :, 2],
         slot_max[:, :, 0], slot_max[:, :, 1], slot_max[:, :, 2]], axis=1)
    node_rows = geom.node_rows.at[
        plan.node_off:plan.node_off + N, 0:48].set(bounds)

    so, M_ = plan.slot_off, M
    upd = lambda full, newc: full.at[so:so + M_].set(newc)
    out = SceneGeometry(
        node_rows=node_rows,
        tri_rows=tri_rows,
        v0=Vec3(upd(geom.v0.x, pv0[:, 0]), upd(geom.v0.y, pv0[:, 1]),
                upd(geom.v0.z, pv0[:, 2])),
        e1=Vec3(upd(geom.e1.x, e1[:, 0]), upd(geom.e1.y, e1[:, 1]),
                upd(geom.e1.z, e1[:, 2])),
        e2=Vec3(upd(geom.e2.x, e2[:, 0]), upd(geom.e2.y, e2[:, 1]),
                upd(geom.e2.z, e2[:, 2])),
        tri_mesh_id=geom.tri_mesh_id,
        tri_shadow_opaque=geom.tri_shadow_opaque,
        stack_depth=geom.stack_depth,
    )
    order = getattr(geom, "_host_order", None)
    if order is not None:
        # keep the build-time leaf order on refit outputs so future plans
        # (e.g. a re-merge) can still be derived host-side
        object.__setattr__(out, "_host_order", order)
    return out


def refit_root_aabb(geom: SceneGeometry, plan: RefitPlan):
    """(lo, hi) of the refitted mesh = union of the root row's slot boxes
    (device).  Used to refresh the instance's TLAS leaf AABB."""
    row = geom.node_rows[plan.node_off]
    used = jnp.asarray(
        ((plan.lmask[0] | plan.imask[0]) >> np.arange(8)) & 1 == 1)
    lo = jnp.stack([jnp.min(jnp.where(used, row[a * 8:(a + 1) * 8],
                                      3.0e30)) for a in range(3)])
    hi = jnp.stack([jnp.max(jnp.where(used, row[24 + a * 8:24 + (a + 1) * 8],
                                      -3.0e30)) for a in range(3)])
    return lo, hi
