"""8-wide BVH construction (host) for the mask-stack lock-step traversal.

The reference walks a binary BVH with a per-thread stack
(``intersection.cuh:300-435``); round 1 used a binary skip-pointer walk.
Measured TPU reality (see TODO.md perf model): traversal cost is
per-iteration GATHER cost, and a ~64-float row gathers about as cheaply as a
16-float one — so the way to go faster is *fewer iterations*, i.e. a wider
tree.  An 8-wide node tests all eight child AABBs from ONE gathered row;
missed children are never visited, and tree depth shrinks ~3x.

Layout contract (shared with the native builder, bvh_builder.cpp):
  * leaf children of a node occupy slots ``[0, leaf_count)`` and their
    triangle blocks are contiguous tri-table rows starting at ``leaf_base``
    (tri row of slot s = ``leaf_base + s``);
  * internal children occupy slots ``[leaf_count, leaf_count+int_count)``
    and are contiguous wide-node ids starting at ``child_base`` (node id of
    slot s = ``child_base + s - leaf_count``).
This single (base, slot) addressing is what lets the traversal keep one
packed ``(base << 8) | pending_bitmask`` integer per stack entry.

Node rows are packed 64 floats wide for one-gather fetches:
``[0:8]=bmin_x  [8:16]=bmin_y [16:24]=bmin_z [24:32]=bmax_x [32:40]=bmax_y
[40:48]=bmax_z [48]=float(child_base - leaf_count) [49]=float(leaf_base)
[50]=float(leaf_mask) [51]=float(int_mask) [52:64]=pad`` — metadata ints
are exact small-float VALUES (< 2^24), not bit patterns — empty slots
carry inverted AABBs that can never be hit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ptrt_tpu.geometry.bvh import LEAF_SIZE

NODE_ROW_WIDTH = 64


@dataclass
class FlatBVH8:
    """Host-side wide BVH ready for packing/upload.

    ``order`` (n_blocks * leaf_size,): original triangle index per reordered
    slot, -1 for padding — tri-table row b holds triangles
    ``order[b*leaf_size:(b+1)*leaf_size]``.
    """

    slot_bmin: np.ndarray  # (N, 8, 3)
    slot_bmax: np.ndarray  # (N, 8, 3)
    child_base: np.ndarray  # (N,) int32
    leaf_base: np.ndarray  # (N,) int32
    leaf_count: np.ndarray  # (N,) int32
    int_count: np.ndarray  # (N,) int32
    order: np.ndarray  # (n_blocks*leaf_size,) int64
    max_depth: int

    @property
    def num_nodes(self) -> int:
        return int(self.child_base.shape[0])


def build_bvh8(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
               leaf_size: int = LEAF_SIZE) -> FlatBVH8:
    """Binned-SAH binary build collapsed to branching factor 8 (native C++
    builder; numpy fallback below builds the same layout with median
    splits)."""
    n = v0.shape[0]
    tmin = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    tmax = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    cent = ((tmin + tmax) * 0.5).astype(np.float32)

    from ptrt_tpu.native import native_build_bvh8

    nat = native_build_bvh8(tmin, tmax, cent, leaf_size)
    if nat is not None:
        (slot_bmin, slot_bmax, child_base, leaf_base, leaf_count, int_count,
         order, max_depth) = nat
        return FlatBVH8(slot_bmin, slot_bmax, child_base, leaf_base,
                        leaf_count, int_count, order, max_depth)
    return _py_build_bvh8(tmin, tmax, cent, leaf_size)


def _py_build_bvh8(tmin, tmax, cent, leaf_size: int) -> FlatBVH8:
    """Pure-numpy fallback: recursive 8-way median split, same layout."""
    n = tmin.shape[0]
    slot_bmin: list = []
    slot_bmax: list = []
    child_base: list = []
    leaf_base: list = []
    leaf_count: list = []
    int_count: list = []
    order: list = []
    max_depth = [1]

    def new_node() -> int:
        slot_bmin.append(np.zeros((8, 3), np.float32))
        slot_bmax.append(np.full((8, 3), -1.0, np.float32))
        child_base.append(0)
        leaf_base.append(0)
        leaf_count.append(0)
        int_count.append(0)
        return len(child_base) - 1

    def split8(indices: np.ndarray) -> list:
        groups = [indices]
        while len(groups) < 8:
            gi = int(np.argmax([len(g) for g in groups]))
            g = groups[gi]
            if len(g) <= leaf_size:
                break
            c = cent[g]
            axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            half = len(g) // 2
            part = np.argpartition(c[:, axis], half)
            groups[gi:gi + 1] = [g[part[:half]], g[part[half:]]]
        return groups

    def emit(wid: int, indices: np.ndarray, depth: int) -> None:
        max_depth[0] = max(max_depth[0], depth)
        groups = split8(indices) if len(indices) > leaf_size else [indices]
        leaves = [g for g in groups if len(g) <= leaf_size]
        internals = [g for g in groups if len(g) > leaf_size]

        lbase = len(order) // leaf_size
        for g in leaves:
            blk = np.full(leaf_size, -1, np.int64)
            blk[: len(g)] = g
            order.extend(blk.tolist())
        cbase = len(child_base)
        ids = [new_node() for _ in internals]

        for s, g in enumerate(leaves + internals):
            slot_bmin[wid][s] = tmin[g].min(axis=0)
            slot_bmax[wid][s] = tmax[g].max(axis=0)
        child_base[wid] = cbase
        leaf_base[wid] = lbase
        leaf_count[wid] = len(leaves)
        int_count[wid] = len(internals)

        for wid2, g in zip(ids, internals):
            emit(wid2, g, depth + 1)

    root = new_node()
    if n > 0:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 100000))
        try:
            emit(root, np.arange(n), 1)
        finally:
            sys.setrecursionlimit(old)
    else:
        order.extend([-1] * leaf_size)

    return FlatBVH8(
        slot_bmin=np.stack(slot_bmin),
        slot_bmax=np.stack(slot_bmax),
        child_base=np.asarray(child_base, np.int32),
        leaf_base=np.asarray(leaf_base, np.int32),
        leaf_count=np.asarray(leaf_count, np.int32),
        int_count=np.asarray(int_count, np.int32),
        order=np.asarray(order, np.int64),
        max_depth=max_depth[0],
    )


def pack_node_rows(b: FlatBVH8) -> np.ndarray:
    """Pack the wide BVH into (N, 64) one-gather node rows (layout above,
    plus octant-ordered child visit orders in cols 52:60).

    Cols ``52+o`` (o = ray octant, bit a set when ray.d[a] < 0) hold a
    float-encoded i24 packing eight 3-bit slot ids, sorted by child-centroid
    projection along the octant direction — the traversal visits pending
    children in this order, so the closest child is descended FIRST and its
    hit tightens t before farther children are tested (the wide-BVH analog
    of the reference's ordered near-child descent,
    ``intersection.cuh:385-418``).  Precomputing per octant makes runtime
    ordering one lane-select instead of an 8-wide sort.
    """
    n = b.num_nodes
    rows = np.zeros((n, NODE_ROW_WIDTH), np.float32)
    for a in range(3):
        rows[:, a * 8:(a + 1) * 8] = b.slot_bmin[:, :, a]
        rows[:, 24 + a * 8:24 + (a + 1) * 8] = b.slot_bmax[:, :, a]
    cba = (b.child_base - b.leaf_count).astype(np.int32)
    lmask = ((1 << b.leaf_count.astype(np.int64)) - 1).astype(np.int32)
    fullm = ((1 << (b.leaf_count + b.int_count).astype(np.int64)) - 1)
    imask = (fullm.astype(np.int32)) ^ lmask
    # metadata ints are stored as exact small-FLOAT VALUES (all < 2^24),
    # NOT as bitcast bit patterns: int bit patterns are denormal floats,
    # and TPU fusions flush denormal f32 loads to zero when the table
    # rides a jitted program as an ARGUMENT (measured: the dense root
    # seed read masks of 0 and every in-frame walk died at the root,
    # while closed-over tables were constant-folded before fusion and
    # survived).  Readers convert with .astype(int32), which is exact
    # for |v| < 2^24.
    rows[:, 48] = cba.astype(np.float32)
    rows[:, 49] = b.leaf_base.astype(np.float32)
    rows[:, 50] = lmask.astype(np.float32)
    rows[:, 51] = imask.astype(np.float32)

    cent = (b.slot_bmin + b.slot_bmax) * 0.5  # (N, 8, 3)
    used = (np.arange(8)[None, :]
            < (b.leaf_count + b.int_count)[:, None])  # (N, 8)
    for octant in range(8):
        sign = np.array([1.0 if (octant >> a) & 1 == 0 else -1.0
                         for a in range(3)], np.float32)
        proj = (cent * sign).sum(axis=2)
        proj = np.where(used, proj, np.inf)  # empty slots sort last
        order = np.argsort(proj, axis=1, kind="stable").astype(np.int64)
        packed = np.zeros(n, np.int64)
        for k in range(8):
            packed |= order[:, k] << (3 * k)
        # 8x3 bits = 24 -> max 2^24 - 1, exact as a float value
        rows[:, 52 + octant] = packed.astype(np.float32)
    return rows
